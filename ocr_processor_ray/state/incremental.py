"""Incremental keyed aggregation: a persisted partial-aggregate store.

Production corpora grow; recomputing a full aggregate over 100 TB for
each day's increment is the naive wall. This store keeps the MERGED
partial aggregate (one row per key) on disk and folds each new
increment into it:

    update(store, increment_ds)  →  gen=N+1/part-*.parquet  (atomic)

* **Mergeable partials** — the same contract as
  ``functions/agg.two_phase_agg``: count merges by sum, sum by sum,
  min/max by themselves. An aggregate that can't merge (exact median)
  doesn't belong here; use the multi-pass select-kth on the full table.
* **Exactly-once increments** — callers name each increment; applied
  ids are recorded in the store meta, so re-running a failed/duplicated
  update is a no-op (the same idempotence contract as the extraction
  checkpoint's partition manifests — state/checkpoint.py).
* **Atomic generations** — each update writes a fresh ``gen=N`` dir via
  tmp+rename and then swaps ``_meta.json`` (also tmp+rename); a crash
  mid-update leaves the previous generation intact and the increment
  unrecorded, so the retry redoes it cleanly.

Same shared-POSIX-filesystem requirement as state/manifest.py.
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from ray.data import Dataset

from ocr_processor_ray.functions.agg import _MERGE, two_phase_agg

_META = "_meta.json"


def _read_meta(store_dir: str) -> dict:
    path = os.path.join(store_dir, _META)
    if not os.path.exists(path):
        return {"gen": -1, "applied": [], "keys": None, "aggs": None}
    with open(path) as f:
        return json.load(f)


def _write_meta(store_dir: str, meta: dict) -> None:
    tmp = os.path.join(store_dir, f".{_META}.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(store_dir, _META))


def _gen_dir(store_dir: str, gen: int) -> str:
    return os.path.join(store_dir, f"gen={gen:06d}")


def incremental_agg_update(
    store_dir: str,
    increment: Dataset,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    increment_id: str,
) -> dict:
    """Fold ``increment`` into the store. ``aggs`` is the
    ``two_phase_agg`` spec [(col, fn, out)], fn ∈ {sum, count, min, max}.
    Returns the updated meta. Re-applying an ``increment_id`` that the
    store already folded is a no-op."""
    for _, fn, _ in aggs:
        if fn not in _MERGE:
            raise ValueError(f"agg {fn!r} is not mergeable")
    os.makedirs(store_dir, exist_ok=True)
    meta = _read_meta(store_dir)
    if meta["keys"] is None:
        meta["keys"], meta["aggs"] = keys, [list(a) for a in aggs]
    elif meta["keys"] != keys or meta["aggs"] != [list(a) for a in aggs]:
        raise ValueError("store was created with a different keys/aggs spec")
    if increment_id in meta["applied"]:
        return meta  # exactly-once: already folded

    # exact aggregate of the increment alone (distributed two-phase)
    inc_partial = two_phase_agg(increment, keys, aggs)

    import ray.data as rd

    cur_gen = meta["gen"]
    if cur_gen >= 0:
        store_ds = rd.read_parquet(_gen_dir(store_dir, cur_gen))
        # merge generations: count partials re-merge by SUM
        merge_spec = [(out, _MERGE[fn], out) for _, fn, out in aggs]
        merged = two_phase_agg(inc_partial.union(store_ds), keys, merge_spec)
    else:
        merged = inc_partial

    # a crash between a generation write and the meta swap leaves an
    # orphan gen dir; skip past any such orphans so the retry's rename
    # can't collide with a non-empty destination
    existing = [
        int(d.split("=", 1)[1])
        for d in os.listdir(store_dir)
        if d.startswith("gen=")
    ]
    new_gen = max([cur_gen] + existing) + 1
    tmp = os.path.join(store_dir, f".gen.{uuid.uuid4().hex}.tmp")
    merged.write_parquet(tmp)  # parallel sink — one file per block, never one giant file
    os.replace(tmp, _gen_dir(store_dir, new_gen))
    meta["gen"] = new_gen
    meta["applied"] = sorted(set(meta["applied"]) | {increment_id})
    _write_meta(store_dir, meta)
    return meta


def incremental_agg_read(store_dir: str) -> pa.Table:
    """Current aggregate (one row per key)."""
    meta = _read_meta(store_dir)
    if meta["gen"] < 0:
        raise FileNotFoundError(f"no generations in {store_dir}")
    return pq.read_table(_gen_dir(store_dir, meta["gen"]))


def incremental_exact_dedup(
    store_dir: str,
    increment: Dataset,
    increment_id: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Streaming-ingest exact dedup: rows of ``increment`` whose content
    hash is new CORPUS-WIDE (nothing in any prior increment, first
    occurrence within this increment wins), while folding the
    increment's hashes into the persisted store for the next batch.

    Scale shape: the store holds one (h, first_id, n) row per distinct
    corpus hash, read back as a streaming ``read_parquet`` — the
    increment's first-per-hash set anti-joins it bucketed (both sides
    shuffle once, keyed by hash; nothing lands on the driver), and the
    surviving ids semi-join the increment rows. Idempotent retries: the
    survivor id set is recorded under ``inc=<id>/`` BEFORE the store
    folds the increment, so a replayed ``increment_id`` returns the
    SAME survivors instead of an empty set against the updated store.
    """
    import ray.data as rd

    from ocr_processor_ray.functions.agg import two_phase_agg
    from ocr_processor_ray.functions.dedup import add_md5
    from ocr_processor_ray.functions.relational import bucketed_join

    safe = "".join(c if c.isalnum() or c in "-_." else "_" for c in increment_id)
    inc_dir = os.path.join(store_dir, f"inc={safe}")

    hashed = increment.map_batches(
        lambda t: add_md5(t, text_col), batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # consumed by firsts, the store fold, and the survivor join

    meta = _read_meta(store_dir)
    if increment_id in meta["applied"] and os.path.isdir(inc_dir):
        new_firsts = rd.read_parquet(inc_dir)
    else:
        inc_firsts = two_phase_agg(
            hashed.map_batches(
                lambda t: t.select(["h", id_col]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            ["h"],
            [(id_col, "min", id_col)],
        )
        if meta["gen"] >= 0:
            store_hashes = rd.read_parquet(
                _gen_dir(store_dir, meta["gen"]), columns=["h"]
            )
            new_firsts = bucketed_join(
                inc_firsts,
                store_hashes,
                on="h",
                how="anti",
                l_schema={"h": pa.string(), id_col: pa.int64()},
                r_schema={"h": pa.string()},
            )
        else:
            new_firsts = inc_firsts
        # record survivors BEFORE folding the store: a crash in between
        # retries cleanly (store unchanged, recompute overwrites)
        os.makedirs(store_dir, exist_ok=True)
        tmp = os.path.join(store_dir, f".inc.{uuid.uuid4().hex}.tmp")
        new_firsts.write_parquet(tmp)
        if os.path.isdir(inc_dir):
            import shutil

            shutil.rmtree(inc_dir)
        os.replace(tmp, inc_dir)
        new_firsts = rd.read_parquet(inc_dir)
        incremental_agg_update(
            store_dir,
            hashed.map_batches(
                lambda t: t.select(["h", id_col]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            ["h"],
            [(id_col, "min", "first_id"), (id_col, "count", "n")],
            increment_id,
        )

    survivors = bucketed_join(
        hashed,
        new_firsts.map_batches(
            lambda t: t.select([id_col]), batch_format="pyarrow", zero_copy_batch=True
        ),
        on=id_col,
        how="semi",
        l_schema=None,
        r_schema={id_col: pa.int64()},
    )
    return survivors.map_batches(
        lambda t: t.drop_columns(["h"]), batch_format="pyarrow", zero_copy_batch=True
    )
