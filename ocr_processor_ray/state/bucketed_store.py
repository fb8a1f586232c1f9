"""Bucketed table storage: pay the shuffle ONCE, at write time.

``bucketed_join`` (functions/relational.py) shuffles both inputs every
time it runs. When the same big tables join repeatedly on the same key
(fact ⋈ fact refresh jobs, daily increments), the scale-correct layout
is to persist each table hash-bucketed by the join key:

    bucket=00000/data.parquet ... bucket=NNNNN/data.parquet  +  _meta.json

Two tables bucketed with the SAME key hash and bucket count are
co-partitioned: joining them is B independent per-bucket joins — B
parallel tasks each reading two small files, ZERO shuffle at join time.
This is the storage analog of "pick ONE partitioning key and reuse it
across stages"; the write-side shuffle is the one exchange the data
ever makes.

Buckets are written atomically (tmp dir + rename, like
state/manifest.py) so a crashed write never leaves a half bucket, and a
re-run skips buckets that already exist — the same resume contract as
the extraction checkpoint. Same shared-POSIX-filesystem requirement.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from ray.data import Dataset

_META = "_meta.json"


def _bucket_of(arr: pa.ChunkedArray | pa.Array, num_buckets: int) -> np.ndarray:
    """Deterministic bucket per value (same hash family as
    ``relational._tagged_bucket_union`` — value-determined siphash via
    ``functions/hashing.stable_hash_array``, int and string keys)."""
    from ocr_processor_ray.functions.hashing import stable_hash_array

    vals = np.asarray(arr.to_pandas(), dtype=object)
    return (stable_hash_array(vals) % num_buckets).astype(np.int32)


def write_bucketed(
    ds: Dataset, out_dir: str, key: str, num_buckets: int = 32
) -> dict:
    """Persist ``ds`` hash-bucketed by ``key``. One shuffle (groupby
    bucket); each bucket lands atomically; existing buckets are skipped
    (resume). Returns the store meta.

    The meta (key + bucket count) is written BEFORE the buckets: a
    resume against a store laid out differently (other key, other
    ``num_buckets``) fails fast instead of silently mixing stale and
    fresh buckets (ADVICE round 2). Resuming a store written from
    *different data* with the same layout is on the caller — the same
    contract as the extraction checkpoint's partition skip."""
    os.makedirs(out_dir, exist_ok=True)
    meta_path = os.path.join(out_dir, _META)
    meta = {"key": key, "num_buckets": num_buckets}
    if os.path.exists(meta_path):
        existing = _read_meta(out_dir)
        if existing != meta:
            raise ValueError(
                f"store at {out_dir} was bucketed as {existing}, "
                f"requested {meta} — refusing to mix layouts; "
                "write to a fresh directory"
            )
    else:
        tmp = os.path.join(out_dir, f".{_META}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, meta_path)

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_bucket", pa.array(_bucket_of(b[key], num_buckets))
        )

    def write_group(g: pa.Table) -> pa.Table:
        bucket = int(g["_bucket"][0].as_py())
        dest = os.path.join(out_dir, f"bucket={bucket:05d}")
        if not os.path.exists(dest):  # resume: skip completed buckets
            tmp = os.path.join(out_dir, f".bucket.{uuid.uuid4().hex}.tmp")
            os.makedirs(tmp, exist_ok=True)
            pq.write_table(g.drop_columns(["_bucket"]), os.path.join(tmp, "data.parquet"))
            try:
                os.replace(tmp, dest)
            except OSError:  # lost a concurrent race; the other write won
                import shutil

                shutil.rmtree(tmp, ignore_errors=True)
        return pa.table(
            {
                "bucket": pa.array([bucket], pa.int32()),
                "rows": pa.array([g.num_rows], pa.int64()),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    written = tagged.groupby("_bucket").map_groups(write_group, batch_format="pyarrow")
    written.materialize()  # drive the writes
    return meta


def _read_meta(store_dir: str) -> dict:
    with open(os.path.join(store_dir, _META)) as f:
        return json.load(f)


def read_bucketed(store_dir: str) -> Dataset:
    """The whole store as one Dataset (per-bucket files read in parallel)."""
    import ray.data as rd

    return rd.read_parquet(store_dir)


def bucketed_store_join(
    left_dir: str,
    right_dir: str,
    suffix_right: str = "_r",
) -> Dataset:
    """Shuffle-FREE equi-join of two co-bucketed stores on their bucket
    key: B independent tasks, each Acero-joining one left bucket file
    against the matching right bucket file. Fails fast if the stores
    were bucketed differently (different key or bucket count ⇒ not
    co-partitioned)."""
    lm, rm = _read_meta(left_dir), _read_meta(right_dir)
    if lm["num_buckets"] != rm["num_buckets"]:
        raise ValueError(
            f"bucket counts differ ({lm['num_buckets']} vs {rm['num_buckets']}) — "
            "stores are not co-partitioned"
        )
    on_l, on_r, B = lm["key"], rm["key"], lm["num_buckets"]

    import ray.data as rd

    def _empty(schema: pa.Schema) -> pa.Table:
        return pa.table({f.name: pa.array([], f.type) for f in schema})

    # joined schema from the first co-present bucket pair (empty Acero
    # join of zero-row tables) so empty buckets emit schema-stable blocks
    empty_joined = None
    for b in range(B):
        lp = os.path.join(left_dir, f"bucket={b:05d}", "data.parquet")
        rp = os.path.join(right_dir, f"bucket={b:05d}", "data.parquet")
        if os.path.exists(lp) and os.path.exists(rp):
            empty_joined = _empty(pq.read_schema(lp)).join(
                _empty(pq.read_schema(rp)),
                keys=on_l,
                right_keys=on_r,
                join_type="inner",
                right_suffix=suffix_right,
            )
            break
    if empty_joined is None:
        raise FileNotFoundError("no co-present bucket pair in the two stores")

    def join_bucket(batch: pa.Table) -> pa.Table:
        outs = [empty_joined]
        for b in batch["b"].to_pylist():
            lp = os.path.join(left_dir, f"bucket={b:05d}", "data.parquet")
            rp = os.path.join(right_dir, f"bucket={b:05d}", "data.parquet")
            if not (os.path.exists(lp) and os.path.exists(rp)):
                continue  # a key hashing to this bucket exists on one side only
            lt, rt = pq.read_table(lp), pq.read_table(rp)
            outs.append(
                lt.join(
                    rt,
                    keys=on_l,
                    right_keys=on_r,
                    join_type="inner",
                    right_suffix=suffix_right,
                )
            )
        return pa.concat_tables(outs, promote_options="default")

    buckets = rd.from_items([{"b": i} for i in range(B)])
    return buckets.map_batches(
        join_bucket, batch_size=1, batch_format="pyarrow"
    )
