"""Conversation assembly: per-turn extraction → per-conversation documents.

The stable-ordering stage (SURVEY.md T1 — the analog of the reference's
page-ordered output, ocr_combined.py:102): turns of one conversation are
brought together, sorted by ``turn_idx`` *within the group* (never a
global sort), and concatenated into one training document per
conversation.

Skew handling (SURVEY.md §4.2): a conversation longer than
``cfg.salt_turn_threshold`` turns would make its group a straggler, so
the group key is salted — ``conv_id#(turn_idx // threshold)`` — which
splits a long conversation into bounded, contiguous turn ranges. Since
per-turn extraction is row-local, splitting is semantics-preserving;
each split assembles its contiguous range, and a merge stage joins the
splits of each conversation in salt order.

The merge stage is candidate-restricted: a conversation needs merging
only if it has a salt>0 split, and those conversations' ids are
detected from the (materialized) split rows and broadcast via
``ray.put``. Single-split conversations — the overwhelming majority
under any sane threshold — bypass the merge as a plain filter map, so
the second exchange moves only the multi-split conversations' text
instead of re-shipping the whole corpus. When the multi-split id set
exceeds the broadcast gate (pathologically long-conversation corpora),
the pipeline falls back to the full bucketed merge shuffle.

Runs on the *extracted* dataset (clean_text, not raw payloads) so the
shuffle moves the smaller, post-extraction bytes.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ocr_processor_ray.config import ExtractConfig
from ocr_processor_ray.schema import STATUS_FAILED, STATUS_SKIPPED

TURN_SEP = "\n\n"


def add_salt_key(batch: pa.Table, threshold: int) -> pa.Table:
    """Vectorized: ``salt_key = conv_id + "#" + zero-padded(turn_idx // threshold)``.

    Zero-padding (width 6) makes lexicographic salt order equal numeric
    order, so the merge stage can sort by the string key alone.
    """
    salt = pc.floor(pc.divide(pc.cast(batch["turn_idx"], pa.float64()), threshold))
    salt = pc.cast(salt, pa.int64())
    salt_str = pc.utf8_lpad(pc.cast(salt, pa.string()), 6, "0")
    key = pc.binary_join_element_wise(batch["conv_id"], salt_str, "#")
    return batch.append_column("salt_key", key)


def _format_turn(role: str, clean: str) -> str:
    return f"[{role}] {clean}"


def _add_bucket(batch: pa.Table, key: str, num_buckets: int) -> pa.Table:
    """Coarse shuffle bucket = crc32(key) % B: all rows of one key land in
    one bucket, so per-key work can happen in-task. Grouping by the raw
    key instead (one Ray group per salt_key/conv_id — tens of thousands
    of tiny groups) triples wall time on the sort-based shuffle."""
    import zlib

    vals = batch[key].to_pylist()
    cache: dict[str, int] = {}
    out = [0] * len(vals)
    for i, v in enumerate(vals):
        b = cache.get(v)
        if b is None:
            b = cache[v] = zlib.crc32(v.encode("utf-8")) % num_buckets
        out[i] = b
    return batch.append_column("_bucket", pa.array(out, pa.int32()))


_RUNS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("salt_key", pa.string()),
        ("start_idx", pa.int64()),
        ("n_turns", pa.int64()),
        ("n_failed", pa.int64()),
        ("n_skipped", pa.int64()),
        ("doc_part", pa.string()),
    ]
)

_SPLITS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("salt_key", pa.string()),
        ("n_turns", pa.int64()),
        ("n_failed", pa.int64()),
        ("n_skipped", pa.int64()),
        ("doc", pa.string()),
    ]
)


def _group_boundaries(keys: pa.Array, extra_break=None):
    """``new_group[i]`` is True where row i starts a new key group in an
    already-sorted column (optionally also breaking where ``extra_break``
    is True). Returns (new_group, group_id, starts, n_groups)."""
    import numpy as np

    n = len(keys)
    if n > 1:
        same = pc.equal(keys.slice(1), keys.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        if extra_break is not None:
            same = same & ~extra_break
        new_group = np.concatenate(([True], ~same))
    else:
        new_group = np.ones(n, dtype=bool)
    group_id = np.cumsum(new_group) - 1
    starts = np.flatnonzero(new_group)
    return new_group, group_id, starts, len(starts)


def _join_runs(parts, keep, group_id: "np.ndarray", n_groups: int) -> pa.Array:
    """Vectorized grouped string join: concatenate the kept ``parts`` of
    each group (rows already in group order) with ``TURN_SEP`` via a
    list-array + ``pc.binary_join`` — no per-row Python."""
    import numpy as np

    kept_counts = np.bincount(group_id[keep], minlength=n_groups)
    offsets = np.concatenate(([0], np.cumsum(kept_counts))).astype(np.int32)
    values = parts.filter(pa.array(keep))
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    return pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets), values), TURN_SEP
    )


def _combine_runs(batch: pa.Table, threshold: int) -> pa.Table:
    """Block-local combiner (the 'pre-aggregate before the shuffle'
    rule, SURVEY.md §4.2): formats and joins each CONTIGUOUS turn range
    of a conversation found inside this batch into one run row, so the
    exchange moves one row per run instead of one per turn — same text
    bytes, ~40× fewer rows on sequentially-written corpora; worst case
    (fully scattered turns) degenerates to one run per turn, i.e. the
    pre-combiner layout. Runs break on any non-+1 ``turn_idx`` step, so
    the reducer can concatenate runs sorted by ``start_idx`` knowing
    ranges never interleave. (Duplicate turn indices are malformed
    input; their relative order is unspecified, before and after this
    rework.)"""
    import numpy as np

    t = add_salt_key(batch, threshold)
    n = t.num_rows
    if n == 0:
        return _RUNS_SCHEMA.empty_table()
    t = t.sort_by(
        [("salt_key", "ascending"), ("turn_idx", "ascending")]
    ).combine_chunks()
    keys = t.column("salt_key").chunk(0)
    idx = t.column("turn_idx").to_numpy(zero_copy_only=False).astype(np.int64)
    non_contig = np.zeros(max(n - 1, 0), dtype=bool)
    if n > 1:
        non_contig = idx[1:] != idx[:-1] + 1
    _, run_id, starts, n_runs = _group_boundaries(keys, extra_break=non_contig)

    status = t.column("status")
    failed = pc.equal(status, STATUS_FAILED).to_numpy(zero_copy_only=False)
    skipped = pc.equal(status, STATUS_SKIPPED).to_numpy(zero_copy_only=False)
    fmt = pc.binary_join_element_wise(
        pa.scalar("["), t.column("role"), pa.scalar("] "), t.column("clean_text"), ""
    )
    starts_idx = pa.array(starts)
    lengths = np.diff(np.append(starts, n))
    return pa.table(
        {
            "conv_id": pc.take(t.column("conv_id"), starts_idx),
            "salt_key": pc.take(keys, starts_idx),
            "start_idx": pa.array(idx[starts], pa.int64()),
            "n_turns": pa.array(lengths.astype(np.int64)),
            "n_failed": pa.array(
                np.bincount(run_id, weights=failed, minlength=n_runs).astype(np.int64)
            ),
            "n_skipped": pa.array(
                np.bincount(run_id, weights=skipped, minlength=n_runs).astype(np.int64)
            ),
            "doc_part": _join_runs(fmt, ~failed, run_id, n_runs),
        }
    )


def _assemble_bucket(group: pa.Table) -> pa.Table:
    """All runs of one bucket → one summary row per salted split, runs
    concatenated in ``start_idx`` order (vectorized list-join)."""
    import numpy as np

    n = group.num_rows
    if n == 0:
        return _SPLITS_SCHEMA.empty_table()
    g = group.sort_by(
        [("salt_key", "ascending"), ("start_idx", "ascending")]
    ).combine_chunks()
    keys = g.column("salt_key").chunk(0)
    _, grp_id, starts, n_grp = _group_boundaries(keys)

    def sums(col: str) -> pa.Array:
        w = g.column(col).to_numpy(zero_copy_only=False)
        return pa.array(np.bincount(grp_id, weights=w, minlength=n_grp).astype(np.int64))

    parts = g.column("doc_part")
    keep = pc.not_equal(parts, "").to_numpy(zero_copy_only=False)
    starts_idx = pa.array(starts)
    return pa.table(
        {
            "conv_id": pc.take(g.column("conv_id"), starts_idx),
            "salt_key": pc.take(keys, starts_idx),
            "n_turns": sums("n_turns"),
            "n_failed": sums("n_failed"),
            "n_skipped": sums("n_skipped"),
            "doc": _join_runs(parts, keep, grp_id, n_grp),
        }
    )


def _merge_bucket(group: pa.Table) -> pa.Table:
    """All conversations of one bucket → one row per conversation,
    splits concatenated in salt order (zero-padded key sorts correctly)."""
    group = group.sort_by([("conv_id", "ascending"), ("salt_key", "ascending")])
    convs = group["conv_id"].to_pylist()
    turns = group["n_turns"].to_pylist()
    failed = group["n_failed"].to_pylist()
    skipped = group["n_skipped"].to_pylist()
    docs = group["doc"].to_pylist()

    o_conv, o_turns, o_failed, o_skipped, o_doc = [], [], [], [], []
    i, n = 0, len(convs)
    while i < n:
        j = i
        parts: list[str] = []
        t = f = s = 0
        while j < n and convs[j] == convs[i]:
            t += turns[j]
            f += failed[j]
            s += skipped[j]
            if docs[j]:
                parts.append(docs[j])
            j += 1
        o_conv.append(convs[i])
        o_turns.append(t)
        o_failed.append(f)
        o_skipped.append(s)
        o_doc.append(TURN_SEP.join(parts))
        i = j
    return pa.table(
        {
            "conv_id": pa.array(o_conv, pa.string()),
            "n_turns": pa.array(o_turns, pa.int64()),
            "n_failed": pa.array(o_failed, pa.int64()),
            "n_skipped": pa.array(o_skipped, pa.int64()),
            "doc": pa.array(o_doc, pa.string()),
        }
    )


# driver-side gate on the multi-split conversation id broadcast: past
# this many ids the detection result is discarded and the merge falls
# back to the full bucketed shuffle (ids would no longer be "small").
_MULTI_SPLIT_ID_GATE = 200_000

_SPLIT_COLS = ["conv_id", "n_turns", "n_failed", "n_skipped", "doc"]


def _multi_split_conv_ids(splits: Dataset) -> set | None:
    """Conversation ids that need the merge stage: any conversation with
    a salt>0 split (⇔ >1 split, or a sparse conversation whose first
    ``turn_idx`` already lands past the threshold). Salt-0 keys end in
    ``#000000`` by construction (zero-padded width 6), so the suffix test
    is exact even when ``conv_id`` itself contains ``#``. Returns None
    when the id set exceeds the broadcast gate."""

    def project(t: pa.Table) -> pa.Table:
        salted = pc.invert(pc.ends_with(t["salt_key"], pattern="#000000"))
        return pa.table({"conv_id": pc.unique(t.filter(salted)["conv_id"])})

    ids_ds = splits.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    # per-batch-unique rows only; bounded before the driver pull
    if ids_ds.count() > _MULTI_SPLIT_ID_GATE:
        return None
    return {r["conv_id"] for r in ids_ds.take_all()}


def assemble_conversations(extracted: Dataset, cfg: ExtractConfig | None = None) -> Dataset:
    """Extracted turns → one document row per conversation.

    Output schema: ``conv_id, n_turns, n_failed, n_skipped, doc, doc_chars``.
    """
    import ray

    cfg = cfg or ExtractConfig()
    num_buckets = max(16, cfg.num_output_partitions)
    ds = extracted.map_batches(
        # project to the columns assembly consumes BEFORE the shuffle —
        # spans/status_detail/byte counters are dead weight in the
        # exchange — then pre-join contiguous turn runs (combiner) so the
        # exchange ships one row per run, not one per turn
        lambda t: _add_bucket(
            _combine_runs(
                t.select(["conv_id", "turn_idx", "role", "clean_text", "status"]),
                cfg.salt_turn_threshold,
            ),
            "salt_key",
            num_buckets,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    splits = ds.groupby("_bucket").map_groups(_assemble_bucket, batch_format="pyarrow")
    # consumed up to three times below (id detection, bypass filter,
    # merge filter) — pin once instead of re-running extract+exchange
    splits = splits.materialize()

    multi = _multi_split_conv_ids(splits)
    if multi is not None and not multi:
        # every conversation is single-split: the merge is pure identity
        convs = splits.map_batches(
            lambda t: t.select(_SPLIT_COLS),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    elif multi is not None:
        ids_ref = ray.put(pa.array(sorted(multi), pa.string()))

        def _split_filter(keep_multi: bool, project: bool):
            def fn(t: pa.Table) -> pa.Table:
                ids = ray.get(ids_ref)  # local zero-copy read after first fetch
                mask = pc.is_in(t["conv_id"], value_set=ids)
                if not keep_multi:
                    mask = pc.invert(mask)
                out = t.filter(mask)
                return out.select(_SPLIT_COLS) if project else out

            return fn

        single = splits.map_batches(
            _split_filter(False, True), batch_format="pyarrow", zero_copy_batch=True
        )
        to_merge = splits.map_batches(
            _split_filter(True, False), batch_format="pyarrow", zero_copy_batch=True
        ).map_batches(
            lambda t: _add_bucket(t, "conv_id", num_buckets),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        merged = to_merge.groupby("_bucket").map_groups(
            _merge_bucket, batch_format="pyarrow"
        )
        convs = single.union(merged)
    else:
        # unbounded multi-split population: full bucketed merge shuffle
        splits = splits.map_batches(
            lambda t: _add_bucket(t, "conv_id", num_buckets),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        convs = splits.groupby("_bucket").map_groups(
            _merge_bucket, batch_format="pyarrow"
        )
    return convs.map_batches(
        lambda t: t.append_column(
            "doc_chars", pc.cast(pc.utf8_length(t["doc"]), pa.int64())
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def oracle_assemble(extracted_table: pa.Table) -> pa.Table:
    """Single-threaded ground truth: assemble without salting."""
    t = extracted_table.sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    rows: dict[str, dict] = {}
    order: list[str] = []
    for conv_id, role, clean, status in zip(
        t["conv_id"].to_pylist(),
        t["role"].to_pylist(),
        t["clean_text"].to_pylist(),
        t["status"].to_pylist(),
    ):
        if conv_id not in rows:
            rows[conv_id] = {"n_turns": 0, "n_failed": 0, "n_skipped": 0, "parts": []}
            order.append(conv_id)
        r = rows[conv_id]
        r["n_turns"] += 1
        if status == STATUS_FAILED:
            r["n_failed"] += 1
        else:
            r["parts"].append(_format_turn(role, clean))
        if status == STATUS_SKIPPED:
            r["n_skipped"] += 1
    docs = [TURN_SEP.join(rows[c]["parts"]) for c in order]
    return pa.table(
        {
            "conv_id": pa.array(order, pa.string()),
            "n_turns": pa.array([rows[c]["n_turns"] for c in order], pa.int64()),
            "n_failed": pa.array([rows[c]["n_failed"] for c in order], pa.int64()),
            "n_skipped": pa.array([rows[c]["n_skipped"] for c in order], pa.int64()),
            "doc": pa.array(docs, pa.string()),
            "doc_chars": pa.array([len(d) for d in docs], pa.int64()),
        }
    )


def near_dedup_conversations(
    paths: list[str],
    cfg: ExtractConfig | None = None,
    threshold: float = 0.7,
    n_bands: int | None = None,
    max_bucket_members: int | None = None,
) -> Dataset:
    """Conversation-level near-dedup — the unit a trainer actually dedups
    is the ASSEMBLED conversation document, not the raw turn. Composes
    raw transcripts → per-turn extraction → salted assembly →
    MinHash-LSH near-dup filter (survivor = minimum conv number).

    Returns kept ``(conv_id, doc_chars)``. Every stage is the existing
    scale-shaped machinery: the only new work is the int64 id the
    pair/CC plumbing shuffles (parsed from the ``conv-NNNNNN`` id, so
    8-byte rows move instead of strings).
    """
    from ocr_processor_ray.functions.dedup import near_dedup_filter
    from ocr_processor_ray.pipelines.extract_pipeline import run_extract

    cfg = cfg or ExtractConfig(salt_turn_threshold=256, read_num_blocks=16)
    docs = assemble_conversations(run_extract(paths, cfg), cfg)

    def project(b: pa.Table) -> pa.Table:
        conv_int = pc.cast(
            pc.utf8_slice_codeunits(b["conv_id"], 5, 2**31), pa.int64()
        )
        return pa.table({"conv_int": conv_int, "doc": b["doc"]})

    # near_dedup_filter consumes its input THREE times (band generation,
    # verify text-attach, anti-join). Upstream here is a computed
    # extract→assembly pipeline, not a prunable parquet read — pin the
    # projected (conv_int, doc) blocks in the object store once (spills
    # under pressure) instead of re-running extraction per consumer
    # (measured 50 s → ~15 s at sf0.1/32cpu).
    ids_docs = docs.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    from ocr_processor_ray.functions.dedup import MAX_BUCKET_MEMBERS, N_BANDS

    kept = near_dedup_filter(
        ids_docs,
        id_col="conv_int",
        text_col="doc",
        threshold=threshold,
        n_bands=N_BANDS if n_bands is None else n_bands,
        max_bucket_members=(
            MAX_BUCKET_MEMBERS if max_bucket_members is None else max_bucket_members
        ),
    )

    def finish(b: pa.Table) -> pa.Table:
        conv_id = pc.binary_join_element_wise(
            "conv-",
            pc.utf8_lpad(pc.cast(b["conv_int"], pa.string()), 6, "0"),
            "",
        )
        return pa.table(
            {
                "conv_id": conv_id,
                "doc_chars": pc.cast(pc.utf8_length(b["doc"]), pa.int64()),
            }
        )

    return kept.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
