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
each split assembles its contiguous range, and a second, *tiny* groupby
over the per-split rows (≤ a few rows per conversation) merges splits in
salt order. Two shuffles, but the second one moves only one short row
per split, not turn data.

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


def _assemble_bucket(group: pa.Table) -> pa.Table:
    """All salted splits of one bucket → one summary row per split."""
    group = group.sort_by([("salt_key", "ascending"), ("turn_idx", "ascending")])
    keys = group["salt_key"].to_pylist()
    convs = group["conv_id"].to_pylist()
    roles = group["role"].to_pylist()
    cleans = group["clean_text"].to_pylist()
    statuses = group["status"].to_pylist()

    o_conv, o_key, o_turns, o_failed, o_skipped, o_doc = [], [], [], [], [], []
    i, n = 0, len(keys)
    while i < n:
        j = i
        parts: list[str] = []
        failed = skipped = 0
        while j < n and keys[j] == keys[i]:
            if statuses[j] == STATUS_FAILED:
                failed += 1
            else:
                parts.append(_format_turn(roles[j], cleans[j]))
            if statuses[j] == STATUS_SKIPPED:
                skipped += 1
            j += 1
        o_conv.append(convs[i])
        o_key.append(keys[i])
        o_turns.append(j - i)
        o_failed.append(failed)
        o_skipped.append(skipped)
        o_doc.append(TURN_SEP.join(parts))
        i = j
    return pa.table(
        {
            "conv_id": pa.array(o_conv, pa.string()),
            "salt_key": pa.array(o_key, pa.string()),
            "n_turns": pa.array(o_turns, pa.int64()),
            "n_failed": pa.array(o_failed, pa.int64()),
            "n_skipped": pa.array(o_skipped, pa.int64()),
            "doc": pa.array(o_doc, pa.string()),
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


def assemble_conversations(extracted: Dataset, cfg: ExtractConfig | None = None) -> Dataset:
    """Extracted turns → one document row per conversation.

    Output schema: ``conv_id, n_turns, n_failed, n_skipped, doc, doc_chars``.
    """
    cfg = cfg or ExtractConfig()
    num_buckets = max(16, cfg.num_output_partitions)
    ds = extracted.map_batches(
        # project to the columns assembly consumes BEFORE the shuffle —
        # spans/status_detail/byte counters are dead weight in the exchange
        lambda t: _add_bucket(
            add_salt_key(
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
    splits = splits.map_batches(
        lambda t: _add_bucket(t, "conv_id", num_buckets),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    convs = splits.groupby("_bucket").map_groups(_merge_bucket, batch_format="pyarrow")
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
