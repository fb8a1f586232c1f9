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


def _assemble_split(group: pa.Table) -> pa.Table:
    """One salted split → one summary row with its assembled doc fragment."""
    group = group.sort_by([("turn_idx", "ascending")])
    salt_key = group["salt_key"][0].as_py()
    conv_id = group["conv_id"][0].as_py()
    roles = group["role"].to_pylist()
    cleans = group["clean_text"].to_pylist()
    statuses = group["status"].to_pylist()
    parts = [
        _format_turn(r, c)
        for r, c, s in zip(roles, cleans, statuses)
        if s != STATUS_FAILED
    ]
    doc = TURN_SEP.join(parts)
    return pa.table(
        {
            "conv_id": pa.array([conv_id], pa.string()),
            "salt_key": pa.array([salt_key], pa.string()),
            "n_turns": pa.array([group.num_rows], pa.int64()),
            "n_failed": pa.array([statuses.count(STATUS_FAILED)], pa.int64()),
            "n_skipped": pa.array([statuses.count(STATUS_SKIPPED)], pa.int64()),
            "doc": pa.array([doc], pa.string()),
        }
    )


def _merge_splits(group: pa.Table) -> pa.Table:
    """Merge a conversation's split rows in salt order (zero-padded key)."""
    group = group.sort_by([("salt_key", "ascending")])
    docs = [d for d in group["doc"].to_pylist() if d]
    return pa.table(
        {
            "conv_id": pa.array([group["conv_id"][0].as_py()], pa.string()),
            "n_turns": pa.array([pc.sum(group["n_turns"]).as_py()], pa.int64()),
            "n_failed": pa.array([pc.sum(group["n_failed"]).as_py()], pa.int64()),
            "n_skipped": pa.array([pc.sum(group["n_skipped"]).as_py()], pa.int64()),
            "doc": pa.array([TURN_SEP.join(docs)], pa.string()),
        }
    )


def assemble_conversations(extracted: Dataset, cfg: ExtractConfig | None = None) -> Dataset:
    """Extracted turns → one document row per conversation.

    Output schema: ``conv_id, n_turns, n_failed, n_skipped, doc, doc_chars``.
    """
    cfg = cfg or ExtractConfig()
    ds = extracted.map_batches(
        lambda t: add_salt_key(t, cfg.salt_turn_threshold),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    splits = ds.groupby("salt_key").map_groups(_assemble_split, batch_format="pyarrow")
    convs = splits.groupby("conv_id").map_groups(_merge_splits, batch_format="pyarrow")
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
