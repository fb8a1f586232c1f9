"""Single-threaded reference oracle (no Ray).

The correctness ground truth: a plain Python loop applying
``extract_turn`` to every row of a transcript table, in ``(conv_id,
turn_idx)`` order. The distributed pipeline must match this output
byte-for-byte per turn — the analog of the reference's sidecar text
file being the authoritative extraction artifact (ocr_combined.py:169,196).
Used only by tests and small-scale verification; never in the hot path.
"""

from __future__ import annotations

import pyarrow as pa

from ocr_processor_ray.extract.core import extract_turn
from ocr_processor_ray.schema import EXTRACTED_SCHEMA


def oracle_extract_table(table: pa.Table, mode: str = "cli") -> pa.Table:
    """Extract every turn single-threaded; output sorted by (conv_id, turn_idx)."""
    table = table.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    conv_ids = table["conv_id"].to_pylist()
    turn_idxs = table["turn_idx"].to_pylist()
    roles = table["role"].to_pylist()
    texts = table["text"].to_pylist()

    kinds, cleans, spans_col, statuses, details, b_in, b_out = [], [], [], [], [], [], []
    for text in texts:
        r = extract_turn(text, mode=mode)
        kinds.append(r["payload_kind"])
        cleans.append(r["clean_text"])
        spans_col.append(
            [{"start": s, "end": e, "kind": k} for s, e, k in r["spans"]]
        )
        statuses.append(r["status"])
        details.append(r["status_detail"])
        b_in.append(r["bytes_in"])
        b_out.append(r["bytes_out"])

    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "payload_kind": pa.array(kinds, pa.string()),
            "clean_text": pa.array(cleans, pa.string()),
            "spans": pa.array(spans_col, EXTRACTED_SCHEMA.field("spans").type),
            "status": pa.array(statuses, pa.string()),
            "status_detail": pa.array(details, pa.string()),
            "bytes_in": pa.array(b_in, pa.int64()),
            "bytes_out": pa.array(b_out, pa.int64()),
        }
    )
