"""G1/G2 — exact counters via two-phase aggregation.

The reference keeps loop-local processed/skipped counters
(ocr_combined.py:250-264) and lock-guarded running metrics
(progress_tracker.py:81-143). Here counters ride in the data: each block
emits per-status partial sums inside ``map_batches`` (one row per status
per batch), then a tiny ``groupby("status")`` folds the partials —
no shared mutable state, exact under retries of the *aggregation* stage.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Sum


def partial_counters(batch: pa.Table) -> pa.Table:
    """Per-batch partial: one row per status with turn/byte sums."""
    out = batch.group_by("status").aggregate(
        [("status", "count"), ("bytes_in", "sum"), ("bytes_out", "sum")]
    )
    return pa.table(
        {
            "status": out["status"],
            "turns": pc.cast(out["status_count"], pa.int64()),
            "bytes_in": out["bytes_in_sum"],
            "bytes_out": out["bytes_out_sum"],
        }
    )


def fold_counters(extracted: Dataset) -> dict:
    """Fold an extracted Dataset's counters into a plain dict:

    ``{status: {"turns": n, "bytes_in": b, "bytes_out": b}, ...,
    "_total": {...}}`` — the north rule's turns processed / parse
    failures / bytes in/out.
    """
    partials = extracted.map_batches(partial_counters, batch_format="pyarrow")
    folded = partials.groupby("status").aggregate(
        Sum("turns", alias_name="turns"),
        Sum("bytes_in", alias_name="bytes_in"),
        Sum("bytes_out", alias_name="bytes_out"),
    )
    rows = folded.take_all()  # ≤ 3 rows
    out: dict = {}
    total = {"turns": 0, "bytes_in": 0, "bytes_out": 0}
    for r in rows:
        out[r["status"]] = {
            "turns": r["turns"],
            "bytes_in": r["bytes_in"],
            "bytes_out": r["bytes_out"],
        }
        for k in total:
            total[k] += r[k]
    out["_total"] = total
    return out


def counters_from_table(table: pa.Table) -> dict:
    """Same fold over an in-memory partition table (used by the
    checkpoint writer to stamp manifests). When the table carries
    ``status_detail``, failed rows also get an O18-category breakdown
    (``"parse_failure"`` → ``{"categories": {"bad_record": n, ...}}``)."""
    part = partial_counters(table)
    out: dict = {}
    for i in range(part.num_rows):
        out[part["status"][i].as_py()] = {
            "turns": part["turns"][i].as_py(),
            "bytes_in": part["bytes_in"][i].as_py(),
            "bytes_out": part["bytes_out"][i].as_py(),
        }
    if "status_detail" in table.column_names and "parse_failure" in out:
        failed = table.filter(pc.equal(table["status"], "parse_failure"))
        cats = pc.replace_substring_regex(
            failed["status_detail"], pattern=":.*$", replacement=""
        )
        counts = pa.table({"category": cats}).group_by("category").aggregate(
            [("category", "count")]
        )
        out["parse_failure"]["categories"] = dict(
            sorted(
                zip(
                    counts["category"].to_pylist(),
                    counts["category_count"].to_pylist(),
                )
            )
        )
    return out
