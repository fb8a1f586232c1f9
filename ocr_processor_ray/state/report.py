"""Windowed job reporting over checkpointed-run roots.

The reference serves two reporting surfaces from its job database:

* ``get_performance_report(days=7)`` (database_manager.py:499-535) — an
  N-day window over completed jobs: totals, success rate, average
  processing time;
* the ``job_summary`` SQL view (docker/init.sql:27-49) — one row per
  job with its RECORDED counters next to ACTUAL counts re-derived from
  the per-file table.

Here a "job" is one checkpointed run directory (``_job_summary.json`` +
``part=NNNNN/manifest.json``); the report scans only job METADATA
(one small JSON per job + per-partition manifests), never partition
data — driver-side cost is O(jobs), not O(rows), at any corpus size.
"""

from __future__ import annotations

import json
import os

from ocr_processor_ray.schema import STATUS_FAILED

_SUMMARY = "_job_summary.json"


def _job_dirs(runs_root: str | list[str]) -> list[str]:
    if isinstance(runs_root, (list, tuple)):
        roots = list(runs_root)
    else:
        roots = [
            os.path.join(runs_root, d)
            for d in sorted(os.listdir(runs_root))
            if os.path.isdir(os.path.join(runs_root, d))
        ]
        # a root that is itself a job dir counts as one job
        if os.path.exists(os.path.join(runs_root, _SUMMARY)):
            roots.append(runs_root)
    return [r for r in roots if os.path.exists(os.path.join(r, _SUMMARY))]


def job_summary_rows(runs_root: str | list[str]) -> list[dict]:
    """The ``job_summary`` view analog: one row per job, recorded
    counters cross-checked against counts re-derived from the
    partition manifests (init.sql's actual_file_count /
    actual_processed / actual_failed)."""
    from ocr_processor_ray.state.manifest import read_manifests

    rows = []
    for d in _job_dirs(runs_root):
        with open(os.path.join(d, _SUMMARY)) as f:
            s = json.load(f)
        counters = s.get("counters", {})
        total = counters.get("_total", {})
        failed = counters.get(STATUS_FAILED, {})
        actual_rows = 0
        actual_failed = 0
        for m in read_manifests(d):
            actual_rows += m.get("rows", 0)
            actual_failed += (
                m.get("counters", {}).get(STATUS_FAILED, {}).get("turns", 0)
            )
        rows.append(
            {
                "job_dir": d,
                "started_at": s.get("started_at"),
                "completed_at": s.get("completed_at"),
                "processing_time": s.get("processing_time"),
                "num_partitions": s.get("num_partitions"),
                "total_turns": total.get("turns", 0),
                "failed_turns": failed.get("turns", 0),
                "actual_turns": actual_rows,
                "actual_failed": actual_failed,
            }
        )
    return rows


def performance_report(
    runs_root: str | list[str], days: int = 7, now: float | None = None
) -> dict:
    """N-day performance window over completed jobs — field-for-field the
    reference's report (database_manager.py:499-535) with turns in place
    of files. ``now`` is injectable for deterministic tests; jobs whose
    summary predates timing fields are treated as outside the window."""
    import time

    now = time.time() if now is None else now
    start = now - days * 86400.0
    jobs = [
        r
        for r in job_summary_rows(runs_root)
        if r["completed_at"] is not None and r["completed_at"] >= start
    ]
    if not jobs:
        return {"message": "No data available for the specified period"}

    total_jobs = len(jobs)
    total_turns = sum(j["total_turns"] for j in jobs)
    failed_turns = sum(j["failed_turns"] for j in jobs)
    successful_turns = total_turns - failed_turns
    total_processing_time = sum(j["processing_time"] or 0.0 for j in jobs)
    return {
        "period_days": days,
        "total_jobs": total_jobs,
        "total_turns": total_turns,
        "successful_turns": successful_turns,
        "failed_turns": failed_turns,
        "success_rate": (successful_turns / total_turns * 100) if total_turns else 0,
        "avg_processing_time": total_processing_time / total_jobs,
        "avg_turns_per_job": total_turns / total_jobs,
        "total_processing_time": total_processing_time,
    }
