"""Small-partition compaction for checkpointed output roots.

A long-running ingest (or a run configured for high parallelism) leaves
an output root with many small ``part=NNNNN/`` directories; downstream
consumers then pay per-file open/list costs proportional to partition
count, not data size. ``compact_output`` rewrites a completed root into
fewer partitions using the SAME layout, partitioning rule, atomic-write
protocol and manifests as ``run_checkpointed`` — so the compacted root
is indistinguishable from a fresh run at the lower partition count:
resume, ``read_output``, the windowed report and the counters fold all
work unchanged (the in-place S10 variant's "rewrite, never append"
contract, ocr_combined.py:150 analog, lifted to partition granularity).

Scale shape: one bounded shuffle keyed by the new ``part`` column
(P_new groups), exchange volume = the data exactly once — identical to
the write stage of the original run. Compaction is itself resumable:
already-completed destination partitions are skipped by the same
manifest anti-join.
"""

from __future__ import annotations

import functools
import json
import os
import time

import pyarrow as pa
import pyarrow.compute as pc

from ocr_processor_ray.state.manifest import (
    DATA_NAME,
    _part_dir,
    completed_partitions,
    read_manifests,
)
from ocr_processor_ray.state.partitioning import add_partition_column


def fold_counters(manifests: list[dict]) -> dict:
    """Fold per-partition manifest counters into one job-level dict
    (status → turns/bytes/categories, plus ``_total``)."""
    total: dict = {}
    grand = {"turns": 0, "bytes_in": 0, "bytes_out": 0}
    for m in manifests:
        for status, c in m["counters"].items():
            bucket = total.setdefault(
                status, {"turns": 0, "bytes_in": 0, "bytes_out": 0}
            )
            for k in ("turns", "bytes_in", "bytes_out"):
                bucket[k] += c[k]
                grand[k] += c[k]
            for cat, n in c.get("categories", {}).items():
                cats = bucket.setdefault("categories", {})
                cats[cat] = cats.get(cat, 0) + n
    total["_total"] = grand
    return total


def compact_output(
    src_dir: str, dst_dir: str, num_output_partitions: int
) -> dict:
    """Rewrite the completed partitions of ``src_dir`` into
    ``num_output_partitions`` partitions under ``dst_dir``.

    ``dst_dir`` must not be ``src_dir`` (the source stays readable —
    and resumable — until the caller deletes it; compact-then-swap is
    the crash-safe order). Returns a job summary of the same shape as
    ``run_checkpointed``'s.
    """
    if os.path.abspath(src_dir) == os.path.abspath(dst_dir):
        raise ValueError("compact_output requires dst_dir != src_dir")
    src_parts = sorted(completed_partitions(src_dir))
    if not src_parts:
        raise ValueError(f"no completed partitions under {src_dir!r}")

    import ray.data as rd

    from ocr_processor_ray.state.checkpoint import _write_group

    started_at = time.time()
    files = [
        os.path.join(_part_dir(src_dir, p), DATA_NAME) for p in src_parts
    ]
    # partitioning=None: the hive-style `part=NNNNN/` directory names
    # would otherwise be discovered as a partition column and collide
    # with the `part` column add_partition_column appends
    # Resume safety: completed dst partition ids only mean anything
    # under the partition count they were written with — resuming with a
    # different count would drop rows whose new assignment collides with
    # an old completed id and duplicate others. Record the count before
    # the first write and refuse to resume under a different one.
    os.makedirs(dst_dir, exist_ok=True)
    count_marker = os.path.join(dst_dir, "_num_partitions.json")
    if os.path.exists(count_marker):
        with open(count_marker) as f:
            prev = json.load(f)["num_partitions"]
        if prev != num_output_partitions:
            raise ValueError(
                f"{dst_dir!r} was partially compacted with "
                f"num_output_partitions={prev}; resuming with "
                f"{num_output_partitions} would corrupt the output — "
                "finish with the original count or use a fresh dst_dir"
            )
    else:
        if completed_partitions(dst_dir):
            # completed partitions but no marker: written by a pre-marker
            # build (or another writer) under an UNKNOWN count — adopting
            # the requested count would permit the exact drop/duplicate
            # corruption this guard exists for
            raise ValueError(
                f"{dst_dir!r} has completed partitions but no "
                "_num_partitions.json marker; its original partition "
                "count is unknown, so resuming cannot be proven safe — "
                "use a fresh dst_dir"
            )
        with open(count_marker, "w") as f:
            json.dump({"num_partitions": num_output_partitions}, f)

    ds = rd.read_parquet(files, partitioning=None)
    ds = ds.map_batches(
        functools.partial(
            add_partition_column, num_partitions=num_output_partitions
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    done = completed_partitions(dst_dir)
    if done:
        done_arr = pa.array(sorted(done), pa.int32())
        ds = ds.map_batches(
            lambda t: t.filter(
                pc.invert(pc.is_in(t["part"], value_set=done_arr))
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    summaries = ds.groupby("part").map_groups(
        functools.partial(_write_group, out_dir=dst_dir),
        batch_format="pyarrow",
    )
    written = summaries.take_all()  # ≤ P_new tiny rows

    completed_at = time.time()
    summary = {
        "partitions_written": sorted(int(r["part"]) for r in written),
        "partitions_skipped": sorted(done),
        "num_partitions": num_output_partitions,
        "compacted_from": {"src": src_dir, "partitions": len(src_parts)},
        "counters": fold_counters(read_manifests(dst_dir)),
        "started_at": started_at,
        "completed_at": completed_at,
        "processing_time": completed_at - started_at,
    }
    with open(os.path.join(dst_dir, "_job_summary.json"), "w") as f:
        json.dump(summary, f, sort_keys=True, indent=1)
    return summary
