"""Checkpointed, resumable flagship run.

Flow (SURVEY.md §3 new-engine lifecycle):

    read_parquet (pruned)
      → map_batches(add part = crc32(conv_id) % P)        # stateless
      → filter out completed partitions (resume anti-join) # vectorized
      → map_batches(ExtractTurns actor pool)               # row-local
      → groupby("part").map_groups(write part atomically)  # the one shuffle
      → fold per-partition manifests → job summary

The single shuffle is keyed by the bounded ``part`` column (P groups,
P ≪ rows), so its exchange volume is the extracted output exactly once.
At cluster scale P is sized so one partition (≈ input_bytes / P) fits a
worker; reruns skip completed partitions by manifest existence — the
anti-join semantics of the reference's archive skip (ocr_combined.py:51-56,150)
lifted to partitions.
"""

from __future__ import annotations

import functools
import json
import os

import pyarrow as pa
import pyarrow.compute as pc

from ocr_processor_ray.config import ExtractConfig
from ocr_processor_ray.pipelines.extract_pipeline import extract_turns, read_transcripts
from ocr_processor_ray.state.counters import counters_from_table
from ocr_processor_ray.state.manifest import completed_partitions, write_partition_atomic
from ocr_processor_ray.state.partitioning import add_partition_column


def _write_group(group: pa.Table, out_dir: str) -> pa.Table:
    """map_groups body: one group == one output partition."""
    part = group["part"][0].as_py()
    group = group.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    group = group.drop_columns(["part"])
    counters = counters_from_table(group)
    lineage = {
        "conv_ids": pc.count_distinct(group["conv_id"]).as_py(),
        "key": "crc32(conv_id)",
    }
    manifest = write_partition_atomic(out_dir, part, group, counters, lineage)
    return pa.table(
        {
            "part": pa.array([part], pa.int32()),
            "rows": pa.array([manifest["rows"]], pa.int64()),
            "counters_json": pa.array([json.dumps(counters, sort_keys=True)], pa.string()),
        }
    )


def run_checkpointed(
    in_path: str | list[str],
    out_dir: str,
    cfg: ExtractConfig | None = None,
    input_format: str = "parquet",
) -> dict:
    """Run (or resume) the flagship extraction into ``out_dir``.

    Returns the job summary: partitions written this run, partitions
    skipped as already complete, and folded counters over the whole
    output (including previously-completed partitions).
    ``input_format`` ∈ {parquet, json, csv} — non-Parquet corpora route
    through ``sources.readers.read_transcripts_any``.
    """
    import time

    started_at = time.time()
    cfg = cfg or ExtractConfig()
    num_parts = cfg.num_output_partitions
    done = completed_partitions(out_dir)

    import ray.data as rd

    from ocr_processor_ray.pipelines.extract_pipeline import EXTRACT_COLUMNS

    nb = cfg.read_num_blocks if cfg.read_num_blocks is not None else num_parts
    if input_format != "parquet":
        from ocr_processor_ray.sources.readers import read_transcripts_any

        ds = read_transcripts_any(in_path, format=input_format, columns=EXTRACT_COLUMNS)
    elif nb:
        ds = rd.read_parquet(in_path, columns=EXTRACT_COLUMNS, override_num_blocks=nb)
    else:  # 0 → Ray's size-based splitting (the right call at real scale)
        ds = read_transcripts(in_path)
    ds = ds.map_batches(
        functools.partial(add_partition_column, num_partitions=num_parts),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if done:
        done_arr = pa.array(sorted(done), pa.int32())
        ds = ds.map_batches(
            lambda t: t.filter(
                pc.invert(pc.is_in(t["part"], value_set=done_arr))
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    ds = extract_turns(ds, cfg)
    summaries = ds.groupby("part").map_groups(
        functools.partial(_write_group, out_dir=out_dir),
        batch_format="pyarrow",
    )
    written = summaries.take_all()  # ≤ P tiny rows

    # fold counters across ALL completed partitions from their manifests
    from ocr_processor_ray.state.compact import fold_counters
    from ocr_processor_ray.state.manifest import read_manifests

    total = fold_counters(read_manifests(out_dir))

    completed_at = time.time()
    summary = {
        "partitions_written": sorted(int(r["part"]) for r in written),
        "partitions_skipped": sorted(done),
        "num_partitions": num_parts,
        "counters": total,
        # job timing (the reference's OCRJob started_at / completed_at /
        # processing_time, database_manager.py:96-101) — consumed by the
        # windowed performance report
        "started_at": started_at,
        "completed_at": completed_at,
        "processing_time": completed_at - started_at,
    }
    with open(os.path.join(out_dir, "_job_summary.json"), "w") as f:
        json.dump(summary, f, sort_keys=True, indent=1)
    return summary
