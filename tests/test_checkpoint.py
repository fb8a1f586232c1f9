"""Checkpoint / resume: partition layout, atomicity, resume == single run."""

import os
import shutil

import pyarrow as pa
import pytest

from ocr_processor_ray.config import ExtractConfig
from ocr_processor_ray.oracle import oracle_extract_table
from ocr_processor_ray.state.manifest import (
    completed_partitions,
    read_manifests,
    read_output,
)
from ocr_processor_ray.state.partitioning import partition_of


def _sorted(table: pa.Table) -> pa.Table:
    return table.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def test_partition_of_is_stable():
    assert partition_of("conv-000001", 64) == partition_of("conv-000001", 64)
    parts = {partition_of(f"conv-{i:06d}", 16) for i in range(500)}
    assert parts == set(range(16))  # all partitions hit at this cardinality


@pytest.mark.usefixtures("ray_session")
class TestCheckpoint:
    CFG = ExtractConfig(num_output_partitions=8, batch_size=128)

    def test_single_run_complete_and_correct(self, transcripts_small, transcripts_table, tmp_path):
        from ocr_processor_ray.state.checkpoint import run_checkpointed

        out = str(tmp_path / "out")
        summary = run_checkpointed(transcripts_small, out, self.CFG)
        assert summary["partitions_skipped"] == []
        assert completed_partitions(out) == set(summary["partitions_written"])

        got = read_output(out)
        want = oracle_extract_table(transcripts_table)
        got = _sorted(got).select(want.column_names)
        for col in want.column_names:
            assert got[col].to_pylist() == want[col].to_pylist(), col

        # manifests carry exact counters
        total_turns = sum(
            c["turns"] for m in read_manifests(out) for c in m["counters"].values()
        )
        assert total_turns == want.num_rows
        assert summary["counters"]["_total"]["turns"] == want.num_rows

    def test_within_partition_rows_are_turn_ordered(self, transcripts_small, tmp_path):
        from ocr_processor_ray.state.checkpoint import run_checkpointed
        import pyarrow.parquet as pq

        out = str(tmp_path / "out")
        run_checkpointed(transcripts_small, out, self.CFG)
        pdir = sorted(
            d for d in os.listdir(out) if d.startswith("part=") and "." not in d
        )[0]
        t = pq.read_table(os.path.join(out, pdir, "data.parquet"))
        keys = list(zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist()))
        assert keys == sorted(keys)

    def test_resume_after_partial_run(self, transcripts_small, transcripts_table, tmp_path):
        """Simulate a crash: delete some completed partitions, rerun, and the
        resumed output must equal a single clean run (SURVEY.md §5.4)."""
        from ocr_processor_ray.state.checkpoint import run_checkpointed

        out = str(tmp_path / "out")
        run_checkpointed(transcripts_small, out, self.CFG)
        all_parts = sorted(completed_partitions(out))
        # "crash": lose half the partitions, plus leave a torn temp dir behind
        for p in all_parts[::2]:
            shutil.rmtree(os.path.join(out, f"part={p:05d}"))
        os.makedirs(os.path.join(out, f"part={all_parts[0]:05d}.tmp"), exist_ok=True)

        summary = run_checkpointed(transcripts_small, out, self.CFG)
        assert set(summary["partitions_skipped"]) == set(all_parts[1::2])
        assert set(summary["partitions_written"]) == set(all_parts[::2])

        got = _sorted(read_output(out))
        want = oracle_extract_table(transcripts_table)
        got = got.select(want.column_names)
        for col in want.column_names:
            assert got[col].to_pylist() == want[col].to_pylist(), col

    def test_rerun_is_noop(self, transcripts_small, tmp_path):
        from ocr_processor_ray.state.checkpoint import run_checkpointed

        out = str(tmp_path / "out")
        s1 = run_checkpointed(transcripts_small, out, self.CFG)
        s2 = run_checkpointed(transcripts_small, out, self.CFG)
        assert s2["partitions_written"] == []
        assert set(s2["partitions_skipped"]) == set(s1["partitions_written"])
        assert s2["counters"] == s1["counters"]
