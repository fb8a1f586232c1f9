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


class TestRetryAccounting:
    CFG = ExtractConfig(num_output_partitions=8)

    def test_attempts_counter(self, transcripts_small, tmp_path):
        """Manifests carry a partition-level retry counter (the reference's
        per-file retry_count analog): 1 on a clean write, incremented when
        a crashed attempt (stale .tmp) or overwrite preceded it."""
        import json

        from ocr_processor_ray.state.checkpoint import run_checkpointed
        from ocr_processor_ray.state.manifest import read_manifests

        out = str(tmp_path / "out")
        run_checkpointed(transcripts_small, out, self.CFG)
        ms = {m["part"]: m for m in read_manifests(out)}
        assert all(m["attempts"] == 1 for m in ms.values())

        # crash one partition (manifest lost, stale tmp left) and rerun
        victim = sorted(ms)[0]
        pdir = os.path.join(out, f"part={victim:05d}")
        shutil.rmtree(pdir)
        os.makedirs(pdir + ".tmp", exist_ok=True)
        run_checkpointed(transcripts_small, out, self.CFG)
        ms2 = {m["part"]: m for m in read_manifests(out)}
        assert ms2[victim]["attempts"] == 2
        assert all(m["attempts"] == 1 for p, m in ms2.items() if p != victim)


class TestOverlaySink:
    def test_overlay_svg_deterministic_and_valid(self, transcripts_small, tmp_path):
        import xml.etree.ElementTree as ET

        from ocr_processor_ray.config import ExtractConfig as EC
        from ocr_processor_ray.pipelines.extract_pipeline import run_extract
        from ocr_processor_ray.stages.overlay import (
            render_span_overlay_svg,
            write_overlays,
        )

        ds = run_extract(transcripts_small, EC(mode="visual"))
        out = str(tmp_path / "overlays")
        n = write_overlays(ds, out)
        files = sorted(os.listdir(out))
        assert n == len(files) > 0
        # every file parses as XML, and rect count == word-span count
        sample = os.path.join(out, files[0])
        with open(sample) as f:
            svg = f.read()
        root = ET.fromstring(svg)
        rects = [e for e in root.iter() if e.tag.endswith("rect")]
        conv, idx = files[0][:-4].rsplit("_", 1)
        row = (
            run_extract(transcripts_small, EC(mode="visual"))
            .to_pandas()
            .set_index(["conv_id", "turn_idx"])
            .loc[(conv, int(idx))]
        )
        n_word = sum(1 for s in row["spans"] if s["kind"] == "word")
        # wrapped spans may emit >1 rect, never fewer
        assert len(rects) >= n_word > 0
        # deterministic re-render
        assert render_span_overlay_svg(row["clean_text"], list(row["spans"])) == \
               render_span_overlay_svg(row["clean_text"], list(row["spans"]))


@pytest.mark.usefixtures("ray_session")
class TestIncrementalAgg:
    SPEC = (
        ["event_type"],
        [("event_id", "count", "n"), ("event_id", "min", "min_id"),
         ("event_id", "max", "max_id")],
    )

    def _halves(self):
        import pyarrow.compute as pc
        import ray.data as rd

        full = rd.read_parquet(
            "/root/testdata/sf0.001/events.parquet", columns=["event_type", "event_id"]
        )
        def parity(p):
            return lambda b: b.filter(
                pc.equal(pc.bit_wise_and(b["event_id"], 1), p)
            )
        return (
            full,
            full.map_batches(parity(0), batch_format="pyarrow"),
            full.map_batches(parity(1), batch_format="pyarrow"),
        )

    def test_two_increments_equal_one_shot(self, tmp_path):
        import pandas as pd

        from ocr_processor_ray.functions.agg import two_phase_agg
        from ocr_processor_ray.state.incremental import (
            incremental_agg_read,
            incremental_agg_update,
        )

        full, h1, h2 = self._halves()
        store = str(tmp_path / "store")
        incremental_agg_update(store, h1, *self.SPEC, increment_id="h1")
        incremental_agg_update(store, h2, *self.SPEC, increment_id="h2")
        got = incremental_agg_read(store).to_pandas().sort_values(
            "event_type", ignore_index=True
        )
        want = two_phase_agg(full, *self.SPEC).to_pandas().sort_values(
            "event_type", ignore_index=True
        )
        pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)

    def test_replayed_increment_is_noop(self, tmp_path):
        from ocr_processor_ray.state.incremental import (
            incremental_agg_read,
            incremental_agg_update,
        )

        _, h1, _ = self._halves()
        store = str(tmp_path / "store")
        incremental_agg_update(store, h1, *self.SPEC, increment_id="h1")
        before = incremental_agg_read(store).to_pandas()
        meta = incremental_agg_update(store, h1, *self.SPEC, increment_id="h1")
        after = incremental_agg_read(store).to_pandas()
        assert meta["gen"] == 0  # no new generation written
        key = ["event_type"]
        assert before.sort_values(key, ignore_index=True).equals(
            after.sort_values(key, ignore_index=True)
        )

    def test_spec_mismatch_rejected(self, tmp_path):
        from ocr_processor_ray.state.incremental import incremental_agg_update

        _, h1, h2 = self._halves()
        store = str(tmp_path / "store")
        incremental_agg_update(store, h1, *self.SPEC, increment_id="h1")
        with pytest.raises(ValueError):
            incremental_agg_update(
                store, h2, ["event_type"], [("event_id", "sum", "s")],
                increment_id="h2",
            )

    def test_non_mergeable_agg_rejected(self, tmp_path):
        from ocr_processor_ray.state.incremental import incremental_agg_update

        _, h1, _ = self._halves()
        with pytest.raises(ValueError):
            incremental_agg_update(
                str(tmp_path / "s"), h1, ["event_type"],
                [("event_id", "median", "m")], increment_id="x",
            )
    def test_orphan_generation_does_not_block_retry(self, tmp_path):
        """A crash after the gen write but before the meta swap leaves an
        orphan gen dir; the retry must fold the increment cleanly."""
        import os

        import pandas as pd

        from ocr_processor_ray.functions.agg import two_phase_agg
        from ocr_processor_ray.state.incremental import (
            incremental_agg_read,
            incremental_agg_update,
        )

        full, h1, h2 = self._halves()
        store = str(tmp_path / "store")
        incremental_agg_update(store, h1, *self.SPEC, increment_id="h1")
        # simulate the crash: orphan gen=000001 exists, meta still at gen 0
        os.makedirs(os.path.join(store, "gen=000001", "leftover"), exist_ok=True)
        incremental_agg_update(store, h2, *self.SPEC, increment_id="h2")
        got = incremental_agg_read(store).to_pandas().sort_values(
            "event_type", ignore_index=True
        )
        want = two_phase_agg(full, *self.SPEC).to_pandas().sort_values(
            "event_type", ignore_index=True
        )
        pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)



@pytest.mark.usefixtures("ray_session")
class TestBucketedStore:
    def _stores(self, tmp_path):
        import ray.data as rd

        from ocr_processor_ray.state.bucketed_store import write_bucketed

        cust = rd.read_parquet(
            "/root/testdata/sf0.001/customer.parquet",
            columns=["c_custkey", "c_mktsegment"],
        )
        orders = rd.read_parquet(
            "/root/testdata/sf0.001/orders.parquet",
            columns=["o_custkey", "o_totalprice"],
        ).map_batches(
            lambda b: b.rename_columns(["c_custkey", "o_totalprice"]),
            batch_format="pyarrow",
        )
        ld, rd_ = str(tmp_path / "c"), str(tmp_path / "o")
        write_bucketed(cust, ld, "c_custkey", 8)
        write_bucketed(orders, rd_, "c_custkey", 8)
        return ld, rd_

    def test_store_join_matches_duckdb(self, tmp_path):
        import duckdb
        import pandas as pd

        from ocr_processor_ray.state.bucketed_store import bucketed_store_join

        ld, rd_ = self._stores(tmp_path)
        got = bucketed_store_join(ld, rd_).to_pandas()
        want = duckdb.sql(
            """SELECT c.c_custkey, c.c_mktsegment, o.o_totalprice
               FROM '/root/testdata/sf0.001/customer.parquet' c
               JOIN '/root/testdata/sf0.001/orders.parquet' o
                 ON c.c_custkey = o.o_custkey"""
        ).df()
        canon = lambda d: d[sorted(d.columns)].sort_values(
            by=sorted(d.columns), ignore_index=True
        )
        pd.testing.assert_frame_equal(
            canon(got), canon(want), check_dtype=False, check_exact=True
        )

    def test_rewrite_skips_existing_buckets(self, tmp_path):
        import ray.data as rd

        from ocr_processor_ray.state.bucketed_store import (
            read_bucketed,
            write_bucketed,
        )

        cust = rd.read_parquet(
            "/root/testdata/sf0.001/customer.parquet",
            columns=["c_custkey", "c_mktsegment"],
        )
        d = str(tmp_path / "c2")
        write_bucketed(cust, d, "c_custkey", 8)
        n1 = read_bucketed(d).count()
        write_bucketed(cust, d, "c_custkey", 8)  # resume: all buckets skipped
        assert read_bucketed(d).count() == n1 == 150

    def test_resume_with_different_layout_fails_fast(self, tmp_path):
        """Re-running write_bucketed against an existing store with a
        different key or bucket count must raise, not silently mix stale
        and fresh buckets (ADVICE r2)."""
        import ray.data as rd

        from ocr_processor_ray.state.bucketed_store import write_bucketed

        cust = rd.read_parquet(
            "/root/testdata/sf0.001/customer.parquet",
            columns=["c_custkey", "c_nationkey"],
        )
        d = str(tmp_path / "store")
        write_bucketed(cust, d, "c_custkey", 8)
        with pytest.raises(ValueError):
            write_bucketed(cust, d, "c_custkey", 16)  # other bucket count
        with pytest.raises(ValueError):
            write_bucketed(cust, d, "c_nationkey", 8)  # other key

    def test_mismatched_bucket_count_rejected(self, tmp_path):
        import ray.data as rd

        from ocr_processor_ray.state.bucketed_store import (
            bucketed_store_join,
            write_bucketed,
        )

        cust = rd.read_parquet(
            "/root/testdata/sf0.001/customer.parquet", columns=["c_custkey"]
        )
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        write_bucketed(cust, a, "c_custkey", 4)
        write_bucketed(cust, b, "c_custkey", 8)
        with pytest.raises(ValueError):
            bucketed_store_join(a, b)


@pytest.mark.usefixtures("ray_session")
class TestPerformanceReport:
    """Windowed 7-day report over multiple checkpointed runs (the
    reference's get_performance_report + job_summary view)."""

    def _runs(self, transcripts_small, tmp_path):
        import json

        from ocr_processor_ray.state.checkpoint import run_checkpointed

        root = tmp_path / "runs"
        for i, n in enumerate((4, 8)):
            run_checkpointed(
                transcripts_small,
                str(root / f"job{i}"),
                ExtractConfig(num_output_partitions=n),
            )
        # age job0 out of the window by rewriting its completed_at
        sp = root / "job0" / "_job_summary.json"
        s = json.loads(sp.read_text())
        s["completed_at"] -= 30 * 86400
        sp.write_text(json.dumps(s))
        return str(root)

    def test_window_filters_and_metrics(self, transcripts_small, tmp_path):
        from ocr_processor_ray.state.report import job_summary_rows, performance_report

        root = self._runs(transcripts_small, tmp_path)
        rows = job_summary_rows(root)
        assert len(rows) == 2
        for r in rows:
            # recorded counters must agree with manifest-derived actuals
            assert r["total_turns"] == r["actual_turns"] > 0
            assert r["failed_turns"] == r["actual_failed"] > 0

        rep = performance_report(root, days=7)
        assert rep["total_jobs"] == 1  # job0 aged out of the window
        in_window = [r for r in rows if r["job_dir"].endswith("job1")][0]
        assert rep["total_turns"] == in_window["total_turns"]
        assert rep["failed_turns"] == in_window["failed_turns"]
        assert (
            rep["successful_turns"] == rep["total_turns"] - rep["failed_turns"]
        )
        assert 0 < rep["success_rate"] < 100
        assert rep["avg_processing_time"] > 0

        wide = performance_report(root, days=90)
        assert wide["total_jobs"] == 2
        assert wide["total_turns"] == sum(r["total_turns"] for r in rows)

        empty = performance_report(root, days=7, now=4.0e12)
        assert "message" in empty


@pytest.mark.usefixtures("ray_session")
class TestCompaction:
    def _run(self, transcripts_small, tmp_path, parts):
        from ocr_processor_ray.config import ExtractConfig
        from ocr_processor_ray.state.checkpoint import run_checkpointed

        out = str(tmp_path / "out16")
        s = run_checkpointed(
            transcripts_small, out, ExtractConfig(num_output_partitions=parts)
        )
        return out, s

    def test_compact_preserves_rows_counters_and_layout(
        self, transcripts_small, tmp_path
    ):
        from ocr_processor_ray.state.compact import compact_output
        from ocr_processor_ray.state.manifest import (
            completed_partitions,
            read_manifests,
            read_output,
        )

        src, s_src = self._run(transcripts_small, tmp_path, 16)
        dst = str(tmp_path / "out4")
        summary = compact_output(src, dst, 4)

        assert summary["partitions_written"] == [0, 1, 2, 3]
        assert completed_partitions(dst) == {0, 1, 2, 3}
        a = read_output(src).sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        b = read_output(dst).sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        assert a.equals(b)  # byte-identical content, fewer partitions
        assert summary["counters"] == s_src["counters"]
        # manifests carry the same lineage key and partition sizes sum up
        ms = read_manifests(dst)
        assert sum(m["rows"] for m in ms) == a.num_rows
        assert all(m["lineage"]["key"] == "crc32(conv_id)" for m in ms)

    def test_compact_is_resumable_and_guards_inplace(
        self, transcripts_small, tmp_path
    ):
        import pytest as _pytest

        from ocr_processor_ray.state.compact import compact_output

        src, _ = self._run(transcripts_small, tmp_path, 16)
        dst = str(tmp_path / "out4")
        compact_output(src, dst, 4)
        again = compact_output(src, dst, 4)
        assert again["partitions_written"] == []  # resume is a no-op
        assert again["partitions_skipped"] == [0, 1, 2, 3]
        with _pytest.raises(ValueError):
            compact_output(src, src, 4)
        # resuming the same dst with a DIFFERENT partition count would
        # drop/duplicate rows — must refuse loudly
        with _pytest.raises(ValueError, match="num_output_partitions=4"):
            compact_output(src, dst, 8)
        # completed partitions but NO count marker (pre-marker build /
        # foreign writer): the original count is unknowable, so resume
        # must refuse rather than silently adopt the requested count
        import os as _os

        _os.remove(_os.path.join(dst, "_num_partitions.json"))
        with _pytest.raises(ValueError, match="no .*marker|marker"):
            compact_output(src, dst, 4)
