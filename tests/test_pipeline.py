"""Golden end-to-end tests: distributed pipeline ≡ single-threaded oracle."""

import pyarrow as pa
import pytest

from ocr_processor_ray.config import ExtractConfig
from ocr_processor_ray.oracle import oracle_extract_table


def _sorted(table: pa.Table) -> pa.Table:
    return table.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def _assert_turn_equal(got: pa.Table, want: pa.Table):
    assert got.num_rows == want.num_rows
    got = _sorted(got).select(want.column_names)
    want = _sorted(want)
    for col in want.column_names:
        g, w = got[col].to_pylist(), want[col].to_pylist()
        assert g == w, f"column {col!r} mismatch (first diff at " \
            f"{next(i for i,(a,b) in enumerate(zip(g,w)) if a!=b)})"


@pytest.mark.usefixtures("ray_session")
class TestFlagship:
    def test_matches_oracle(self, transcripts_small, transcripts_table):
        from ocr_processor_ray.pipelines.extract_pipeline import run_extract

        got = pa.Table.from_pandas(
            run_extract(transcripts_small, ExtractConfig(batch_size=128)).to_pandas(),
            preserve_index=False,
        )
        want = oracle_extract_table(transcripts_table)
        _assert_turn_equal(got, want)

    def test_force_mode_matches_oracle(self, transcripts_small, transcripts_table):
        from ocr_processor_ray.pipelines.extract_pipeline import run_extract

        got = pa.Table.from_pandas(
            run_extract(transcripts_small, ExtractConfig(mode="force")).to_pandas(),
            preserve_index=False,
        )
        want = oracle_extract_table(transcripts_table, mode="force")
        _assert_turn_equal(got, want)
        assert "skipped" not in set(got["status"].to_pylist())

    def test_partition_count_invariance(self, transcripts_small, transcripts_table):
        """Output is invariant to input block structure (§5.3)."""
        import ray.data as rd

        from ocr_processor_ray.pipelines.extract_pipeline import extract_turns

        ds = rd.read_parquet(transcripts_small).repartition(13)
        got = pa.Table.from_pandas(
            extract_turns(ds, ExtractConfig(batch_size=37)).to_pandas(),
            preserve_index=False,
        )
        want = oracle_extract_table(transcripts_table)
        _assert_turn_equal(got.select(want.column_names), want)

    def test_counters_exact(self, transcripts_small, transcripts_table):
        from ocr_processor_ray.pipelines.extract_pipeline import run_extract
        from ocr_processor_ray.state.counters import fold_counters

        counters = fold_counters(run_extract(transcripts_small))
        want = oracle_extract_table(transcripts_table)
        import collections

        status_counts = collections.Counter(want["status"].to_pylist())
        for status, n in status_counts.items():
            assert counters[status]["turns"] == n
        assert counters["_total"]["turns"] == want.num_rows
        import pyarrow.compute as pc

        assert counters["_total"]["bytes_in"] == pc.sum(want["bytes_in"]).as_py()
        assert counters["_total"]["bytes_out"] == pc.sum(want["bytes_out"]).as_py()


@pytest.mark.usefixtures("ray_session")
class TestSniffStage:
    def test_vectorized_matches_scalar(self, transcripts_table):
        from ocr_processor_ray.extract.sniff import sniff_kind
        from ocr_processor_ray.stages.sniff import sniff_batch

        got = sniff_batch(transcripts_table)["payload_kind"].to_pylist()
        want = [sniff_kind(t) for t in transcripts_table["text"].to_pylist()]
        assert got == want


@pytest.mark.usefixtures("ray_session")
class TestVisualMode:
    def test_visual_matches_oracle(self, transcripts_small, transcripts_table):
        from ocr_processor_ray.config import ExtractConfig
        from ocr_processor_ray.pipelines.extract_pipeline import run_extract

        got = pa.Table.from_pandas(
            run_extract(transcripts_small, ExtractConfig(mode="visual")).to_pandas(),
            preserve_index=False,
        )
        want = oracle_extract_table(transcripts_table, mode="visual")
        _assert_turn_equal(got, want)
        # visual mode actually emits word spans somewhere
        kinds = {
            s["kind"]
            for spans in got["spans"].to_pylist()[:500]
            for s in spans
        }
        assert "word" in kinds
