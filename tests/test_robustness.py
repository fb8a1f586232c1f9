"""Robustness: wide rows (multi-MB payloads), skewed conversations,
oversize gating — the memory-awareness rows of SURVEY §4.2."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_processor_ray.config import ExtractConfig
from ocr_processor_ray.schema import TRANSCRIPT_SCHEMA


def _wide_table(n_rows: int, payload_mb: float) -> pa.Table:
    line = "R 1 {y} 10 " + "word " * 200
    n_lines = int(payload_mb * 1024 * 1024 / len(line))
    payload = "%PDF-SIM 1.4\n" + "\n".join(
        line.format(y=i * 10) for i in range(n_lines)
    )
    return pa.table(
        {
            "conv_id": pa.array([f"wide-{i:03d}" for i in range(n_rows)], pa.string()),
            "turn_idx": pa.array([0] * n_rows, pa.int32()),
            "role": pa.array(["tool"] * n_rows, pa.string()),
            "text": pa.array([payload] * n_rows, pa.string()),
            "tool": pa.array(["pdf_reader"] * n_rows, pa.string()),
            "ts": pa.array([0] * n_rows, pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )


@pytest.mark.usefixtures("ray_session")
class TestWideRows:
    def test_multi_mb_payloads_small_batches(self, tmp_path):
        """2 MB payloads × small batch_size: blocks stay bounded, no OOM,
        reading order still reconstructed."""
        from ocr_processor_ray.pipelines.extract_pipeline import extract_turns

        import ray.data as rd

        t = _wide_table(n_rows=24, payload_mb=2.0)
        pq.write_table(t, str(tmp_path / "wide.parquet"))
        ds = rd.read_parquet(str(tmp_path / "wide.parquet"))
        out = extract_turns(ds, ExtractConfig(batch_size=4)).to_pandas()
        assert len(out) == 24
        assert (out["status"] == "extracted").all()
        assert (out["bytes_out"] > 1024 * 1024).all()

    def test_oversize_payload_gated_not_fatal(self, tmp_path):
        from ocr_processor_ray.pipelines.extract_pipeline import extract_turns

        import ray.data as rd

        t = _wide_table(n_rows=3, payload_mb=1.0)
        pq.write_table(t, str(tmp_path / "big.parquet"))
        ds = rd.read_parquet(str(tmp_path / "big.parquet"))
        cfg = ExtractConfig(max_payload_bytes=64 * 1024, batch_size=2)
        out = extract_turns(ds, cfg).to_pandas()
        assert (out["status"] == "parse_failure").all()
        assert out["status_detail"].str.startswith("oversize:").all()


@pytest.mark.usefixtures("ray_session")
class TestSkewedConversation:
    def test_checkpointed_run_with_hot_key(self, tmp_path):
        """One conversation holds ~85% of all turns: the checkpointed run
        completes, its partition is correct and turn-ordered, and the
        conversation assembly (salted) equals the oracle."""
        from ocr_processor_ray.oracle import oracle_extract_table
        from ocr_processor_ray.pipelines.conversations import (
            assemble_conversations,
            oracle_assemble,
        )
        from ocr_processor_ray.pipelines.extract_pipeline import run_extract
        from ocr_processor_ray.sources.synth import write_transcripts
        from ocr_processor_ray.state.checkpoint import run_checkpointed
        from ocr_processor_ray.state.manifest import read_output

        corpus = str(tmp_path / "skew")
        write_transcripts(corpus, seed=23, n_convs=12, skew_every=12,
                          skew_turns=2500, rows_per_file=800)
        table = pq.read_table(corpus)

        out_dir = str(tmp_path / "out")
        cfg = ExtractConfig(num_output_partitions=8, salt_turn_threshold=200)
        summary = run_checkpointed(corpus, out_dir, cfg)
        want = oracle_extract_table(table)
        assert summary["counters"]["_total"]["turns"] == want.num_rows

        got = read_output(out_dir).sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        ).select(want.column_names)
        for col in ("conv_id", "turn_idx", "clean_text", "status"):
            assert got[col].to_pylist() == want[col].to_pylist(), col

        # salted assembly on the same skewed corpus
        convs = assemble_conversations(run_extract(corpus, cfg), cfg)
        got_docs = pa.Table.from_pandas(convs.to_pandas(), preserve_index=False).sort_by(
            [("conv_id", "ascending")]
        )
        want_docs = oracle_assemble(want).sort_by([("conv_id", "ascending")])
        assert got_docs["doc"].to_pylist() == want_docs["doc"].to_pylist()
        assert max(got_docs["n_turns"].to_pylist()) > 2000  # the hot key
