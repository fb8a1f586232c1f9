"""Conversation assembly: salted splits ≡ unsalted oracle."""

import pyarrow as pa
import pytest

from ocr_processor_ray.config import ExtractConfig
from ocr_processor_ray.oracle import oracle_extract_table
from ocr_processor_ray.pipelines.conversations import (
    add_salt_key,
    oracle_assemble,
)


def test_add_salt_key_vectorized():
    t = pa.table(
        {
            "conv_id": pa.array(["a", "a", "b"], pa.string()),
            "turn_idx": pa.array([0, 513, 100], pa.int32()),
        }
    )
    keys = add_salt_key(t, 512)["salt_key"].to_pylist()
    assert keys == ["a#000000", "a#000001", "b#000000"]


def test_salt_order_is_lexicographic():
    t = pa.table(
        {
            "conv_id": pa.array(["c"] * 12, pa.string()),
            "turn_idx": pa.array([i * 100 for i in range(12)], pa.int32()),
        }
    )
    keys = add_salt_key(t, 100)["salt_key"].to_pylist()
    assert keys == sorted(keys)


@pytest.mark.usefixtures("ray_session")
class TestAssembly:
    def _run(self, transcripts_small, threshold):
        from ocr_processor_ray.pipelines.conversations import assemble_conversations
        from ocr_processor_ray.pipelines.extract_pipeline import run_extract

        cfg = ExtractConfig(salt_turn_threshold=threshold)
        ds = assemble_conversations(run_extract(transcripts_small, cfg), cfg)
        return pa.Table.from_pandas(ds.to_pandas(), preserve_index=False).sort_by(
            [("conv_id", "ascending")]
        )

    def test_salted_matches_oracle(self, transcripts_small, transcripts_table):
        # threshold 64 forces the fixture's 300-turn conversations to salt
        got = self._run(transcripts_small, threshold=64)
        want = oracle_assemble(oracle_extract_table(transcripts_table)).sort_by(
            [("conv_id", "ascending")]
        )
        assert got.num_rows == want.num_rows
        for col in want.column_names:
            assert got[col].to_pylist() == want[col].to_pylist(), col

    def test_salting_invariance(self, transcripts_small):
        """Doc output must not depend on the salt threshold."""
        a = self._run(transcripts_small, threshold=64)
        b = self._run(transcripts_small, threshold=10_000)
        for col in a.column_names:
            assert a[col].to_pylist() == b[col].to_pylist(), col
