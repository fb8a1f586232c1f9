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

    def test_scattered_turns_match_oracle(self, transcripts_table, tmp_path):
        """Globally shuffle the turn rows across files so conversations
        are non-contiguous within every block — the run combiner must
        degrade to fine-grained runs and still reproduce the oracle."""
        import numpy as np
        import pyarrow.parquet as pq

        rng = np.random.default_rng(7)
        perm = rng.permutation(transcripts_table.num_rows)
        shuffled = transcripts_table.take(pa.array(perm))
        d = tmp_path / "scattered"
        d.mkdir()
        step = max(1, shuffled.num_rows // 7)
        for i, lo in enumerate(range(0, shuffled.num_rows, step)):
            pq.write_table(
                shuffled.slice(lo, step), str(d / f"part{i:02d}.parquet")
            )

        got = self._run(str(d), threshold=64)
        want = oracle_assemble(oracle_extract_table(transcripts_table)).sort_by(
            [("conv_id", "ascending")]
        )
        assert got.num_rows == want.num_rows
        for col in want.column_names:
            assert got[col].to_pylist() == want[col].to_pylist(), col

    def test_merge_fallback_matches_broadcast_path(
        self, transcripts_small, monkeypatch
    ):
        """Gate=0 forces the full bucketed merge shuffle (the unbounded
        multi-split fallback); output must equal the candidate-restricted
        broadcast path's."""
        from ocr_processor_ray.pipelines import conversations as conv_mod

        a = self._run(transcripts_small, threshold=64)  # broadcast path
        monkeypatch.setattr(conv_mod, "_MULTI_SPLIT_ID_GATE", 0)
        b = self._run(transcripts_small, threshold=64)  # fallback path
        for col in a.column_names:
            assert a[col].to_pylist() == b[col].to_pylist(), col


@pytest.mark.usefixtures("ray_session")
class TestConversationNearDedup:
    def test_planted_cross_conversation_duplicate_is_dropped(self, tmp_path):
        """Clone one conversation under a new (higher) id, minus its last
        turn → a NEAR duplicate of the original. The pipeline must drop
        the clone, keep the original, and pass every other conversation
        through untouched."""
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from ocr_processor_ray.pipelines.conversations import near_dedup_conversations
        from ocr_processor_ray.sources.synth import make_transcripts

        t = make_transcripts(seed=23, n_convs=10, skew_every=0)
        # pick the longest conversation so dropping one turn stays >τ
        counts = t.group_by("conv_id").aggregate([("conv_id", "count")])
        src = counts.sort_by([("conv_id_count", "descending")])["conv_id"][0].as_py()
        orig = t.filter(pc.equal(t["conv_id"], src))
        clone = orig.slice(0, orig.num_rows - 1).set_column(
            orig.schema.get_field_index("conv_id"),
            "conv_id",
            pa.array(["conv-900001"] * (orig.num_rows - 1), pa.string()),
        )
        corpus = tmp_path / "planted"
        corpus.mkdir()
        pq.write_table(pa.concat_tables([t, clone]), str(corpus / "t.parquet"))

        kept = near_dedup_conversations([str(corpus / "t.parquet")])
        kept_ids = set(kept.to_pandas()["conv_id"])
        assert "conv-900001" not in kept_ids, "planted near-duplicate survived"
        assert src in kept_ids, "original (minimum id) must be the survivor"
        expected = set(pc.unique(t["conv_id"]).to_pylist())
        assert kept_ids == expected

    def test_deterministic(self, transcripts_small):
        import os

        from ocr_processor_ray.pipelines.conversations import near_dedup_conversations

        paths = [
            os.path.join(transcripts_small, f)
            for f in sorted(os.listdir(transcripts_small))
            if f.endswith(".parquet")
        ]
        a = near_dedup_conversations(paths).to_pandas().sort_values(
            "conv_id", ignore_index=True
        )
        b = near_dedup_conversations(paths).to_pandas().sort_values(
            "conv_id", ignore_index=True
        )
        assert a.equals(b)
        assert len(a) > 0
