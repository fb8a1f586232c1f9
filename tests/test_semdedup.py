"""SemDeDup (semantic_dedup) contract tests: planted near-duplicates
collapse to the lowest id, distant vectors survive, the result is
layout-independent, and oversized clusters fail loudly."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ocr_processor_ray.functions.similarity import semantic_dedup


def _table(ids, vecs):
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs]),
        }
    )


@pytest.mark.usefixtures("ray_session")
class TestSemanticDedup:
    def test_planted_near_duplicates_keep_lowest_id(self):
        rng = np.random.RandomState(5)
        base = rng.randn(40, 16)
        ids = list(range(100, 140))
        vecs = [v for v in base]
        # plant: 131 and 137 are near-copies of 105 (tiny perturbation)
        vecs[31] = base[5] + 1e-4 * rng.randn(16)
        vecs[37] = base[5] + 1e-4 * rng.randn(16)
        out = (
            semantic_dedup(rd.from_arrow(_table(ids, vecs)), k=4, threshold=0.95)
            .to_pandas()
            .sort_values("vec_id", ignore_index=True)
        )
        kept = set(out["vec_id"])
        assert 105 in kept and 131 not in kept and 137 not in kept
        # random gaussian directions are near-orthogonal — nothing else drops
        assert len(kept) == 38

    def test_layout_independent(self):
        rng = np.random.RandomState(11)
        base = rng.randn(60, 8)
        base[45] = base[12] * 2.0  # same direction → cosine 1.0
        ids = list(range(60))
        t = _table(ids, list(base))
        outs = [
            semantic_dedup(
                rd.from_arrow(t).repartition(p), k=3, threshold=0.95
            )
            .to_pandas()
            .sort_values("vec_id", ignore_index=True)
            for p in (1, 4, 7)
        ]
        assert outs[0].equals(outs[1]) and outs[1].equals(outs[2])
        assert 12 in set(outs[0]["vec_id"]) and 45 not in set(outs[0]["vec_id"])

    def test_oversized_cluster_raises(self):
        rng = np.random.RandomState(3)
        t = _table(list(range(30)), list(rng.randn(30, 4)))
        with pytest.raises(Exception, match="max_cluster"):
            semantic_dedup(
                rd.from_arrow(t), k=1, threshold=0.99, max_cluster=10
            ).to_pandas()

    def test_empty_block_in_input(self):
        # a 0-row block must not poison the union schema (typed _vec)
        rng = np.random.RandomState(2)
        t = _table(list(range(10)), list(rng.randn(10, 4)))
        ds = rd.from_arrow([t, t.slice(0, 0)])
        out = semantic_dedup(ds, k=2, threshold=0.99).to_pandas()
        assert len(out) == 10
