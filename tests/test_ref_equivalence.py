"""Distributed ≡ sequential-reference equivalence on ADVERSARIAL inputs.

The oracle sweep proves equality on the sf corpora; these tests force
the code paths those corpora never hit — identical-sign clusters that
exhaust all 32 sign bits (rotating-star emission), buckets that
overflow and subdivide recursively, and multi-block layouts — and
assert the distributed pipelines still produce exactly what the
single-threaded references (oracle_refs.py) specify."""

import numpy as np
import pyarrow as pa
import pytest

from ocr_processor_ray import oracle_refs as refs


def _emb_table(vecs: np.ndarray, ids=None) -> pa.Table:
    ids = ids if ids is not None else list(range(len(vecs)))
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                vecs.astype(np.float32).tolist(), pa.list_(pa.float32())
            ),
        }
    )


def _ds(tbl: pa.Table, blocks: int):
    import ray.data as rd

    return rd.from_arrow(tbl).repartition(blocks)


def _pairs_set(t: pa.Table):
    return set(
        zip(
            t["id_a"].to_pylist(),
            t["id_b"].to_pylist(),
            t["cos_sim"].to_pylist(),
        )
    )


@pytest.mark.usefixtures("ray_session")
class TestNearDupEquivalence:
    def test_isotropic_with_planted_dups(self):
        from ocr_processor_ray.functions.similarity import embedding_near_dup_pairs

        rng = np.random.default_rng(11)
        vecs = rng.normal(size=(120, 16))
        vecs[100] = vecs[3] + 1e-3  # planted near-dups
        vecs[101] = vecs[7] + 1e-3
        tbl = _emb_table(vecs)
        want = refs.ref_embedding_near_dup(tbl, threshold=0.9)
        for blocks in (1, 7):
            got = (
                embedding_near_dup_pairs(_ds(tbl, blocks), threshold=0.9)
                .to_arrow_refs()
            )
            import ray

            got = pa.concat_tables(ray.get(got))
            assert _pairs_set(got) == _pairs_set(want), f"blocks={blocks}"

    def test_identical_sign_cluster_takes_star_path(self):
        """20 copies of one vector with max_bucket=8: subdivision cannot
        split identical sign keys, so BOTH sides must emit the rotating
        star — id sets and cosines must agree exactly."""
        import ray

        from ocr_processor_ray.functions.similarity import embedding_near_dup_pairs

        rng = np.random.default_rng(5)
        base = rng.normal(size=16)
        vecs = np.vstack([base] * 20 + [rng.normal(size=(30, 16))])
        tbl = _emb_table(vecs)
        want = refs.ref_embedding_near_dup(tbl, threshold=0.99, max_bucket=8)
        assert want.num_rows > 0  # the star must fire for the clones
        got = pa.concat_tables(
            ray.get(
                embedding_near_dup_pairs(
                    _ds(tbl, 5), threshold=0.99, max_bucket=8
                ).to_arrow_refs()
            )
        )
        assert _pairs_set(got) == _pairs_set(want)

    def test_hot_cluster_forces_subdivision(self):
        """60 noisy copies of one direction with max_bucket=8: the shared
        bucket overflows and subdivides on further sign bits — the
        surviving candidate set (and thus the verified pair set) must be
        identical between the distributed and sequential paths."""
        import ray

        from ocr_processor_ray.functions.similarity import embedding_near_dup_pairs

        rng = np.random.default_rng(9)
        base = rng.normal(size=16)
        vecs = base[None, :] + rng.normal(size=(60, 16)) * 0.05
        tbl = _emb_table(vecs)
        want = refs.ref_embedding_near_dup(tbl, threshold=0.995, max_bucket=8)
        got = pa.concat_tables(
            ray.get(
                embedding_near_dup_pairs(
                    _ds(tbl, 6), threshold=0.995, max_bucket=8
                ).to_arrow_refs()
            )
        )
        assert _pairs_set(got) == _pairs_set(want)


@pytest.mark.usefixtures("ray_session")
class TestTopkEquivalence:
    def _tbl(self, seed=3, n=150, dim=16):
        rng = np.random.default_rng(seed)
        vecs = rng.normal(size=(n, dim))
        # vec 0 is the query; plant an exact twin so ties exist
        vecs[n - 1] = vecs[0]
        return _emb_table(vecs)

    def test_lsh_topk_matches_ref_across_layouts(self):
        from ocr_processor_ray.functions.similarity import lsh_topk

        tbl = self._tbl()
        q = np.asarray(tbl["embedding"][0].as_py(), dtype=np.float32)
        want = refs.ref_ann_topk_lsh(tbl, k=10)
        for blocks in (1, 8):
            t = lsh_topk(_ds(tbl, blocks), q, k=10, round_to=4)
            assert t["vec_id"].to_pylist() == want["vec_id"].to_pylist(), (
                f"blocks={blocks}"
            )

    def test_ivf_topk_matches_ref_across_layouts(self):
        from ocr_processor_ray.functions.similarity import ivf_topk

        tbl = self._tbl(seed=4)
        q = np.asarray(tbl["embedding"][0].as_py(), dtype=np.float32)
        want = refs.ref_ann_topk_ivf(tbl, k=10, n_cells=4, n_probe=2)
        for blocks in (1, 8):
            t = ivf_topk(
                _ds(tbl, blocks), q, k=10, n_cells=4, n_probe=2
            )
            assert t["vec_id"].to_pylist() == want["vec_id"].to_pylist(), (
                f"blocks={blocks}"
            )
