"""distributed_kmeans: planted-cluster recovery and determinism."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


def _toy(n_per: int = 40, dim: int = 8):
    rng = np.random.RandomState(0)
    a = rng.normal(0, 0.05, (n_per, dim)) + np.eye(dim)[0]
    b = rng.normal(0, 0.05, (n_per, dim)) + np.eye(dim)[1]
    vecs = np.vstack([a, b]).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        }
    )


@pytest.mark.usefixtures("ray_session")
class TestDistributedKmeans:
    def test_planted_clusters_recovered(self):
        from ocr_processor_ray.functions.similarity import distributed_kmeans

        t = _toy()
        cents, assigned = distributed_kmeans(
            rd.from_arrow(t), k=2, iters=4
        )
        df = assigned.to_pandas().sort_values("vec_id")
        first = df["cluster"].to_numpy()[:40]
        second = df["cluster"].to_numpy()[40:]
        assert (first == first[0]).all()
        assert (second == second[0]).all()
        assert first[0] != second[0]
        assert cents.shape == (2, 8)
        # unit centroids
        np.testing.assert_allclose(np.linalg.norm(cents, axis=1), 1.0, rtol=1e-5)

    def test_deterministic_across_block_layouts(self):
        from ocr_processor_ray.functions.similarity import distributed_kmeans

        t = _toy()
        c1, a1 = distributed_kmeans(rd.from_arrow(t), k=2, iters=3)
        c2, a2 = distributed_kmeans(
            rd.from_arrow(t).repartition(7), k=2, iters=3
        )
        np.testing.assert_array_equal(c1, c2)
        d1 = a1.to_pandas().sort_values("vec_id").reset_index(drop=True)
        d2 = a2.to_pandas().sort_values("vec_id").reset_index(drop=True)
        assert (d1["cluster"] == d2["cluster"]).all()
        assert (d1["sim_q"] == d2["sim_q"]).all()


@pytest.mark.usefixtures("ray_session")
class TestDistributedPCA:
    def _ds(self, n=300, dim=8, seed=7):
        import ray.data as rd

        rng = np.random.RandomState(seed)
        # anisotropic cloud: a dominant direction PCA must find
        base = rng.standard_normal((n, dim))
        base[:, 0] *= 5.0
        base[:, 1] *= 2.0
        base += rng.standard_normal(dim)  # nonzero mean
        t = pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(base.tolist(), pa.list_(pa.float32())),
            }
        )
        return rd.from_arrow(t), base.astype(np.float32).astype(np.float64)

    def test_matches_dense_numpy_pca(self):
        from ocr_processor_ray.functions.similarity import distributed_pca

        ds, dense = self._ds()
        comps, evals, mean = distributed_pca(ds, n_components=3)
        mu = dense.mean(axis=0)
        cov = (dense - mu).T @ (dense - mu) / len(dense)
        w, v = np.linalg.eigh(cov)
        order = np.argsort(w)[::-1][:3]
        np.testing.assert_allclose(mean, mu, atol=1e-4)
        np.testing.assert_allclose(evals, w[order], rtol=1e-3)
        for i, j in enumerate(order):
            cos = abs(float(comps[i] @ v[:, j]))
            assert cos > 0.999, (i, cos)

    def test_bit_identical_across_block_layouts(self):
        from ocr_processor_ray.functions.similarity import distributed_pca

        ds, _ = self._ds()
        a = distributed_pca(ds.repartition(1), n_components=2)
        b = distributed_pca(ds.repartition(13), n_components=2)
        assert np.array_equal(a[0], b[0])  # components exactly equal
        assert np.array_equal(a[1], b[1])
        assert np.array_equal(a[2], b[2])

    def test_empty_input_raises(self):
        import ray.data as rd

        from ocr_processor_ray.functions.similarity import distributed_pca

        t = pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
            }
        )
        with pytest.raises(Exception):
            distributed_pca(rd.from_arrow(t), n_components=2)
