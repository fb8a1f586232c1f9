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
