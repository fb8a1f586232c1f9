"""EmbedImage feature-extraction stage and the embed→SemDeDup chain."""

import pytest
@pytest.mark.usefixtures("ray_session")
class TestEmbedImage:
    def test_deterministic_unit_embeddings(self):
        import numpy as np
        import ray.data as rd

        from ocr_processor_ray.functions.multimodal import (
            embed_images,
            synth_media_table,
        )

        t = synth_media_table(n=16, seed=5)
        out = embed_images(rd.from_arrow(t)).to_pandas().set_index("media_id")
        m = np.stack(out["emb"].to_numpy())
        assert m.shape == (16, 64)
        assert np.allclose(np.linalg.norm(m, axis=1), 1.0, atol=1e-5)
        # identical payloads embed identically (run twice)
        out2 = embed_images(rd.from_arrow(t)).to_pandas().set_index("media_id")
        m2 = np.stack(out2["emb"].to_numpy())
        assert np.array_equal(m, m2)

    def test_real_codec_required_raises_when_absent(self):
        from ocr_processor_ray.functions.multimodal import EmbedImage, _try_pil

        if _try_pil() is not None:
            pytest.skip("PIL present: real path available")
        with pytest.raises(NotImplementedError, match="PIL"):
            EmbedImage(fake=False)

    def test_embed_dedup_chain_drops_planted_duplicates(self):
        from ocr_processor_ray.queries_catalog import QUERIES

        out = QUERIES["media_embed_dedup"]("/root/testdata/sf0.001").to_pandas()
        kept = set(out["media_id"])
        # byte-identical payload copies planted at ids 96-99 must lose to
        # their low-id originals (0-3), which must survive
        assert {0, 1, 2, 3} <= kept
        assert kept.isdisjoint({96, 97, 98, 99})
        assert len(kept) == 96
