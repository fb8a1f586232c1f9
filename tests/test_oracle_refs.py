"""Unit tests for the single-threaded reference kernels (oracle_refs.py)
that back the r5 driver-visible oracles. The oracle sweep proves the
distributed pipelines EQUAL these references; these tests prove the
references themselves are not vacuous — known vectors, hand-checkable
invariants, and planted contracts on tiny inputs, no Ray involved."""

import numpy as np
import pyarrow as pa

from ocr_processor_ray import oracle_refs as refs


def _docs(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


class TestFnv1a:
    def test_known_vectors(self):
        # published FNV-1a 64 test vectors (offset basis; "a"; "foobar")
        assert refs._ref_fnv1a(b"") == 0xCBF29CE484222325
        assert refs._ref_fnv1a(b"a") == 0xAF63DC4C8601EC8C
        assert refs._ref_fnv1a(b"foobar") == 0x85944171F73967E8

    def test_fingerprint_is_min_over_windows(self):
        text = "abcdefghijklmnop"  # 16 bytes, window 8, stride 4 → 3 windows
        data = text.encode()
        want = min(
            refs._ref_fnv1a(data[i : i + 8]) for i in (0, 4, 8)
        ) - (1 << 63)
        tbl = refs.ref_doc_fingerprint(_docs([text]))
        assert tbl["fp"].to_pylist() == [want]

    def test_short_text_hashes_whole(self):
        tbl = refs.ref_doc_fingerprint(_docs(["hi"]))
        assert tbl["fp"].to_pylist() == [refs._ref_fnv1a(b"hi") - (1 << 63)]


class TestCompressionRatio:
    def test_repetitive_compresses_below_random(self):
        rng = np.random.default_rng(3)
        noisy = "".join(chr(33 + int(c)) for c in rng.integers(0, 90, 2000))
        tbl = refs.ref_doc_compression_ratio(_docs(["a" * 2000, noisy]))
        rep, rnd = tbl["compress_per_10k"].to_pylist()
        assert rep < 200  # 2000×'a' collapses
        assert rnd > rep * 5

    def test_empty_text_is_finite(self):
        tbl = refs.ref_doc_compression_ratio(_docs([""]))
        assert tbl["compress_per_10k"].to_pylist()[0] >= 0


class TestSimhashPairsRef:
    def test_identical_texts_pair_at_zero(self):
        tbl = refs.ref_simhash_pairs(
            _docs(["the same text body here"] * 2 + ["completely unrelated words"])
        )
        pairs = list(
            zip(tbl["id_a"].to_pylist(), tbl["id_b"].to_pylist(),
                tbl["hamming"].to_pylist())
        )
        assert (0, 1, 0) in pairs
        assert all({a, b} == {0, 1} for a, b, _ in pairs)

    def test_symmetric_canonical_order(self):
        tbl = refs.ref_simhash_pairs(_docs(["dup text one two"] * 2, ids=[9, 3]))
        assert tbl["id_a"].to_pylist() == [3]
        assert tbl["id_b"].to_pylist() == [9]


class TestPackSequencesRef:
    def test_invariants(self):
        texts = [" ".join(["tok"] * n) for n in (5, 60, 60, 100, 128, 1, 30)]
        tbl = refs.ref_pack_sequences(_docs(texts), capacity=128, num_buckets=4)
        # every doc exactly once
        assert sorted(tbl["doc_id"].to_pylist()) == list(range(len(texts)))
        # no pack overflows capacity (oversize singletons get their own bin)
        import collections

        per_pack = collections.Counter()
        for n, p in zip(tbl["n_tokens"].to_pylist(), tbl["pack_id"].to_pylist()):
            per_pack[p] += n
        for p, total in per_pack.items():
            members = [
                n
                for n, pid in zip(
                    tbl["n_tokens"].to_pylist(), tbl["pack_id"].to_pylist()
                )
                if pid == p
            ]
            assert total <= 128 or len(members) == 1


class TestHllRef:
    def test_estimate_within_5pct(self):
        regs = refs._ref_hll_registers([f"user-{i}" for i in range(5000)])
        est = refs._ref_hll_estimate(regs)
        assert abs(est - 5000) / 5000 < 0.05

    def test_register_max_merge_is_order_free(self):
        a = refs._ref_hll_registers([f"u{i}" for i in range(100)])
        b = refs._ref_hll_registers([f"u{i}" for i in range(50, 150)])
        merged = np.maximum(a, b)
        whole = refs._ref_hll_registers([f"u{i}" for i in range(150)])
        assert np.array_equal(merged, whole)


class TestKmeansRef:
    def _emb(self, n=40, dim=8, seed=0):
        rng = np.random.default_rng(seed)
        vecs = rng.normal(size=(n, dim)).astype(np.float32)
        return pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [v for v in vecs.tolist()], pa.list_(pa.float32())
                ),
            }
        )

    def test_cluster_sizes_partition_input(self):
        tbl = refs.ref_embedding_kmeans(self._emb(), k=4, iters=2)
        assert sum(tbl["n_points"].to_pylist()) == 40
        assert all(-1.0 <= s <= 1.0 + 1e-9 for s in tbl["mean_sim"].to_pylist())

    def test_semantic_dedup_drops_planted_duplicate(self):
        emb = self._emb(n=20, seed=1)
        vecs = emb["embedding"].to_pylist()
        dup = pa.table(
            {
                "vec_id": pa.array([99], pa.int64()),
                "embedding": pa.array([vecs[0]], pa.list_(pa.float32())),
            }
        )
        kept = refs.ref_semantic_dedup(
            pa.concat_tables([emb, dup]), k=2, threshold=0.95, kmeans_iters=2
        )
        ids = kept["vec_id"].to_pylist()
        assert 0 in ids and 99 not in ids


class TestAnnRefs:
    def _emb(self, n=200, dim=16, seed=7, plant_dup=True):
        rng = np.random.default_rng(seed)
        vecs = rng.normal(size=(n, dim)).astype(np.float32)
        ids = list(range(n))
        if plant_dup:
            # near-copy of vec 0 planted at the highest id
            vecs = np.vstack([vecs, vecs[0] + 1e-3])
            ids.append(n)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
            }
        )

    def test_lsh_ref_finds_self_and_planted_dup(self):
        emb = self._emb()
        out = refs.ref_ann_topk_lsh(emb, k=10)
        got = out["vec_id"].to_pylist()
        assert got[0] == 0  # the query vector itself, sim 1.0
        assert 200 in got[:2]  # near-copy shares every bucket

    def test_ivf_ref_finds_self_and_planted_dup(self):
        emb = self._emb()
        out = refs.ref_ann_topk_ivf(emb, k=10, n_cells=4, n_probe=2)
        got = out["vec_id"].to_pylist()
        assert got[0] == 0
        assert 200 in got[:2]

    def test_near_dup_ref_recovers_planted_pair(self):
        emb = self._emb()
        out = refs.ref_embedding_near_dup(emb, threshold=0.99)
        pairs = list(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist()))
        assert (0, 200) in pairs
        cos = out["cos_sim"].to_pylist()[pairs.index((0, 200))]
        assert cos > 0.999

    def test_pca_ref_matches_dense_numpy(self):
        emb = self._emb(plant_dup=False)
        out = refs.ref_embedding_pca(emb, n_components=2)
        m = np.array(
            [v for v in emb["embedding"].to_pylist()], dtype=np.float64
        )
        centered = m - m.mean(axis=0)
        _, _, vt = np.linalg.svd(centered, full_matrices=False)
        got = np.column_stack(
            [out["pc1"].to_numpy(), out["pc2"].to_numpy()]
        )
        for i in range(2):  # eigenvector sign is arbitrary in the SVD
            dense = centered @ vt[i]
            assert (
                np.abs(got[:, i] - dense).max() < 1e-3
                or np.abs(got[:, i] + dense).max() < 1e-3
            )


class TestMediaRefs:
    def _media(self, n=8, seed=5):
        from ocr_processor_ray.functions.multimodal import synth_media_table

        return synth_media_table(n=n, seed=seed)

    def test_decode_dims_in_stub_range(self):
        out = refs.ref_media_decode(self._media())
        assert all(64 <= w < 256 for w in out["dec_width"].to_pylist())
        assert all(64 <= h < 256 for h in out["dec_height"].to_pylist())
        assert "payload" not in out.column_names

    def test_resize_rows_and_reduction(self):
        out = refs.ref_media_resize(self._media(), target=(224, 224))
        assert set(out["rs_width"].to_pylist()) == {224}
        assert all(len(m) == 32 for m in out["payload_md5"].to_pylist())

    def test_frame_sample_explodes_n_frames(self):
        out = refs.ref_media_frame_sample(self._media(n=4), n_frames=4)
        assert out.num_rows == 16
        assert sorted(set(out["frame_idx"].to_pylist())) == [0, 1, 2, 3]

    def test_embed_dedup_drops_planted_payload_dup(self):
        base = self._media(n=12, seed=5)
        dup = base.slice(0, 2).set_column(
            base.schema.get_field_index("media_id"),
            "media_id",
            pa.array([12, 13], pa.int64()),
        )
        kept = refs.ref_media_embed_dedup(
            pa.concat_tables([base, dup]), k=2, threshold=0.999
        )
        ids = kept["media_id"].to_pylist()
        assert 12 not in ids and 13 not in ids
        assert 0 in ids and 1 in ids
