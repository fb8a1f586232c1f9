"""Measured LSH recall vs exact ground truth (r3 verdict item 5).

The minhash/simhash pipelines can't carry SQL oracles (hash-dependent),
and the planted-dup tests pin precision. These tests measure RECALL
against exact brute-force ground truth on a deterministic corpus:

* minhash-LSH: candidate recall over all pairs whose EXACT 3-shingle
  Jaccard ≥ τ must meet the banding formula's expectation
  E[recall] = mean(1 - (1 - s^r)^b) minus a binomial tolerance.
* simhash: the pigeonhole bucketing (4×16-bit quarters, Hamming ≤ 3)
  is EXACT — the pipeline must return precisely the true pair set.
"""

import random

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _corpus(n_bases: int = 30, doc_words: int = 90) -> dict[int, str]:
    """Deterministic corpus: base docs plus mutated copies spanning
    token-replacement rates 2%–35% (Jaccard roughly 0.95 → 0.3)."""
    rng = random.Random(20240817)
    vocab = [f"tok{i}" for i in range(3000)]
    docs: dict[int, str] = {}
    did = 0
    bases = []
    for _ in range(n_bases):
        base = [rng.choice(vocab) for _ in range(doc_words)]
        bases.append(base)
        docs[did] = " ".join(base)
        did += 1
    for base in bases:
        for rate in (0.02, 0.05, 0.1, 0.2, 0.35):
            words = [
                w if rng.random() > rate else rng.choice(vocab) for w in base
            ]
            docs[did] = " ".join(words)
            did += 1
    return docs


@pytest.mark.usefixtures("ray_session")
class TestLshRecall:
    def test_minhash_recall_meets_banding_bound(self):
        import ray.data as rd

        from ocr_processor_ray.functions.dedup import (
            N_BANDS,
            ROWS_PER_BAND,
            minhash_lsh_pairs,
            shingle_hashes,
        )

        docs = _corpus()
        tau = 0.5
        sets = {i: set(shingle_hashes(t).tolist()) for i, t in docs.items()}
        ids = sorted(docs)
        true_pairs: dict[tuple[int, int], float] = {}
        for i in range(len(ids)):
            si = sets[ids[i]]
            for j in range(i + 1, len(ids)):
                sj = sets[ids[j]]
                inter = len(si & sj)
                if not inter:
                    continue
                jac = inter / (len(si) + len(sj) - inter)
                if jac >= tau:
                    true_pairs[(ids[i], ids[j])] = jac
        # the mutation schedule must actually produce qualifying pairs
        assert len(true_pairs) >= 50, len(true_pairs)

        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array([docs[k] for k in ids], pa.string()),
                }
            )
        )
        got = minhash_lsh_pairs(ds, threshold=tau).to_pandas()
        found = {
            (min(a, b), max(a, b)) for a, b in zip(got["id_a"], got["id_b"])
        }
        # precision: the verify stage computes exact Jaccard, so every
        # returned pair must be in the ground truth
        assert found <= set(true_pairs), found - set(true_pairs)

        hit = sum(1 for p in true_pairs if p in found)
        recall = hit / len(true_pairs)
        probs = np.array(
            [
                1.0 - (1.0 - s**ROWS_PER_BAND) ** N_BANDS
                for s in true_pairs.values()
            ]
        )
        expected = probs.mean()
        sigma = float(np.sqrt((probs * (1 - probs)).sum())) / len(true_pairs)
        # the signatures are deterministic, so `recall` is one draw of a
        # sum of independent Bernoullis — allow 3σ below the expectation
        assert recall >= expected - 3 * sigma - 1e-9, (
            f"measured recall {recall:.3f} < banding expectation "
            f"{expected:.3f} - 3σ ({sigma:.3f}) over {len(true_pairs)} pairs"
        )

    def test_embedding_lsh_recall_meets_hyperplane_bound(self):
        """Measured embedding-LSH recall vs exact all-pairs cosine ground
        truth (r4 verdict item 3): for a pair at angle θ the hyperplane
        formula gives hit probability 1-(1-(1-θ/π)^kb)^T with kb the
        effective key width; measured recall must be within 3σ of the
        per-pair-probability expectation. Corpus is sized so no bucket
        overflows — the formula then holds exactly."""
        import ray.data as rd

        from ocr_processor_ray.functions.similarity import (
            _adaptive_key_bits,
            embedding_near_dup_pairs,
        )

        rng = np.random.RandomState(20250818)
        n_bases, dim, tau = 120, 32, 0.9
        base = rng.standard_normal((n_bases, dim)).astype(np.float32)
        # one mutated copy per base spanning cosine ~0.99 → ~0.75
        noise_scale = np.linspace(0.05, 0.45, n_bases)[:, None]
        mut = base + noise_scale * rng.standard_normal((n_bases, dim)).astype(
            np.float32
        )
        vecs = np.vstack([base, mut])
        nm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        sims = nm @ nm.T
        iu, ju = np.triu_indices(len(vecs), k=1)
        qual = sims[iu, ju] >= tau
        true_pairs = {
            (int(a), int(b)): float(s)
            for a, b, s in zip(iu[qual], ju[qual], sims[iu, ju][qual])
        }
        assert len(true_pairs) >= 40, len(true_pairs)

        n_bits, n_tables = 4, 8
        kb = _adaptive_key_bits(len(vecs), n_bits, 125)
        ds = rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(len(vecs)), pa.int64()),
                    "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
                }
            )
        )
        got = embedding_near_dup_pairs(
            ds, threshold=tau, n_bits=n_bits, n_tables=n_tables
        ).to_pandas()
        found = {
            (min(a, b), max(a, b)) for a, b in zip(got["id_a"], got["id_b"])
        }
        # precision: the verify stage computes exact cosine — every
        # returned pair must be ground truth (float-rounding slack only)
        assert found <= set(true_pairs), found - set(true_pairs)

        hit = sum(1 for p in true_pairs if p in found)
        recall = hit / len(true_pairs)
        theta = np.arccos(np.clip(list(true_pairs.values()), -1.0, 1.0))
        probs = 1.0 - (1.0 - (1.0 - theta / np.pi) ** kb) ** n_tables
        expected = probs.mean()
        sigma = float(np.sqrt((probs * (1 - probs)).sum())) / len(true_pairs)
        assert recall >= expected - 3 * sigma - 1e-9, (
            f"measured recall {recall:.3f} < hyperplane expectation "
            f"{expected:.3f} - 3σ ({sigma:.3f}) over {len(true_pairs)} pairs"
        )

    def test_embedding_lsh_splits_hot_buckets_without_losing_pairs(self):
        """Force recursive bucket splitting (tiny max_bucket) on planted
        near-identical pairs: splitting must keep near-dup recall (extra
        sign bits barely separate cos≈0.999 pairs) and never truncate."""
        import ray.data as rd

        from ocr_processor_ray.functions.similarity import embedding_near_dup_pairs

        rng = np.random.RandomState(7)
        n_pairs, dim = 150, 32
        base = rng.standard_normal((n_pairs, dim)).astype(np.float32)
        mate = base + 0.02 * rng.standard_normal((n_pairs, dim)).astype(np.float32)
        vecs = np.empty((2 * n_pairs, dim), np.float32)
        vecs[0::2], vecs[1::2] = base, mate
        ds = rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(len(vecs)), pa.int64()),
                    "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
                }
            )
        )
        got = embedding_near_dup_pairs(ds, threshold=0.99, max_bucket=10).to_pandas()
        found = {(min(a, b), max(a, b)) for a, b in zip(got["id_a"], got["id_b"])}
        planted = {(2 * i, 2 * i + 1) for i in range(n_pairs)}
        recall = len(found & planted) / n_pairs
        # p_bit ≈ 0.99 even across all 32 bits: ≥0.999 theoretical — allow
        # a couple of unlucky pairs
        assert recall >= 0.95, f"recall {recall:.3f} under forced splitting"

    def test_embedding_lsh_identical_cluster_stays_connected(self):
        """A cluster identical in every sign bit can't be split — the
        documented fallback emits a connectivity-preserving star, so all
        members land in one connected component (no O(c²) blowup, no
        silent drop)."""
        import ray.data as rd

        from ocr_processor_ray.functions.graph import connected_components
        from ocr_processor_ray.functions.similarity import embedding_near_dup_pairs

        rng = np.random.RandomState(9)
        dim, c = 16, 50
        v = rng.standard_normal(dim).astype(np.float32)
        vecs = np.tile(v, (c, 1))  # 50 identical vectors
        ds = rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(c), pa.int64()),
                    "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
                }
            )
        )
        pairs = embedding_near_dup_pairs(ds, threshold=0.99, max_bucket=10)
        cc = connected_components(pairs).to_pandas()
        assert set(cc["node"]) == set(range(c))
        assert cc["component"].nunique() == 1

    def test_ngram_jaccard_lsh_equals_exact_at_sf001(self):
        """r4 verdict item 6: the oracled `ngram_jaccard_pairs` claim —
        at 16×4 banding with integer (inter, un) emission, the LSH
        pipeline's τ=0.35 pair set EQUALS `docs_exact_jaccard_pairs`'s
        exact inverted-index result on the sf0.01 corpus (the driver's
        correctness scale), value-for-value."""
        from ocr_processor_ray.queries_catalog import QUERIES

        sf = "/root/testdata/sf0.01"
        lsh = QUERIES["ngram_jaccard_pairs"](sf).to_pandas()
        exact = QUERIES["docs_exact_jaccard_pairs"](sf).to_pandas()
        key = ["id_a", "id_b"]
        lsh = lsh.sort_values(key).reset_index(drop=True)[
            ["id_a", "id_b", "inter", "un"]
        ]
        exact = exact.sort_values(key).reset_index(drop=True)[
            ["id_a", "id_b", "inter", "un"]
        ]
        pd.testing.assert_frame_equal(lsh, exact, check_dtype=False)

    def test_minhash_pairs_lsh_equals_exact_at_sf001(self):
        """r5: the oracled `minhash_pairs` claim — at 32×2 banding the
        τ=0.5 LSH pair set equals the exact inverted-index result on
        the sf0.01 corpus, value-for-value (per-pair miss probability
        ≤1e-14 at the corpus's j≥0.8 pairs)."""
        import duckdb

        from ocr_processor_ray.queries_catalog import ORACLE_SQL, QUERIES

        sf = "/root/testdata/sf0.01"
        lsh = (
            QUERIES["minhash_pairs"](sf)
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
        want = (
            con.sql(ORACLE_SQL["minhash_pairs"])
            .df()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            lsh[["id_a", "id_b", "inter", "un"]],
            want[["id_a", "id_b", "inter", "un"]],
            check_dtype=False,
        )

    def test_counts_emission_matches_integer_filter(self):
        """`emit="counts"` must apply the same all-integer τ filter as
        the oracle SQL (100·inter ≥ pct·un) and agree pairwise with the
        float path's survivors on a synthetic corpus with pairs on both
        sides of the threshold."""
        import ray.data as rd

        from ocr_processor_ray.functions.dedup import minhash_lsh_pairs

        docs = _corpus(n_bases=15, doc_words=60)
        ids = sorted(docs)
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array([docs[k] for k in ids], pa.string()),
                }
            )
        )
        tau = 0.35
        cnt = minhash_lsh_pairs(
            ds, threshold=tau, n_bands=16, emit="counts"
        ).to_pandas()
        # schema + filter invariants
        assert list(cnt.columns) == ["id_a", "id_b", "inter", "un"]
        assert (cnt["inter"] * 100 >= cnt["un"] * 35).all()
        flo = minhash_lsh_pairs(ds, threshold=tau, n_bands=16).to_pandas()
        # identical banding ⇒ identical candidate sets; the two emissions
        # must keep exactly the same pairs (round(·,6) never crosses the
        # τ boundary for these set sizes) and consistent values
        a = {(x, y): (i, u) for x, y, i, u in
             zip(cnt["id_a"], cnt["id_b"], cnt["inter"], cnt["un"])}
        b = {(x, y): j for x, y, j in
             zip(flo["id_a"], flo["id_b"], flo["jaccard"])}
        assert set(a) == set(b)
        for p, (i, u) in a.items():
            assert abs(i / u - b[p]) < 1e-5

    def test_simhash_pigeonhole_recall_is_exact(self):
        import ray.data as rd

        from ocr_processor_ray.functions.dedup import (
            batch_simhash64,
            simhash_pairs,
        )

        docs = _corpus(n_bases=20, doc_words=60)
        ids = sorted(docs)
        sh = batch_simhash64([docs[k] for k in ids])
        u = sh.astype(np.uint64) ^ np.uint64(1 << 63)
        max_h = 3
        true_pairs = set()
        for i in range(len(ids)):
            x = u[i] ^ u[i + 1 :]
            d = np.array([bin(int(v)).count("1") for v in x])
            for off in np.nonzero(d <= max_h)[0]:
                true_pairs.add((ids[i], ids[i + 1 + int(off)]))
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array([docs[k] for k in ids], pa.string()),
                }
            )
        )
        got = simhash_pairs(ds, max_hamming=max_h).to_pandas()
        found = {
            (min(a, b), max(a, b)) for a, b in zip(got["id_a"], got["id_b"])
        }
        # pigeonhole bucketing is exact: recall AND precision must be 1.0
        assert found == true_pairs, (
            f"missed={true_pairs - found} extra={found - true_pairs}"
        )
