"""Planted-case tests for the round-3 corpus operators: quality-ranked
exact dedup, corpus-level line dedup, and benchmark decontamination."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


@pytest.mark.usefixtures("ray_session")
class TestKeepBest:
    def test_survivor_is_max_score_min_id(self):
        from ocr_processor_ray.functions.dedup import exact_dedup_keep_best

        rows = {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": ["dup", "dup", "dup", "uniq", "tie", "tie"],
            "n_chars": [10, 30, 30, 5, 7, 7],
        }
        out = (
            exact_dedup_keep_best(rd.from_arrow(pa.table(rows)))
            .to_pandas()
            .set_index("doc_id")
        )
        # 'dup': max n_chars=30 shared by ids 2,3 → min id 2 survives
        assert set(out.index) == {2, 4, 5}
        assert out.loc[2, "n"] == 3 and out.loc[2, "n_chars"] == 30
        assert out.loc[4, "n"] == 1
        assert out.loc[5, "n"] == 2  # tie → min id

    def test_range_violation_raises(self):
        from ocr_processor_ray.functions.dedup import exact_dedup_keep_best

        bad = pa.table(
            {"doc_id": [1 << 42], "text": ["x"], "n_chars": [1]}
        )
        with pytest.raises(Exception, match="packed-key range"):
            exact_dedup_keep_best(rd.from_arrow(bad)).to_pandas()

    def test_packed_key_roundtrip_extremes(self):
        from ocr_processor_ray.functions.dedup import exact_dedup_keep_best

        rows = {
            "doc_id": [0, (1 << 41) - 1],
            "text": ["a", "b"],
            "n_chars": [0, (1 << 22) - 1],
        }
        out = (
            exact_dedup_keep_best(rd.from_arrow(pa.table(rows)))
            .to_pandas()
            .set_index("doc_id")
        )
        assert out.loc[0, "n_chars"] == 0
        assert out.loc[(1 << 41) - 1, "n_chars"] == (1 << 22) - 1


@pytest.mark.usefixtures("ray_session")
class TestDedupLines:
    def test_planted_boilerplate_first_occurrence_survives(self):
        from ocr_processor_ray.functions.dedup import dedup_lines

        boiler = "COPYRIGHT FOOTER 2026"
        docs = {
            "doc_id": [10, 20, 30],
            "text": [
                f"alpha\n{boiler}\nbeta",
                f"{boiler}\ngamma\ngamma",
                "delta\nunique line",
            ],
        }
        out = (
            dedup_lines(rd.from_arrow(pa.table(docs)))
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        # first occurrence of the boilerplate is in doc 10 (min doc, pos)
        assert out.loc[10, "text"] == f"alpha\n{boiler}\nbeta"
        assert out.loc[10, "n_dropped"] == 0
        # doc 20 loses the boilerplate AND its own repeated 'gamma' line
        assert out.loc[20, "text"] == "gamma"
        assert out.loc[20, "n_dropped"] == 2
        assert out.loc[30, "text"] == "delta\nunique line"
        assert int(out["n_lines"].sum()) == 8

    def test_within_doc_repeat_keeps_first(self):
        from ocr_processor_ray.functions.dedup import dedup_lines

        docs = {"doc_id": [1], "text": ["x\ny\nx\nx"]}
        out = dedup_lines(rd.from_arrow(pa.table(docs))).to_pandas()
        assert out.loc[0, "text"] == "x\ny"
        assert out.loc[0, "n_dropped"] == 2

    def test_custom_separator(self):
        from ocr_processor_ray.functions.dedup import dedup_lines

        docs = {"doc_id": [1, 2], "text": ["a||b", "b||c"]}
        out = (
            dedup_lines(rd.from_arrow(pa.table(docs)), sep="||")
            .to_pandas()
            .set_index("doc_id")
        )
        assert out.loc[1, "text"] == "a||b"
        assert out.loc[2, "text"] == "c"


@pytest.mark.usefixtures("ray_session")
class TestDecontaminate:
    def test_flags_only_real_containment(self):
        from ocr_processor_ray.functions.text import flag_contaminated

        docs = {
            "doc_id": [1, 2, 3],
            "text": [
                "the quick brown fox jumps",
                "an unrelated document body",
                "prefix the quick brown suffix",
            ],
        }
        out = (
            flag_contaminated(rd.from_arrow(pa.table(docs)), ["the quick brown"])
            .to_pandas()
            .set_index("doc_id")
        )
        assert bool(out.loc[1, "contaminated"])
        assert not bool(out.loc[2, "contaminated"])
        assert bool(out.loc[3, "contaminated"])

    def test_empty_snippet_rejected(self):
        from ocr_processor_ray.functions.text import flag_contaminated

        with pytest.raises(ValueError, match="empty snippet"):
            flag_contaminated(
                rd.from_arrow(pa.table({"doc_id": [1], "text": ["x"]})), [""]
            )

    def test_no_snippets_flags_nothing(self):
        from ocr_processor_ray.functions.text import flag_contaminated

        out = flag_contaminated(
            rd.from_arrow(pa.table({"doc_id": [1], "text": ["x"]})), []
        ).to_pandas()
        assert not out["contaminated"].any()


@pytest.mark.usefixtures("ray_session")
class TestDedupLinesFuzz:
    def test_random_corpora_match_brute_force(self):
        """Property: dedup_lines ≡ a driver-side dict walk (first
        (doc, pos) occurrence survives) on random corpora with heavy
        line reuse and varying block layouts."""
        import random

        from ocr_processor_ray.functions.dedup import dedup_lines

        rng = random.Random(77)
        vocab = [f"line {i}" for i in range(12)]  # small → many repeats
        for trial in range(4):
            ids = list(range(1, 1 + rng.randint(3, 9)))
            docs = {
                d: "\n".join(
                    rng.choice(vocab) for _ in range(rng.randint(1, 8))
                )
                for d in ids
            }
            # brute force: first occurrence in (doc_id, pos) order wins
            seen = set()
            want = {}
            for d in sorted(docs):
                kept = []
                for line in docs[d].split("\n"):
                    if line not in seen:
                        seen.add(line)
                        kept.append(line)
                want[d] = "\n".join(kept)
            t = pa.table(
                {
                    "doc_id": pa.array(sorted(docs), pa.int64()),
                    "text": pa.array([docs[d] for d in sorted(docs)]),
                }
            )
            out = (
                dedup_lines(rd.from_arrow(t).repartition(1 + trial))
                .to_pandas()
                .set_index("doc_id")
            )
            for d in sorted(docs):
                assert out.loc[d, "text"] == want[d], (trial, d, docs)
                n_dropped = len(docs[d].split("\n")) - (
                    len(want[d].split("\n")) if want[d] else 0
                )
                assert out.loc[d, "n_dropped"] == n_dropped


@pytest.mark.usefixtures("ray_session")
class TestIncrementalDedup:
    def test_cross_increment_dedup_and_idempotent_retry(self, tmp_path):
        from ocr_processor_ray.state.incremental import incremental_exact_dedup

        store = str(tmp_path / "dedup_store")
        inc1 = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": ["alpha", "beta", "alpha", "gamma"],
            }
        )
        s1 = incremental_exact_dedup(store, rd.from_arrow(inc1), "day1").to_pandas()
        # first occurrence per hash within the increment
        assert sorted(s1["doc_id"]) == [1, 2, 4]

        inc2 = pa.table(
            {
                "doc_id": pa.array([10, 11, 12], pa.int64()),
                "text": ["beta", "delta", "delta"],
            }
        )
        s2 = incremental_exact_dedup(store, rd.from_arrow(inc2), "day2").to_pandas()
        # 'beta' already in the corpus via day1 → only the new 'delta' survives
        assert sorted(s2["doc_id"]) == [11]

        # replaying an applied increment returns the SAME survivors
        s2r = incremental_exact_dedup(store, rd.from_arrow(inc2), "day2").to_pandas()
        assert sorted(s2r["doc_id"]) == [11]
        s1r = incremental_exact_dedup(store, rd.from_arrow(inc1), "day1").to_pandas()
        assert sorted(s1r["doc_id"]) == [1, 2, 4]

        # survivors keep the original columns, not the internal hash
        assert sorted(s2.columns) == ["doc_id", "text"]


class TestPairVerifyMissingId:
    def test_broadcast_verify_raises_on_id_missing_from_docs(self, ray_session):
        """A candidate id absent from docs must fail LOUDLY (KeyError via
        the sorted-lookup found-check), never attach a neighboring row's
        payload and verify against unrelated content."""
        import pyarrow as pa
        import pytest
        import ray.data as rd

        from ocr_processor_ray.functions.dedup import bucketed_pair_verify

        docs = rd.from_arrow(
            pa.table({"doc_id": [1, 2, 4], "text": ["aa bb", "aa bb", "zz"]})
        )
        # id 3 is not in docs; searchsorted alone would attach doc 4's text
        pairs = rd.from_arrow(
            pa.table({"id_a": [1, 1], "id_b": [2, 3]})
        )

        def finalize(t: pa.Table) -> pa.Table:
            return t.select(["id_a", "id_b"])

        out = bucketed_pair_verify(
            pairs, docs, "doc_id", "text", pa.string(), 4, finalize
        )
        with pytest.raises(Exception, match="not present in docs"):
            out.take_all()


@pytest.mark.usefixtures("ray_session")
class TestDedupSubstrings:
    def test_planted_duplicate_span_first_occurrence_survives(self):
        from ocr_processor_ray.functions.dedup import dedup_substrings

        span = "one two three four"  # 4 words; window=4 → exactly one gram
        docs = {
            "doc_id": [10, 20, 30],
            "text": [
                f"alpha {span} beta",
                f"head {span} tail words",
                "no duplicated content here at all",
            ],
        }
        out = (
            dedup_substrings(rd.from_arrow(pa.table(docs)), window=4)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        # doc 10 holds the minimum (doc, pos) occurrence — untouched
        assert out.loc[10, "text"] == f"alpha {span} beta"
        assert out.loc[10, "n_dropped"] == 0
        # doc 20 loses exactly the 4 covered words
        assert out.loc[20, "text"] == "head tail words"
        assert out.loc[20, "n_dropped"] == 4
        assert out.loc[30, "n_dropped"] == 0
        assert int(out["n_words"].sum()) == 6 + 7 + 6

    def test_overlapping_losers_union_coverage(self):
        from ocr_processor_ray.functions.dedup import dedup_substrings

        # doc 2 repeats doc 1's full text: every window duplicates, and
        # the overlapping loser windows must union to the whole doc
        text = "a b c d e f"
        docs = {"doc_id": [1, 2], "text": [text, text]}
        out = (
            dedup_substrings(rd.from_arrow(pa.table(docs)), window=3)
            .to_pandas()
            .set_index("doc_id")
        )
        assert out.loc[1, "text"] == text
        assert out.loc[2, "text"] == ""
        assert out.loc[2, "n_dropped"] == 6

    def test_short_docs_pass_through(self):
        from ocr_processor_ray.functions.dedup import dedup_substrings

        docs = {"doc_id": [1, 2], "text": ["tiny doc", "tiny doc"]}
        out = (
            dedup_substrings(rd.from_arrow(pa.table(docs)), window=8)
            .to_pandas()
            .set_index("doc_id")
        )
        # both docs are shorter than the window → no grams, no drops
        assert out.loc[1, "text"] == "tiny doc"
        assert out.loc[2, "text"] == "tiny doc"
        assert int(out["n_dropped"].sum()) == 0

    def test_window_lt_2_rejected(self):
        from ocr_processor_ray.functions.dedup import dedup_substrings

        with pytest.raises(ValueError, match="window"):
            dedup_substrings(
                rd.from_arrow(pa.table({"doc_id": [1], "text": ["x y"]})),
                window=1,
            )

    @pytest.mark.parametrize("force_join_fallback", [False, True])
    def test_random_corpora_match_brute_force(self, force_join_fallback, monkeypatch):
        """Property: dedup_substrings ≡ a driver-side walk (min (doc,pos)
        occurrence of each duplicated window survives; losers' coverage
        unions) on random corpora with heavy reuse, varying layouts —
        on BOTH loser-resolution paths (broadcast scan and the
        over-budget bucketed-join fallback)."""
        import random

        import numpy as np

        from ocr_processor_ray.functions import dedup as dedup_mod
        from ocr_processor_ray.functions.dedup import dedup_substrings

        if force_join_fallback:
            monkeypatch.setattr(dedup_mod, "_BROADCAST_PAYLOAD_BYTES", -1)

        rng = random.Random(1231)
        vocab = [f"w{i}" for i in range(6)]  # tiny vocab → many repeats
        W = 3
        for trial in range(4):
            ids = list(range(1, 1 + rng.randint(3, 8)))
            docs = {
                d: " ".join(
                    rng.choice(vocab) for _ in range(rng.randint(1, 12))
                )
                for d in ids
            }
            occ: dict[tuple, list] = {}
            for d in sorted(docs):
                ws = docs[d].split(" ")
                for p in range(len(ws) - W + 1):
                    occ.setdefault(tuple(ws[p : p + W]), []).append((d, p))
            want = {}
            for d in sorted(docs):
                ws = docs[d].split(" ")
                mask = np.zeros(len(ws), bool)
                for p in range(len(ws) - W + 1):
                    os_ = occ[tuple(ws[p : p + W])]
                    if len(os_) > 1 and min(os_) != (d, p):
                        mask[p : p + W] = True
                want[d] = (
                    " ".join(w for w, m in zip(ws, mask) if not m),
                    int(mask.sum()),
                )
            t = pa.table(
                {
                    "doc_id": pa.array(sorted(docs), pa.int64()),
                    "text": pa.array([docs[d] for d in sorted(docs)]),
                }
            )
            out = (
                dedup_substrings(
                    rd.from_arrow(t).repartition(1 + trial), window=W
                )
                .to_pandas()
                .set_index("doc_id")
            )
            for d in sorted(docs):
                assert out.loc[d, "text"] == want[d][0], (trial, d, docs)
                assert out.loc[d, "n_dropped"] == want[d][1], (trial, d, docs)

    def test_empty_block_in_input(self):
        from ocr_processor_ray.functions.dedup import dedup_substrings

        t = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["a b c d", "a b c d"]),
            }
        )
        out = (
            dedup_substrings(rd.from_arrow([t, t.slice(0, 0)]), window=4)
            .to_pandas()
            .set_index("doc_id")
        )
        assert out.loc[1, "text"] == "a b c d"
        assert out.loc[2, "text"] == ""


@pytest.mark.usefixtures("ray_session")
class TestTfCosinePairs:
    def test_hot_word_df_gate_raises(self, monkeypatch):
        from ocr_processor_ray import queries_catalog as qc

        monkeypatch.setattr(qc, "_TFCOS_MAX_DF", 3)
        with pytest.raises(Exception, match="max df"):
            qc.QUERIES["docs_tf_cosine_pairs"](
                "/root/testdata/sf0.001"
            ).to_pandas()

    def test_pairs_satisfy_integer_tau_bound(self):
        from ocr_processor_ray import queries_catalog as qc

        df = qc.QUERIES["docs_tf_cosine_pairs"](
            "/root/testdata/sf0.001"
        ).to_pandas()
        # non-trivial at this corpus (near-dup planted docs clear τ=0.9)
        assert len(df) > 0
        assert (df["id_a"] < df["id_b"]).all()
        assert (df["num"] > 0).all()
        # every emitted pair satisfies the exact integer τ filter, and
        # none exceeds Cauchy-Schwarz (cos ≤ 1)
        lhs = 100 * df["num"] * df["num"]
        rhs = df["nsq_a"] * df["nsq_b"]
        assert (lhs >= qc._TFCOS_TAU2_PCT * rhs).all()
        assert (df["num"] * df["num"] <= rhs).all()
