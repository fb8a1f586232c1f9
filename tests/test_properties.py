"""Property tests (hypothesis): total functions, determinism, idempotence."""

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_processor_ray.extract.core import extract_turn
from ocr_processor_ray.extract.normalize import normalize_inline, normalize_text
from ocr_processor_ray.extract.sniff import sniff_kind
from ocr_processor_ray.schema import STATUSES

# arbitrary unicode text, including payload-prefix lookalikes
payloads = st.one_of(
    st.text(max_size=400),
    st.text(max_size=200).map(lambda s: "%PDF-SIM 1.4\n" + s),
    st.text(max_size=200).map(lambda s: "%PDF-" + s),
    st.text(max_size=200).map(lambda s: "<tool " + s),
    st.text(max_size=200).map(lambda s: "<div>" + s + "</div>"),
    st.text(max_size=200).map(lambda s: '<w p="1" b="1 2 3 4">' + s),
)


@settings(max_examples=300, deadline=None)
@given(payloads, st.sampled_from(["cli", "force", "visual"]))
def test_extract_turn_is_total_and_deterministic(text, mode):
    """Never raises, always a valid status, spans index into clean_text,
    identical on repeat (bit-determinism across workers reduces to this)."""
    r1 = extract_turn(text, mode=mode)
    r2 = extract_turn(text, mode=mode)
    assert r1 == r2
    assert r1["status"] in STATUSES
    clean = r1["clean_text"]
    for s, e, kind in r1["spans"]:
        assert 0 <= s <= e <= len(clean)
        assert kind
    assert r1["bytes_in"] == len(text.encode("utf-8"))
    assert r1["bytes_out"] == len(clean.encode("utf-8"))


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=500))
def test_normalizers_idempotent(s):
    assert normalize_text(normalize_text(s)) == normalize_text(s)
    assert normalize_inline(normalize_inline(s)) == normalize_inline(s)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_normalize_inline_is_single_line(s):
    out = normalize_inline(s)
    assert "\n" not in out and "\t" not in out
    assert out == out.strip()


@settings(max_examples=300, deadline=None)
@given(payloads)
def test_sniff_total(text):
    assert sniff_kind(text) in ("html", "pdfstream", "toolmark", "plain")


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=300))
def test_plain_skip_is_identity(s):
    """cli-mode plain payloads pass through byte-identically (O7)."""
    if sniff_kind(s) == "plain":
        r = extract_turn(s, mode="cli")
        if r["status"] == "skipped":
            assert r["clean_text"] == s


# ---------------------------------------------------------------- sketches

values_lists = st.lists(
    st.one_of(st.integers(-10**9, 10**9), st.text(max_size=20)), max_size=200
)


@given(values_lists)
@settings(max_examples=50, deadline=None)
def test_cms_point_estimates_never_underestimate(vals):
    from collections import Counter

    from ocr_processor_ray.functions.sketch import cms_partial, cms_query

    m = cms_partial(vals)
    for v, n in Counter(vals).items():
        assert cms_query(m, v) >= n


@given(values_lists, st.integers(1, 199))
@settings(max_examples=50, deadline=None)
def test_cms_split_merge_equals_whole(vals, cut):
    import numpy as np

    from ocr_processor_ray.functions.sketch import cms_partial

    cut = min(cut, len(vals))
    whole = cms_partial(vals)
    merged = cms_partial(vals[:cut]) + cms_partial(vals[cut:])
    assert np.array_equal(whole, merged)


@given(
    st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=500),
    st.integers(1, 499),
)
@settings(max_examples=50, deadline=None)
def test_tdigest_weight_conserved_and_bounded(vals, cut):
    import numpy as np

    from ocr_processor_ray.functions.sketch import TD_DELTA, td_merge, td_partial

    cut = min(cut, len(vals))
    m, w = td_merge([td_partial(np.array(vals[:cut])), td_partial(np.array(vals[cut:]))])
    assert w.sum() == len(vals)  # no mass lost in compression
    assert len(m) <= 2 * TD_DELTA + 2  # centroid count bounded
    if len(m):
        assert min(vals) <= m[0] and m[-1] <= max(vals)


@given(st.lists(st.text(min_size=0, max_size=60), max_size=40))
@settings(max_examples=50, deadline=None)
def test_batch_minhash_equals_per_doc(texts):
    import numpy as np

    from ocr_processor_ray.functions.dedup import (
        batch_minhash_signatures,
        minhash_signature,
    )

    sigs = batch_minhash_signatures(texts)
    for i, t in enumerate(texts):
        assert np.array_equal(sigs[i], minhash_signature(t)), i


@given(st.lists(st.text(min_size=0, max_size=80), max_size=40))
@settings(max_examples=60, deadline=None)
def test_batch_simhash_equals_per_doc(texts):
    from ocr_processor_ray.functions.dedup import batch_simhash64, simhash64

    got = batch_simhash64(texts)
    for i, t in enumerate(texts):
        assert got[i] == simhash64(t), (i, t)


def test_batch_simhash_edge_cases():
    from ocr_processor_ray.functions.dedup import batch_simhash64, simhash64

    texts = [
        "",                      # empty doc → sentinel
        "   \t\n  ",             # whitespace-only → sentinel
        "a",                     # single token
        "a a a a a",             # repeated token
        "tok\x00en nul\x00led",  # NUL inside tokens (khash trap)
        "tok\\0en",              # literal backslash-zero ≠ NUL token
        "a\x1cb",                # \x1c: python isspace() splits, Unicode WSpace doesn't
        "word " * 300,           # long doc
        "",                      # empty at the END (reduceat offset clamp)
    ]
    got = batch_simhash64(texts)
    for i, t in enumerate(texts):
        assert got[i] == simhash64(t), (i, repr(t))
    assert got[0] == got[1] == -(1 << 63)


# PII fragments interleaved with noise: the property pins the Arrow RE2
# kernel to an independent Python `re` reference applying the SAME
# patterns in the SAME order (the constructs used are semantics-identical
# between re and RE2: classes, bounded quantifiers, alternation, \b).
_PII_FRAGMENTS = st.sampled_from(
    [
        "bob@example.com",
        "a.b-c_d@ex-ample.org",
        "x@y.io",
        "@nope",
        "a@b.c",
        "192.168.0.1",
        "8.8.8.8",
        "999.999.999.999",
        "1.2.3",
        "(555) 123-4567",
        "+1 555.123.4567",
        "555-999-0000",
        "555-12-3456",
        "plain words here",
        "x",
        "",
        ".",
        "-",
        " ",
    ]
)


@given(st.lists(_PII_FRAGMENTS, min_size=0, max_size=8))
@settings(max_examples=200, deadline=None)
def test_scrub_pii_matches_python_re_reference(frags):
    import re

    import pyarrow as pa

    from ocr_processor_ray.functions.text import PII_PATTERNS, scrub_pii

    text = " ".join(frags)
    expected, n = text, 0
    for _, pat, tok in PII_PATTERNS:
        n += len(re.findall(pat, expected))
        expected = re.sub(pat, tok, expected)
    got = scrub_pii(pa.table({"text": [text]}))
    assert got["text"][0].as_py() == expected, text
    assert got["n_pii"][0].as_py() == n, text


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # key
            st.integers(min_value=-5, max_value=8),  # score (ties common)
            st.integers(min_value=0, max_value=12),  # weight (zeros common)
        ),
        min_size=0,
        max_size=60,
    ),
    st.integers(min_value=0, max_value=40),          # budget
    st.integers(min_value=1, max_value=5),           # split point count
)
@settings(max_examples=200, deadline=None)
def test_local_budget_select_prefix_rule_matches_pandas(rows, budget, n_splits):
    """_local_budget_select == the SQL window-SUM prefix rule on any ONE
    batch, and splitting the batch arbitrarily then re-selecting over the
    concatenated survivors (the partial→combine composition) yields the
    same final set — the lossless-prune invariant grouped_budget_select
    relies on."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ocr_processor_ray.functions.agg import _local_budget_select

    t = pa.table(
        {
            "key": pa.array([f"k{k}" for k, _, _ in rows]),
            "score": pa.array([s for _, s, _ in rows], pa.int64()),
            "w": pa.array([w for _, _, w in rows], pa.int64()),
            "id": pa.array(list(range(len(rows))), pa.int64()),
        }
    )
    df = t.to_pandas().sort_values(
        ["key", "score", "id"], ascending=[True, False, True]
    )
    df["cum"] = df.groupby("key")["w"].cumsum()
    want = df[df["cum"] <= budget]

    got = _local_budget_select(t, "key", "score", "w", budget, "id", cum_col="cum")
    assert sorted(got["id"].to_pylist()) == sorted(want["id"])
    got_cum = dict(zip(got["id"].to_pylist(), got["cum"].to_pylist()))
    assert got_cum == dict(zip(want["id"], want["cum"]))

    # partial→combine composition exactly as grouped_budget_select runs
    # it: split rows arbitrarily, prune each split WITH tombstones, then
    # combine the merged candidates — must equal the one-batch answer
    # (the zero-weight/dropped-better-row false positives the tombstones
    # exist to kill were found by this very property)
    if len(rows):
        from ocr_processor_ray.functions.agg import _TOMB

        bounds = sorted(
            {0, len(rows)}
            | {(i * 7919) % len(rows) for i in range(1, n_splits)}
        )
        parts = [
            _local_budget_select(
                t.slice(a, b - a), "key", "score", "w", budget, "id",
                cum_col=None, emit_tombstones=True,
            )
            for a, b in zip(bounds[:-1], bounds[1:])
            if b > a
        ]
        merged = pa.concat_tables([p for p in parts if p.num_rows])
        if merged.num_rows == 0:
            assert len(want) == 0
        else:
            final = _local_budget_select(
                merged, "key", "score", "w", budget, "id", cum_col="cum"
            ).drop_columns([_TOMB])
            assert sorted(final["id"].to_pylist()) == sorted(want["id"])
            final_cum = dict(zip(final["id"].to_pylist(), final["cum"].to_pylist()))
            assert final_cum == dict(zip(want["id"], want["cum"]))
