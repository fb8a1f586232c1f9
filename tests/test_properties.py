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
