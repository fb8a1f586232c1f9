"""Unit tests for the pure extraction kernels (no Ray)."""

import pytest

from ocr_processor_ray.extract.core import extract_turn
from ocr_processor_ray.extract.errors import ParseError
from ocr_processor_ray.extract.html_extract import extract_html_blocks
from ocr_processor_ray.extract.normalize import normalize_inline, normalize_text
from ocr_processor_ray.extract.pdfstream import parse_pdfstream
from ocr_processor_ray.extract.sniff import sniff_kind
from ocr_processor_ray.extract.toolmark import parse_toolmark


class TestNormalize:
    def test_crlf_and_tabs(self):
        assert normalize_text("a\tb\r\nc  d\r") == "a b\nc d"

    def test_zero_width_and_nbsp(self):
        assert normalize_inline("a​b c﻿") == "ab c"

    def test_nfc(self):
        # e + combining acute → é (NFC)
        assert normalize_inline("é") == "é"

    def test_blank_line_collapse(self):
        assert normalize_text("a\n\n\n\nb\n\n") == "a\n\nb"

    def test_idempotent(self):
        s = "x  y\r\n\r\n\tz é"
        assert normalize_text(normalize_text(s)) == normalize_text(s)
        assert normalize_inline(normalize_inline(s)) == normalize_inline(s)


class TestSniff:
    @pytest.mark.parametrize(
        "text,kind",
        [
            ("%PDF-SIM 1.4\nR 1 1 1 x", "pdfstream"),
            ('  <tool name="t"><w p="1" b="1 2 3 4">x</w></tool>', "toolmark"),
            ("<div><p>hello</p></div>", "html"),
            ("  \n <p>indented markup</p>", "html"),
            ("just text", "plain"),
            ("", "plain"),
        ],
    )
    def test_kinds(self, text, kind):
        assert sniff_kind(text) == kind


class TestHtml:
    def test_boilerplate_dropped(self):
        html = (
            "<div><nav><a href='/'>Home</a></nav>"
            "<main><p>Real content here.</p></main>"
            "<footer>footer junk</footer><script>var x;</script></div>"
        )
        blocks = extract_html_blocks(html)
        assert blocks == [("p", "Real content here.")]

    def test_link_density_filter(self):
        html = (
            "<div><p><a href='/x'>all link text</a></p>"
            "<p>mostly plain text with <a href='/y'>one</a> link in it</p></div>"
        )
        blocks = extract_html_blocks(html)
        assert len(blocks) == 1
        assert blocks[0][0] == "p"
        assert "mostly plain" in blocks[0][1]

    def test_main_scope_excludes_outside_paras(self):
        html = "<div><p>outside</p><article><p>inside</p></article></div>"
        assert extract_html_blocks(html) == [("p", "inside")]

    def test_class_token_drop(self):
        html = '<div><div class="ad-banner"><p>buy now</p></div><p>keep</p></div>'
        assert extract_html_blocks(html) == [("p", "keep")]

    def test_no_blocks_falls_back_to_text(self):
        assert extract_html_blocks("<span>bare inline</span>") == [("text", "bare inline")]

    def test_misnested_tags_tolerated(self):
        html = "<div><p>one<b>two</p></div><p>three</p>"
        texts = [t for _, t in extract_html_blocks(html)]
        assert any("one" in t for t in texts)


class TestPdfstream:
    def test_reading_order(self):
        payload = (
            "%PDF-SIM 1.7\n"
            "R 1 20 100 world\n"
            "R 1 20 10 hello\n"
            "R 1 10 10 title\n"
            "R 2 10 10 page2\n"
            "%%EOF"
        )
        assert parse_pdfstream(payload) == [["title", "hello world"], ["page2"]]

    @pytest.mark.parametrize(
        "payload",
        [
            "%PDF-SIMx\nR 1 1 1 v",          # bad version
            "%PDF-SIM 1.4\nR 1 a 1 v",       # non-int coord
            "%PDF-SIM 1.4\nR 1 1\n",         # truncated record
            "%PDF-SIM 1.4\nQ 1 1 1 v",       # unknown record
        ],
    )
    def test_corrupt_raises(self, payload):
        with pytest.raises(ParseError):
            parse_pdfstream(payload)


class TestToolmark:
    def test_order_and_grouping(self):
        payload = (
            '<tool name="t">'
            '<w p="1" b="50 10 60 20">world</w>'
            '<w p="1" b="10 10 20 20">hello</w>'
            '<w p="2" b="10 10 20 20">next</w>'
            "</tool>"
        )
        assert parse_toolmark(payload) == [[["hello", "world"]], [["next"]]]

    def test_malformed_raises(self):
        with pytest.raises(ParseError):
            parse_toolmark('<tool name="t"><w p="1" b="1 2 3">three</w></tool>')
        with pytest.raises(ParseError):
            parse_toolmark('<tool name="t"><w p="1" b="1 2 3 4">trunc')


class TestExtractTurn:
    def test_plain_skip_passthrough_unchanged(self):
        raw = "already  clean\r\nwith CRLF"
        r = extract_turn(raw, mode="cli")
        assert r["status"] == "skipped"
        assert r["clean_text"] == raw  # byte-identical passthrough
        assert r["spans"] == []

    def test_plain_force_normalizes(self):
        r = extract_turn("a  b\r\nc", mode="force")
        assert r["status"] == "extracted"
        assert r["clean_text"] == "a b\nc"
        assert r["spans"] == [(0, 5, "text")]

    def test_parse_failure_never_raises(self):
        r = extract_turn("%PDF-SIM 1.4\nR x y z boom", mode="cli")
        assert r["status"] == "parse_failure"
        assert r["clean_text"] == ""
        assert r["bytes_in"] > 0 and r["bytes_out"] == 0

    def test_nul_byte_is_failure(self):
        assert extract_turn("text\x00here")["status"] == "parse_failure"

    def test_max_payload_gate(self):
        assert extract_turn("x" * 100, max_payload_bytes=10)["status"] == "parse_failure"

    def test_span_offsets_match_text(self):
        payload = "%PDF-SIM 1.0\nR 1 10 10 hello\nR 1 20 10 world two\n%%EOF"
        r = extract_turn(payload)
        assert r["clean_text"] == "hello\nworld two"
        for s, e, kind in r["spans"]:
            assert r["clean_text"][s:e].strip() == r["clean_text"][s:e]
        assert [r["clean_text"][s:e] for s, e, _ in r["spans"]] == ["hello", "world two"]

    def test_visual_word_spans(self):
        r = extract_turn("<main><p>two words</p></main>", mode="visual")
        words = [r["clean_text"][s:e] for s, e, k in r["spans"] if k == "word"]
        assert words == ["two", "words"]

    def test_bytes_utf8(self):
        r = extract_turn("שלום")  # plain, skipped; 4 chars, 8 utf-8 bytes
        assert r["bytes_in"] == 8
        assert r["bytes_out"] == 8


class TestErrorTaxonomyAndRegistry:
    def test_status_detail_categories(self):
        from ocr_processor_ray.extract.core import extract_turn

        cases = [
            ("%PDF-SIMx\nR 1 1 1 v", "bad_header"),
            ("%PDF-SIM 1.4\nR 1 a 1 v", "bad_record"),
            ('<tool name="t"><w p="1" b="1 2 3">x</w></tool>', "malformed_markup"),
            ("with \x00 nul", "suspicious_content"),
        ]
        for payload, category in cases:
            r = extract_turn(payload)
            assert r["status"] == "parse_failure"
            assert r["status_detail"].startswith(category + ":"), (payload, r["status_detail"])
        assert extract_turn("clean")["status_detail"] == ""

    def test_oversize_category(self):
        from ocr_processor_ray.extract.core import extract_turn

        r = extract_turn("x" * 100, max_payload_bytes=10)
        assert r["status_detail"].startswith("oversize:")

    def test_register_custom_extractor(self):
        from ocr_processor_ray.extract import core

        # plug a custom kind by overriding the html slot, then restore
        orig = core.get_extractor("html")
        try:
            core.register_extractor("html", lambda text: [("custom", "CUSTOM")])
            r = core.extract_turn("<div>anything</div>")
            assert r["clean_text"] == "CUSTOM"
            assert r["spans"] == [(0, 6, "custom")]
        finally:
            core.register_extractor("html", orig)
        assert core.extract_turn("<div><p>back to normal text</p></div>")["clean_text"] != "CUSTOM"


class TestFastHtmlPathEquivalence:
    """The regex fast path must produce the SAME tree-derived blocks as
    the stdlib parser wherever it claims a fragment (non-None), and must
    bail (None) on constructs whose stdlib semantics it can't replicate."""

    @staticmethod
    def _blocks(root):
        from ocr_processor_ray.extract.html_extract import (
            _MAIN_TAGS,
            _collect_blocks,
            _collect_text,
            _find_first,
        )

        scope = _find_first(root, _MAIN_TAGS) or root
        out = []
        _collect_blocks(scope, out)
        if not out:
            parts = []
            if not scope.dropped:
                _collect_text(scope, parts)
            raw = "".join(parts)
            if raw.strip():
                out.append(("text", raw))
        return out

    CASES = [
        '<p>hello</p>',
        '<div class="sidebar"><p>ad</p></div><main><p>real</p></main>',
        '<article><h1>T</h1><p>b <a href="x">l</a></p></article>',
        '<p>one<br/>two</p>',
        '<ul><li>a</li><li>b<li>c</ul>',
        '<script>var x = 1 < 2;</script><p>after</p>',
        '<script>document.write("<p>hi</p>")</script><p>after</p>',
        '<script>var s = "</div>";</script><p>after</p>',
        '<style>p > a { color: red }</style><p>after</p>',
        '<P CLASS="AD">caps</P><p>ok</p>',
        '<div><p>unclosed<p>two</div>',
        '<div/><p>x</p>',
        '<br></br><p>y</p>',
        '<textarea><p>inside</p></textarea><p>out</p>',
        '<main><p>m1</p></main><main><p>m2</p></main>',
    ]
    BAIL_CASES = [
        '<p>a & b</p>',
        '<!-- c --><p>c</p>',
        '<p>bad < tag</p>',
        '<p>tail<',
        '<div class="a>b"><p>odd</p></div>',
        '<script>open(',
        '</p attr="x"><p>t</p>',
    ]

    def test_fast_equals_stdlib_on_claimed_fragments(self):
        from ocr_processor_ray.extract.html_extract import _fast_parse, _stdlib_root

        for c in self.CASES:
            fast = _fast_parse(c)
            assert fast is not None, c
            assert self._blocks(fast) == self._blocks(_stdlib_root(c)), c

    def test_bails_on_unreplicable_constructs(self):
        from ocr_processor_ray.extract.html_extract import _fast_parse

        for c in self.BAIL_CASES:
            assert _fast_parse(c) is None, c

    def test_corpus_sample_equivalence(self, transcripts_table):
        from ocr_processor_ray.extract.html_extract import _fast_parse, _stdlib_root
        from ocr_processor_ray.extract.sniff import sniff_kind

        n_checked = 0
        for x in transcripts_table["text"].to_pylist():
            if sniff_kind(x) != "html":
                continue
            fast = _fast_parse(x)
            if fast is None:
                continue
            assert self._blocks(fast) == self._blocks(_stdlib_root(x))
            n_checked += 1
        assert n_checked > 100  # the corpus must actually exercise the path

    def test_random_fragments_never_diverge(self):
        """Anything the fast path claims must match stdlib — fuzz over a
        grammar mixing valid tags, boilerplate markers, misnesting, and
        junk. Divergence hides as silently-different extraction output."""
        import random

        from ocr_processor_ray.extract.html_extract import _fast_parse, _stdlib_root

        rng = random.Random(1234)
        pieces = [
            "<p>", "</p>", "<div>", "</div>", "<li>", "</li>", "<br/>",
            "<a href='x'>", "</a>", "<main>", "</main>", "<td>", "</td>",
            '<div class="sidebar">', '<span id="promo">', "</span>",
            "<script>", "</script>", "text ", "more words ", "< ", "&amp;",
            "<w p='1'>", "</w>", "<h2>", "</h2>", "<!-- x -->", "x>y ",
        ]
        for _ in range(400):
            frag = "".join(rng.choice(pieces) for _ in range(rng.randint(1, 14)))
            fast = _fast_parse(frag)
            if fast is None:
                continue
            assert self._blocks(fast) == self._blocks(_stdlib_root(frag)), frag
