"""Tool-emitted markup parse — the HOCR word/bbox analog.

Payload format (FIXTURES.md §1, produced by ``sources.synth``):

    <tool name="search">
    <w p="1" b="10 20 110 40">Hello</w><w p="1" b="120 20 200 40">world</w>
    <w p="2" b="10 20 80 40">Next</w>
    </tool>

Each ``<w>`` element is one word with a page id and an ``x1 y1 x2 y2``
bbox — exactly the shape of the reference's HOCR ``span.ocrx_word``
elements with ``title="bbox x1 y1 x2 y2"`` attributes and page-suffix
ids (ocr_combined.py:71-82). Words are ordered by ``(page, y1, x1)``,
words sharing ``(page, y1)`` form a line, lines join with LF and pages
with a blank line.
"""

from __future__ import annotations

import re

from ocr_processor_ray.extract.errors import ParseError

# one compiled pattern, held warm by the extraction actor (A1/A2 analog:
# the reference constructs its magic.Magic detectors once per instance,
# security_validator.py:56-58)
W_TAG = re.compile(r'<w\s+p="([^"]*)"\s+b="([^"]*)"\s*>(.*?)</w>', re.S)
ANY_W_OPEN = re.compile(r"<w[\s>]")


def parse_toolmark(text: str) -> list[list[list[str]]]:
    """Return pages → lines → word texts (raw, pre-normalization).

    Raises ParseError when the payload contains ``<w`` openings that the
    well-formed pattern cannot parse (truncated/malformed markup), or
    when page/bbox attributes are non-numeric or the bbox is not 4 ints
    (the F1/F2 string→int-array parse, ocr_combined.py:78-81).
    """
    matches = W_TAG.findall(text)
    n_open = len(ANY_W_OPEN.findall(text))
    if n_open != len(matches):
        raise ParseError(f"malformed toolmark: {n_open} <w openings, {len(matches)} well-formed")

    words: list[tuple[int, int, int, str]] = []
    for p_s, b_s, word in matches:
        try:
            page = int(p_s)
            coords = [int(v) for v in b_s.split()]
        except ValueError:
            raise ParseError(f"non-integer toolmark attrs: p={p_s!r} b={b_s!r}")
        if len(coords) != 4:
            raise ParseError(f"bbox must have 4 coords, got {len(coords)}")
        x1, y1, _x2, _y2 = coords
        words.append((page, y1, x1, word))

    words.sort(key=lambda w: (w[0], w[1], w[2]))

    pages: list[list[list[str]]] = []
    cur_page: int | None = None
    cur_line: tuple[int, int] | None = None
    for page, y1, x1, word in words:
        if page != cur_page:
            pages.append([])
            cur_page = page
            cur_line = None
        if (page, y1) != cur_line:
            pages[-1].append([word])
            cur_line = (page, y1)
        else:
            pages[-1][-1].append(word)
    return pages
