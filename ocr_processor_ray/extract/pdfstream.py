"""N3 — pseudo-PDF layout-stream parse with reading-order reconstruction.

The payload format (defined in FIXTURES.md §1, produced by
``sources.synth``) models text runs extracted from a PDF with layout
coordinates, in arbitrary stream order:

    %PDF-SIM <version>
    R <page> <y> <x> <text run ...>
    ...
    %%EOF

Reconstruction sorts runs by ``(page, y, x)`` — the pdfminer-style
top-to-bottom / left-to-right reading order — groups runs on the same
``(page, y)`` into a line, and joins lines with LF / pages with a blank
line. This is the analog of the reference's per-page HOCR coordinate
grouping (``coords_per_page``, ocr_combined.py:74-82) and its header
version check (``%PDF-`` + parseable version float,
security_validator.py:370-390).
"""

from __future__ import annotations

from ocr_processor_ray.extract.errors import ParseError

HEADER_PREFIX = "%PDF-SIM"


def parse_pdfstream(text: str) -> list[list[str]]:
    """Return pages → ordered line texts (raw, pre-normalization).

    Raises ParseError on a malformed header, an unparseable version, or a
    malformed run record (non-integer coordinates / missing fields) —
    mirroring the reference's InputFileError path (ocr_combined.py:223-226).
    """
    lines = text.split("\n")
    header = lines[0].strip() if lines else ""
    if not header.startswith(HEADER_PREFIX):
        raise ParseError(f"bad pdfstream header: {header[:40]!r}")
    version = header[len(HEADER_PREFIX):].strip()
    try:
        float(version)
    except ValueError:
        raise ParseError(f"unparseable pdfstream version: {version[:20]!r}")

    runs: list[tuple[int, int, int, str]] = []
    for ln in lines[1:]:
        ln = ln.strip()
        if not ln or ln == "%%EOF":
            continue
        if not ln.startswith("R "):
            raise ParseError(f"unknown pdfstream record: {ln[:40]!r}")
        parts = ln.split(" ", 4)
        if len(parts) < 5:
            raise ParseError(f"truncated run record: {ln[:40]!r}")
        try:
            page, y, x = int(parts[1]), int(parts[2]), int(parts[3])
        except ValueError:
            raise ParseError(f"non-integer coordinates: {ln[:40]!r}")
        runs.append((page, y, x, parts[4]))

    # reading order: stable sort by (page, y, x)
    runs.sort(key=lambda r: (r[0], r[1], r[2]))

    pages: list[list[str]] = []
    cur_key: tuple[int, int] | None = None
    cur_page: int | None = None
    for page, y, x, run in runs:
        if page != cur_page:
            pages.append([])
            cur_page = page
            cur_key = None
        if (page, y) != cur_key:
            pages[-1].append(run)
            cur_key = (page, y)
        else:
            pages[-1][-1] += " " + run
    return pages
