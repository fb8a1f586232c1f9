"""Visual debug sink: reconstruct highlight overlays from spans (S6/O6).

The reference renders per-page PNGs with red rectangles around each
OCR'd word (ocr_combined.py:84-105, PIL ``draw.rectangle`` over HOCR
bboxes). This engine's extraction is text-native — spans are
``(start, end, kind)`` char offsets into ``clean_text`` — so the
faithful analog is a deterministic SVG overlay: the turn's text laid
out in monospace lines with one outlined rectangle per word span.
SVG is pure text (no imaging libraries exist in this environment) and
diff-able, which also makes the sink unit-testable byte-for-byte.

``write_overlays`` is a Ray map_batches side-effect sink writing one
``.svg`` per selected turn — same shared-filesystem requirement as the
partition manifests (state/manifest.py docstring).
"""

from __future__ import annotations

import os
from xml.sax.saxutils import escape

import pyarrow as pa

CHAR_W = 8  # monospace advance, px
LINE_H = 16


def render_span_overlay_svg(
    clean_text: str,
    spans: list[dict],
    wrap: int = 80,
    kind: str = "word",
) -> str:
    """Deterministic SVG: the text in monospace lines + one outlined rect
    per ``kind`` span (red, 2px — mirroring the reference's overlay)."""
    # char index -> (line, col) under fixed wrapping
    positions: list[tuple[int, int]] = []
    line = col = 0
    for ch in clean_text:
        positions.append((line, col))
        if ch == "\n" or col + 1 >= wrap:
            line, col = line + 1, 0
        else:
            col += 1
    positions.append((line, 0))  # end sentinel
    n_lines = line + 1

    width = wrap * CHAR_W + 20
    height = n_lines * LINE_H + 20
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}">',
        '<style>text{font-family:monospace;font-size:13px;}</style>',
    ]
    # text lines
    lines: list[list[str]] = [[] for _ in range(n_lines)]
    for ch, (ln, _) in zip(clean_text, positions):
        if ch != "\n":
            lines[ln].append(ch)
    for i, chars in enumerate(lines):
        y = 10 + (i + 1) * LINE_H - 4
        parts.append(f'<text x="10" y="{y}">{escape("".join(chars))}</text>')
    # span rectangles (split at wrap boundaries)
    for s in spans:
        if s["kind"] != kind:
            continue
        start, end = int(s["start"]), int(s["end"])
        if not 0 <= start < end <= len(clean_text):
            continue
        ln, col = positions[start]
        while start < end:
            run = min(end - start, wrap - col)
            x = 10 + col * CHAR_W
            y = 10 + ln * LINE_H
            parts.append(
                f'<rect x="{x}" y="{y}" width="{run * CHAR_W}" height="{LINE_H}" '
                'fill="none" stroke="red" stroke-width="2"/>'
            )
            start += run
            ln, col = ln + 1, 0
    parts.append("</svg>")
    return "\n".join(parts)


def write_overlays(ds, out_dir: str, kind: str = "word") -> int:
    """Render one SVG per turn with ≥1 matching span; returns files written.

    Runs as a parallel map_batches side-effect sink (each task writes its
    own rows' files); out_dir must be a shared filesystem on multi-node."""
    os.makedirs(out_dir, exist_ok=True)

    def sink(b: pa.Table) -> pa.Table:
        written = 0
        for conv, idx, text, spans in zip(
            b["conv_id"].to_pylist(),
            b["turn_idx"].to_pylist(),
            b["clean_text"].to_pylist(),
            b["spans"].to_pylist(),
        ):
            spans = spans or []
            if not any(s["kind"] == kind for s in spans):
                continue
            svg = render_span_overlay_svg(text or "", spans, kind=kind)
            path = os.path.join(out_dir, f"{conv}_{idx:05d}.svg")
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                f.write(svg)
            os.replace(tmp, path)
            written += 1
        return pa.table({"n_written": pa.array([written], pa.int64())})

    counts = ds.map_batches(sink, batch_format="pyarrow")
    return sum(r["n_written"] for r in counts.take_all())
