"""O1 — the per-turn extraction kernel.

``extract_turn`` is the collapsed, deterministic analog of the
reference's per-document engine call + outcome classification
(``ocr_process``: archive → settings → ``ocrmypdf.ocr`` → classify
success / prior-OCR skip / input error, ocr_combined.py:159-230):

* sniff payload kind by prefix (O10/O11)
* dispatch to the kind-specific parser (N2 html / N3 pdfstream /
  toolmark span parse)
* normalize every extracted block (N1)
* assemble ``clean_text`` + turn-relative character spans
* classify outcome: ``extracted`` / ``skipped`` (already-clean payload
  in cli/visual mode — the PriorOcrFoundError analog,
  ocr_combined.py:219-222) / ``parse_failure`` (row-local; never
  propagates, ocr_combined.py:223-230)

Pure Python, no Ray: this module IS the reference oracle's kernel and
the distributed pipeline's per-row function.
"""

from __future__ import annotations

from ocr_processor_ray.extract.errors import ParseError
from ocr_processor_ray.extract.html_extract import extract_html_blocks
from ocr_processor_ray.extract.normalize import normalize_inline, normalize_text
from ocr_processor_ray.extract.pdfstream import parse_pdfstream
from ocr_processor_ray.extract.sniff import sniff_kind
from ocr_processor_ray.extract.toolmark import parse_toolmark
from ocr_processor_ray.schema import (
    KIND_HTML,
    KIND_PDFSTREAM,
    KIND_PLAIN,
    KIND_TOOLMARK,
    STATUS_EXTRACTED,
    STATUS_FAILED,
    STATUS_SKIPPED,
)

Span = tuple[int, int, str]  # (start, end, kind) — offsets into clean_text

PAGE_BREAK_BLOCK = ""  # an empty block renders as a blank line between pages

# ------------------------------------------------------------------
# U3 — pluggable extractor registry (the analog of the reference's one
# real plugin API, the NotificationChannel ABC, notification_manager.py:37-49):
# payload_kind → block extractor. Registering a new kind makes both the
# oracle and every Ray stage pick it up, since they share this kernel.
# A block extractor maps raw payload text → [(kind, normalized_text)].
# ------------------------------------------------------------------

_EXTRACTOR_REGISTRY: dict[str, "object"] = {}


def register_extractor(kind: str, fn) -> None:
    """Register/override the block extractor for a payload kind."""
    _EXTRACTOR_REGISTRY[kind] = fn


def get_extractor(kind: str):
    return _EXTRACTOR_REGISTRY.get(kind)


def _assemble(blocks: list[tuple[str, str]], emit_word_spans: bool) -> tuple[str, list[Span]]:
    """Join normalized block texts with LF, recording spans.

    ``blocks`` are (kind, normalized_text); empty-text blocks act as
    separators (blank line) and get no span. In visual mode each block
    span is followed by word spans for its space-separated words.
    """
    parts: list[str] = []
    spans: list[Span] = []
    pos = 0
    first = True
    for kind, btext in blocks:
        if not first:
            parts.append("\n")
            pos += 1
        first = False
        if btext:
            start = pos
            end = pos + len(btext)
            spans.append((start, end, kind))
            if emit_word_spans:
                off = start
                for w in btext.split(" "):
                    if w:
                        spans.append((off, off + len(w), "word"))
                    off += len(w) + 1
            parts.append(btext)
            pos = end
    return "".join(parts), spans


def _html_blocks(text: str) -> list[tuple[str, str]]:
    out = []
    for tag, raw in extract_html_blocks(text):
        norm = normalize_inline(raw)
        if norm:
            out.append((tag, norm))
    return out


def _pdfstream_blocks(text: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    for i, page in enumerate(parse_pdfstream(text)):
        lines = [normalize_inline(ln) for ln in page]
        lines = [ln for ln in lines if ln]
        if not lines:
            continue
        if out:
            out.append(("sep", PAGE_BREAK_BLOCK))
        out.extend(("line", ln) for ln in lines)
    return out


def _toolmark_blocks(text: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    for page in parse_toolmark(text):
        lines = []
        for words in page:
            norm_words = [normalize_inline(w) for w in words]
            line = " ".join(w for w in norm_words if w)
            if line:
                lines.append(line)
        if not lines:
            continue
        if out:
            out.append(("sep", PAGE_BREAK_BLOCK))
        out.extend(("line", ln) for ln in lines)
    return out


# O18 analog — exception-message keywords → error category
# (error_handler.py:305-325 classifies by message keywords the same way)
_ERROR_CATEGORIES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("oversize", ("max_payload_bytes",)),
    ("suspicious_content", ("nul byte",)),
    ("bad_header", ("header", "version")),
    ("bad_record", ("coordinates", "truncated", "record")),
    ("malformed_markup", ("toolmark", "bbox", "attrs")),
)


def classify_error(message: str) -> str:
    low = message.lower()
    for category, needles in _ERROR_CATEGORIES:
        if any(n in low for n in needles):
            return category
    return "parse_error"


def extract_turn(
    text: str,
    mode: str = "cli",
    max_payload_bytes: int = 100 * 1024 * 1024,
) -> dict:
    """Extract one turn's main content.

    Returns ``{"payload_kind", "clean_text", "spans", "status",
    "status_detail", "bytes_in", "bytes_out"}`` with spans as
    (start, end, kind) tuples. Never raises on malformed payloads —
    they classify as ``parse_failure`` with an O18-style
    ``status_detail`` of ``"category: message"``.
    """
    bytes_in = len(text.encode("utf-8"))
    kind = sniff_kind(text)
    emit_words = mode == "visual"
    skip_if_clean = mode != "force"

    def result(clean: str, spans: list[Span], status: str, detail: str = "") -> dict:
        return {
            "payload_kind": kind,
            "clean_text": clean,
            "spans": spans,
            "status": status,
            "status_detail": detail,
            "bytes_in": bytes_in,
            "bytes_out": len(clean.encode("utf-8")),
        }

    try:
        if bytes_in > max_payload_bytes:
            raise ParseError(f"payload exceeds max_payload_bytes ({bytes_in})")
        if "\x00" in text:
            # suspicious-content gate (security_validator.py:392-415 scans
            # for binary magic in text payloads); classified, not dropped
            raise ParseError("nul byte in payload")

        if kind == KIND_PLAIN:
            if skip_if_clean:
                # already-clean fast path: pass through UNCHANGED
                return result(text, [], STATUS_SKIPPED)
            clean = normalize_text(text)
            spans = [(0, len(clean), "text")] if clean else []
            return result(clean, spans, STATUS_EXTRACTED)

        extractor = get_extractor(kind)
        if extractor is None:  # pragma: no cover — registry covers all kinds
            raise ParseError(f"no extractor registered for kind {kind!r}")
        blocks = extractor(text)
        clean, spans = _assemble(blocks, emit_words)
        return result(clean, spans, STATUS_EXTRACTED)
    except ParseError as exc:
        msg = str(exc)
        return result("", [], STATUS_FAILED, f"{classify_error(msg)}: {msg}")


# default registry: the built-in payload kinds
register_extractor(KIND_HTML, _html_blocks)
register_extractor(KIND_PDFSTREAM, _pdfstream_blocks)
register_extractor(KIND_TOOLMARK, _toolmark_blocks)
