"""O10/O11 — payload-kind sniffing by prefix heuristics.

The reference sniffs file type via libmagic + a ``%PDF-`` header check
(security_validator.py:349-390). Here the payload is a string column, so
the sniff is a cheap prefix test — vectorizable with ``pyarrow.compute``
(see ``stages.sniff.sniff_batch``); this module is the scalar reference
implementation used by the oracle.
"""

from __future__ import annotations

from ocr_processor_ray.schema import KIND_HTML, KIND_PDFSTREAM, KIND_PLAIN, KIND_TOOLMARK

PDF_PREFIX = "%PDF-"
TOOLMARK_PREFIX = "<tool"


def sniff_kind(text: str) -> str:
    """Classify a payload by prefix. Never raises; corruption is detected
    later, inside the kind-specific parser (ParseError → parse_failure)."""
    if text.startswith(PDF_PREFIX):
        return KIND_PDFSTREAM
    stripped = text.lstrip()
    if stripped.startswith(TOOLMARK_PREFIX):
        return KIND_TOOLMARK
    if stripped.startswith("<"):
        return KIND_HTML
    return KIND_PLAIN
