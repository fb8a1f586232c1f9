"""Extraction error types.

``ParseError`` is the row-level poison-pill signal: it is always caught
inside the extraction kernel / UDF and converted to
``status='parse_failure'`` — a failed row must never fail a block
(reference behavior: per-file try/except logs and continues,
ocr_combined.py:219-230; error classification, error_handler.py:305-325).
"""


class ParseError(ValueError):
    """Payload is malformed for its sniffed kind."""
