"""Vectorized payload-kind sniff stage (stateless ``map_batches`` fn).

Arrow-kernel version of ``extract.sniff.sniff_kind`` — prefix tests via
``pyarrow.compute``, zero-copy in/out. Used for pre-extraction routing,
statistics and filter pushdown (e.g. run only pdfstream payloads through
a heavier stage). The extraction kernel re-derives the kind scalar-side,
so the flagship output's ``payload_kind`` never depends on this stage.

Reference analog: MIME/magic sniff + ``%PDF-`` header check
(security_validator.py:349-390).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ocr_processor_ray.extract.sniff import PDF_PREFIX, TOOLMARK_PREFIX
from ocr_processor_ray.schema import KIND_HTML, KIND_PDFSTREAM, KIND_PLAIN, KIND_TOOLMARK


def sniff_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Append a ``payload_kind`` column classified by prefix."""
    text = batch[column]
    stripped = pc.utf8_ltrim_whitespace(text)
    is_pdf = pc.starts_with(text, pattern=PDF_PREFIX)
    is_tool = pc.starts_with(stripped, pattern=TOOLMARK_PREFIX)
    is_html = pc.starts_with(stripped, pattern="<")
    kind = pc.if_else(
        is_pdf,
        pa.scalar(KIND_PDFSTREAM),
        pc.if_else(
            is_tool,
            pa.scalar(KIND_TOOLMARK),
            pc.if_else(is_html, pa.scalar(KIND_HTML), pa.scalar(KIND_PLAIN)),
        ),
    )
    return batch.append_column("payload_kind", kind)
