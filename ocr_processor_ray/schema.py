"""Arrow schemas for the transcript extraction engine.

Input schema is exactly the BASELINE.json ``input_hint``; output schema
replaces the reference's per-document output bundle (sidecar text +
HOCR layout file, reference: ocr_combined.py:167-171) with columnar
``clean_text`` + character-span offsets.
"""

from __future__ import annotations

import pyarrow as pa

CONV_ID = "conv_id"
TURN_IDX = "turn_idx"

TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

SPAN_TYPE = pa.list_(
    pa.struct(
        [
            pa.field("start", pa.int32()),
            pa.field("end", pa.int32()),
            pa.field("kind", pa.string()),
        ]
    )
)

# statuses mirror the reference outcome classification
# (success / prior-OCR skip / input error — ocr_combined.py:216-230)
STATUS_EXTRACTED = "extracted"
STATUS_SKIPPED = "skipped"
STATUS_FAILED = "parse_failure"
STATUSES = (STATUS_EXTRACTED, STATUS_SKIPPED, STATUS_FAILED)

# payload kinds produced by the sniff stage (analog of MIME/magic sniffing,
# security_validator.py:349-390)
KIND_HTML = "html"
KIND_PDFSTREAM = "pdfstream"
KIND_TOOLMARK = "toolmark"
KIND_PLAIN = "plain"

EXTRACTED_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("payload_kind", pa.string()),
        pa.field("clean_text", pa.string()),
        pa.field("spans", SPAN_TYPE),
        pa.field("status", pa.string()),
        pa.field("status_detail", pa.string()),
        pa.field("bytes_in", pa.int64()),
        pa.field("bytes_out", pa.int64()),
    ]
)
