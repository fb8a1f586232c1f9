"""Validation / security-scan stages (reference security_validator.py).

Vectorized re-expressions of the reference's per-file gates:

* O12 suspicious-pattern scan — regex list over the payload head
  (script tags, ``javascript:``, executable magic;
  security_validator.py:64-80,392-415)
* O13 encryption / embedded-file probes — the reference scans head
  bytes for PDF encryption-dictionary markers (``/Encrypt``, ``/StmF``,
  ``/StrF``; security_validator.py:418-436) and embedded-file markers
  (``/EmbeddedFile``, ``/Names/EmbeddedFiles``;
  security_validator.py:438-461)
* O14 content digest — sha256 per row (security_validator.py:463-472)
* O15 risk classifier — flag buckets → low/medium/high/critical
  (security_validator.py:474-492)
* O9-style traversal probe for path-like inputs
  (security_validator.py:337-347)

All are stateless ``map_batches`` functions; patterns are compiled /
constant at module import (once per worker process).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

# (flag_name, RE2 pattern applied to the first HEAD_CHARS, risk weight)
HEAD_CHARS = 1 << 20  # first 1 MB of text, as the reference scans head bytes
SUSPICIOUS_PATTERNS: list[tuple[str, str, int]] = [
    ("script_tag", r"(?i)<script", 2),
    ("js_url", r"(?i)javascript:", 2),
    ("event_handler", r"(?i)on(?:click|load|error)\s*=", 1),
    ("pe_magic", r"MZ\x90", 3),
    ("elf_magic", r"\x7fELF", 3),
    ("path_traversal", r"\.\./|%2e%2e%2f", 2),
    ("nul_byte", r"\x00", 3),
    # O13: the reference's encryption-dictionary and embedded-file marker
    # scans (security_validator.py:418-461), case-sensitive like the source
    ("pdf_encryption", r"/Encrypt|/StmF|/StrF", 2),
    ("embedded_file", r"/EmbeddedFile|/Names/EmbeddedFiles", 2),
]

RISK_LEVELS = ("low", "medium", "high", "critical")


def scan_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Append one bool column per suspicious pattern + int risk score."""
    head = pc.utf8_slice_codeunits(batch[column], 0, HEAD_CHARS)
    score = pa.nulls(batch.num_rows, pa.int32())
    score = pc.fill_null(score, 0)
    for name, pattern, weight in SUSPICIOUS_PATTERNS:
        hit = pc.match_substring_regex(head, pattern)
        batch = batch.append_column(f"flag_{name}", hit)
        score = pc.add(score, pc.multiply(pc.cast(hit, pa.int32()), weight))
    return batch.append_column("risk_score", score)


def classify_risk(batch: pa.Table, score_col: str = "risk_score") -> pa.Table:
    """Score buckets → level (O15): 0 low, 1-2 medium, 3-4 high, 5+ critical."""
    s = batch[score_col]
    level = pc.if_else(
        pc.greater_equal(s, 5),
        pa.scalar("critical"),
        pc.if_else(
            pc.greater_equal(s, 3),
            pa.scalar("high"),
            pc.if_else(pc.greater_equal(s, 1), pa.scalar("medium"), pa.scalar("low")),
        ),
    )
    return batch.append_column("risk_level", level)


def add_sha256(batch: pa.Table, column: str = "text", out: str = "sha256") -> pa.Table:
    """Per-row content digest (lineage / dedup key, O14)."""
    hs = [
        hashlib.sha256(t.encode("utf-8")).hexdigest()
        for t in batch[column].to_pylist()
    ]
    return batch.append_column(out, pa.array(hs, pa.string()))
