"""Multi-format transcript sources.

The engine's canonical input is a Parquet transcripts table
(``schema.TRANSCRIPT_SCHEMA``); real corpora also arrive as JSONL or
CSV exports (the reference accepts any file the magic sniffer admits —
/root/reference/ocr_combined.py:232-247 discovery + security_validator
MIME checks; here the analog is format-dispatched readers that all
normalize to ONE Arrow schema so every downstream stage is
format-agnostic).

Scale notes: all three readers are Ray Data native readers (parallel,
streaming, column-pruned where the format supports it). JSONL/CSV carry
no Arrow types, so ``ts`` rides as epoch-microseconds int64 and
``_normalize_schema`` casts per batch — vectorized, zero extra passes.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset

from ocr_processor_ray.schema import TRANSCRIPT_SCHEMA

FORMATS = ("parquet", "json", "csv")


def _normalize_schema(batch: pa.Table) -> pa.Table:
    """Cast a loosely-typed batch (JSONL/CSV ints and strings) to the
    canonical transcript schema. ``ts`` accepts epoch-us int64."""
    cols = {}
    for field in TRANSCRIPT_SCHEMA:
        arr = batch[field.name]
        if pa.types.is_timestamp(field.type) and pa.types.is_integer(arr.type):
            arr = pc.cast(pc.cast(arr, pa.int64()), field.type)
        elif arr.type != field.type:
            arr = pc.cast(arr, field.type)
        cols[field.name] = arr
    return pa.table(cols)


def read_transcripts_any(
    path: str | list[str],
    format: str = "parquet",
    columns: list[str] | None = None,
) -> Dataset:
    """Read a transcripts corpus in any supported format, normalized to
    ``TRANSCRIPT_SCHEMA`` (projected to ``columns`` if given). Parquet
    prunes columns at the read; JSONL/CSV read whole records (the
    formats are row-oriented) and project after the cast."""
    if format not in FORMATS:
        raise ValueError(f"format must be one of {FORMATS}, got {format!r}")
    if format == "parquet":
        ds = rd.read_parquet(path, columns=columns)
        if columns:
            return ds
    elif format == "json":
        ds = rd.read_json(path)
    else:
        ds = rd.read_csv(path)

    ds = ds.map_batches(_normalize_schema, batch_format="pyarrow", zero_copy_batch=True)
    if columns:
        ds = ds.select_columns(columns)
    return ds
