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


def read_media_dir(path: str | list[str]) -> Dataset:
    """File-crawl analog for raw media: ``read_binary_files`` over a
    directory tree → the MEDIA_SCHEMA layout (stable int64 id from the
    path hash, suffix-sniffed mime, unknown dims until decode). This is
    the reference's recursive input discovery
    (/root/reference/ocr_combined.py:232-247) applied to binary
    payloads: parallel streaming read, one row per file, payloads never
    touch the driver."""
    import hashlib

    import numpy as np

    ds = rd.read_binary_files(path, include_paths=True)
    _MIME = {
        ".png": "image/png", ".jpg": "image/jpeg", ".jpeg": "image/jpeg",
        ".gif": "image/gif", ".wav": "audio/wav", ".mp3": "audio/mpeg",
        ".mp4": "video/mp4", ".webm": "video/webm",
    }

    def to_media(batch: pa.Table) -> pa.Table:
        paths = batch["path"].to_pylist()
        ids = [
            int.from_bytes(
                hashlib.blake2b(p.encode("utf-8"), digest_size=8).digest(), "big"
            )
            >> 1  # keep ids positive in int64
            for p in paths
        ]
        mimes = [
            _MIME.get("." + p.rsplit(".", 1)[-1].lower() if "." in p else "", "application/octet-stream")
            for p in paths
        ]
        n = batch.num_rows
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "payload": pc.cast(batch["bytes"], pa.binary()),
                "mime": pa.array(mimes, pa.string()),
                "width": pa.array(np.zeros(n, dtype=np.int32)),
                "height": pa.array(np.zeros(n, dtype=np.int32)),
            }
        )

    return ds.map_batches(to_media, batch_format="pyarrow", zero_copy_batch=True)


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
