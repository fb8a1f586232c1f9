"""Deterministic conv_id-hash partitioning.

``partition_of`` is a pure function of ``(conv_id, num_partitions)`` —
crc32, not Python's per-process-salted ``hash()`` — so partition ids are
stable across workers, runs, and restarts (SURVEY.md §7.4 hard part 3:
resume idempotence requires partition id to be a function of input, not
execution).
"""

from __future__ import annotations

import zlib

import pyarrow as pa


def partition_of(conv_id: str, num_partitions: int) -> int:
    return zlib.crc32(conv_id.encode("utf-8")) % num_partitions


def add_partition_column(batch: pa.Table, num_partitions: int) -> pa.Table:
    """Append ``part = crc32(conv_id) % P``. Conversations repeat within a
    batch, so partition ids are memoized per distinct conv_id."""
    cache: dict[str, int] = {}
    conv_ids = batch["conv_id"].to_pylist()
    parts = [0] * len(conv_ids)
    for i, cid in enumerate(conv_ids):
        p = cache.get(cid)
        if p is None:
            p = cache[cid] = partition_of(cid, num_partitions)
        parts[i] = p
    return batch.append_column("part", pa.array(parts, pa.int32()))
