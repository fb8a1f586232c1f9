"""Checkpoint manifests, resume anti-join, counters."""

from ocr_processor_ray.state.partitioning import add_partition_column, partition_of
from ocr_processor_ray.state.manifest import (
    completed_partitions,
    read_manifests,
    write_partition_atomic,
)
from ocr_processor_ray.state.checkpoint import run_checkpointed
from ocr_processor_ray.state.counters import fold_counters

__all__ = [
    "add_partition_column",
    "partition_of",
    "completed_partitions",
    "read_manifests",
    "write_partition_atomic",
    "run_checkpointed",
    "fold_counters",
]
