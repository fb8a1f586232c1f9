"""Per-partition manifests: atomic writes, lineage, counters.

The output layout replacing the reference's per-document output bundle +
DB job/file status rows (ocr_combined.py:167-171; database_manager.py:87-119):

    out_dir/
      part=00042/
        data.parquet        # extracted rows of this partition, sorted
        manifest.json       # counters + lineage; existence == completed

A partition write is atomic: data + manifest land in a temp directory
first, then one ``os.replace`` renames it into place — a crashed run
leaves either nothing or a complete partition, never a torn one (the
idempotence analog of the reference's archive skip, ocr_combined.py:51-56,150).

DEPLOYMENT REQUIREMENT — shared POSIX filesystem: partition writes run
inside Ray tasks on whichever node hosts them, via node-local
``os.makedirs``/``os.replace``. On a multi-node cluster ``out_dir`` MUST
be a filesystem every worker and the driver see identically (NFS, Lustre,
a FUSE-mounted object store) — with node-local disks, partitions would
land scattered across workers and the driver's ``read_manifests`` would
silently see a subset, breaking resume and the job summary. The atomic
``os.replace`` additionally requires rename atomicity on that filesystem
(POSIX rename semantics; object-store FUSE mounts vary). For S3-style
output without a shared mount, route writes through ``pyarrow.fs`` and
replace the rename with a manifest-last commit protocol.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_NAME = "manifest.json"
DATA_NAME = "data.parquet"


def _part_dir(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, f"part={part:05d}")


def write_partition_atomic(
    out_dir: str,
    part: int,
    table: pa.Table,
    counters: dict,
    lineage: dict | None = None,
) -> dict:
    """Write one partition atomically; return its manifest dict.

    ``attempts`` in the manifest is the retry counter (the partition-level
    analog of the reference's per-file retry_count,
    database_manager.py:109): it counts this write plus every earlier
    attempt evidenced on disk — a completed manifest being overwritten,
    or a stale ``.tmp`` left by a crashed attempt."""
    final_dir = _part_dir(out_dir, part)
    tmp_dir = final_dir + ".tmp"
    prior_attempts = 0
    old_manifest = os.path.join(final_dir, MANIFEST_NAME)
    if os.path.exists(old_manifest):
        try:
            with open(old_manifest) as f:
                prior_attempts = json.load(f).get("attempts", 1)
        except (OSError, json.JSONDecodeError):
            prior_attempts = 1
    elif os.path.exists(tmp_dir):
        prior_attempts = 1  # crashed mid-write, no manifest survived
    if os.path.exists(tmp_dir):
        shutil.rmtree(tmp_dir)
    os.makedirs(tmp_dir)
    pq.write_table(table, os.path.join(tmp_dir, DATA_NAME))
    manifest = {
        "part": part,
        "rows": table.num_rows,
        "attempts": prior_attempts + 1,
        "counters": counters,
        "lineage": lineage or {},
    }
    with open(os.path.join(tmp_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, sort_keys=True)
    if os.path.exists(final_dir):
        # rerun of a completed partition overwrites, never appends
        shutil.rmtree(final_dir)
    os.replace(tmp_dir, final_dir)
    return manifest


def read_manifests(out_dir: str) -> list[dict]:
    """All completed-partition manifests under ``out_dir``."""
    out: list[dict] = []
    if not os.path.isdir(out_dir):
        return out
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("part=") or name.endswith(".tmp"):
            continue
        mpath = os.path.join(out_dir, name, MANIFEST_NAME)
        if os.path.exists(mpath):
            with open(mpath) as f:
                out.append(json.load(f))
    return out


def completed_partitions(out_dir: str) -> set[int]:
    """The resume anti-join set (J4): partitions with a manifest are done."""
    return {m["part"] for m in read_manifests(out_dir)}


def read_output(out_dir: str) -> pa.Table:
    """Concatenate all completed partitions (small-scale verification only)."""
    tables = []
    for name in sorted(os.listdir(out_dir)):
        if name.startswith("part=") and not name.endswith(".tmp"):
            dpath = os.path.join(out_dir, name, DATA_NAME)
            if os.path.exists(dpath):
                tables.append(pq.read_table(dpath))
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables)
