"""Result export sinks: any catalog result → Parquet / JSONL / CSV.

Datasets use Ray's parallel writers (one file per block — never one
giant file, so a re-run can resume per partition); in-memory results
(small aggregates arriving as ``pa.Table`` / ``pandas.DataFrame``)
write a single file. The reference's sidecar/zip sinks map to these per
SURVEY §2.1 (Parquet+snappy is the compressed container equivalent).
"""

from __future__ import annotations

import os

import pyarrow as pa

FORMATS = ("parquet", "json", "csv")


def export_result(result, out_dir: str, format: str = "parquet") -> str:
    """Write ``result`` under ``out_dir`` in the given format; returns
    ``out_dir``. Accepts a Ray Dataset, a pyarrow Table, or a pandas
    DataFrame."""
    if format not in FORMATS:
        raise ValueError(f"format must be one of {FORMATS}, got {format!r}")
    from ray.data import Dataset

    if isinstance(result, Dataset):
        writer = {
            "parquet": result.write_parquet,
            "json": result.write_json,
            "csv": result.write_csv,
        }[format]
        writer(out_dir)
        return out_dir

    if not isinstance(result, pa.Table):
        result = pa.Table.from_pandas(result, preserve_index=False)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"result.{'parquet' if format == 'parquet' else format}")
    if format == "parquet":
        import pyarrow.parquet as pq

        pq.write_table(result, path)
    elif format == "csv":
        import pyarrow.csv as pacsv

        pacsv.write_csv(result, path)
    else:
        import json

        with open(path, "w") as f:
            for row in result.to_pylist():
                f.write(json.dumps(row, default=str) + "\n")
    return out_dir
