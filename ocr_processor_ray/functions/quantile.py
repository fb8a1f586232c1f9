"""Exact distributed order statistics (median) without a one-worker funnel.

The naive exact median (``repartition(1)`` + ``np.median``) pulls every
value onto one worker — fine at sf0.1, a wall at 10^12 rows. This is the
classic two-pass (iterative) histogram select-kth, still EXACT:

1. one scan → total count N, global [min, max] (tiny per-batch partials)
2. per iteration: one scan histograms the in-range values into ~1k
   equal-width integer bins (per-batch ``np.bincount`` partials, summed
   driver-side — the histogram is KB-sized); the bins containing the
   k-th / (k+1)-th order stats narrow the value range
3. when the in-range count fits ``max_collect`` (default 1M values =
   8 MB), collect just those values and pick the order stats directly

Each iteration shrinks the candidate range ~1000× — two iterations
bound 10^12 rows. Exchange volume per scan = one int64 column; nothing
larger than the histogram ever reaches the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

N_BINS = 1024


def _scan_stats(ds: Dataset, col: str) -> tuple[int, int, int]:
    """One pass → (count, min, max) via tiny per-batch partials."""

    def part(b: pa.Table) -> pa.Table:
        arr = b[col]
        mn = pc.min(arr).as_py()
        mx = pc.max(arr).as_py()
        return pa.table(
            {
                "n": pa.array([b.num_rows], pa.int64()),
                "mn": pa.array([mn], pa.int64()),
                "mx": pa.array([mx], pa.int64()),
            }
        )

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    p = p.dropna()
    if p.empty or p["n"].sum() == 0:
        raise ValueError("distributed median of an empty dataset")
    return int(p["n"].sum()), int(p["mn"].min()), int(p["mx"].max())


def _range_histogram(
    ds: Dataset, col: str, lo: int, hi: int, width: int
) -> np.ndarray:
    """One pass → summed histogram of values in [lo, hi] (bins of ``width``)."""
    n_bins = (hi - lo) // width + 1

    def part(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False)
        v = v[(v >= lo) & (v <= hi)]
        counts = np.bincount((v - lo) // width, minlength=n_bins)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {
                "bin": pa.array(nz, pa.int64()),
                "cnt": pa.array(counts[nz], pa.int64()),
            }
        )

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    hist = np.zeros(n_bins, dtype=np.int64)
    if not p.empty:
        np.add.at(hist, p["bin"].to_numpy(), p["cnt"].to_numpy())
    return hist


def distributed_exact_median(
    ds: Dataset,
    col: str,
    max_collect: int = 1_000_000,
    max_iters: int = 4,
) -> float:
    """Exact median of an int64 column; result matches ``np.median`` /
    DuckDB ``median(BIGINT)`` bit-for-bit (mean of the two middles as a
    float for even N)."""
    n, lo, hi = _scan_stats(ds, col)
    k1, k2 = (n - 1) // 2, n // 2  # 0-indexed global order stats
    below = 0  # values strictly below the current [lo, hi] range
    in_range = n

    for _ in range(max_iters):
        if in_range <= max_collect or lo == hi:
            break
        width = max(1, (hi - lo + 1 + N_BINS - 1) // N_BINS)
        hist = _range_histogram(ds, col, lo, hi, width)
        cum = np.cumsum(hist)
        b1 = int(np.searchsorted(cum, k1 - below + 1))
        b2 = int(np.searchsorted(cum, k2 - below + 1))
        below += int(cum[b1 - 1]) if b1 > 0 else 0
        new_lo = lo + b1 * width
        new_hi = min(hi, lo + (b2 + 1) * width - 1)
        in_range = int(cum[b2] - (cum[b1 - 1] if b1 > 0 else 0))
        lo, hi = new_lo, new_hi

    def narrow(b: pa.Table) -> pa.Table:
        v = b[col]
        mask = pc.and_(pc.greater_equal(v, lo), pc.less_equal(v, hi))
        return pa.table({col: v.filter(mask)})

    vals = np.sort(
        ds.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()[col]
        .to_numpy()
    )
    v1 = int(vals[k1 - below])
    v2 = int(vals[k2 - below])
    return (v1 + v2) / 2.0
