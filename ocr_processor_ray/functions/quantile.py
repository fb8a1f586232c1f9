"""Exact distributed order statistics (median, quantiles) without a
one-worker funnel.

The naive exact median (``repartition(1)`` + ``np.median``) pulls every
value onto one worker — fine at sf0.1, a wall at 10^12 rows. This is the
classic iterative histogram select-kth, still EXACT:

1. one scan → total count N, global [min, max] (tiny per-batch partials)
2. per iteration: one scan histograms each still-active k's value range
   into ~1k equal-width integer bins (per-batch ``np.bincount`` partials,
   summed driver-side — histograms are KB-sized); the bin containing the
   k-th order stat narrows that k's range ~1000×
3. when every k's in-range count fits ``max_collect`` (default 1M values
   = 8 MB), one final scan collects just those values and picks the
   order statistics directly

All requested ks share each scan (one histogram pass covers every active
range), so cost is ~3 scans of one int64 column total, independent of
how many quantiles are asked for. Nothing larger than the histograms
ever reaches the driver.
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
        raise ValueError("order statistics of an empty dataset")
    return int(p["n"].sum()), int(p["mn"].min()), int(p["mx"].max())


def _range_histograms(
    ds: Dataset, col: str, ranges: list[tuple[int, int, int]]
) -> list[np.ndarray]:
    """One pass → a summed histogram per (lo, hi, width) range."""
    n_bins = [(hi - lo) // w + 1 for lo, hi, w in ranges]

    def part(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False)
        ridx_out, bin_out, cnt_out = [], [], []
        for ri, (lo, hi, w) in enumerate(ranges):
            vv = v[(v >= lo) & (v <= hi)]
            counts = np.bincount((vv - lo) // w, minlength=n_bins[ri])
            nz = np.nonzero(counts)[0]
            ridx_out.append(np.full(len(nz), ri, dtype=np.int32))
            bin_out.append(nz)
            cnt_out.append(counts[nz])
        return pa.table(
            {
                "ridx": pa.array(np.concatenate(ridx_out), pa.int32()),
                "bin": pa.array(np.concatenate(bin_out), pa.int64()),
                "cnt": pa.array(np.concatenate(cnt_out), pa.int64()),
            }
        )

    # fold the sparse per-batch counts with the distributed two-phase
    # aggregate: the driver receives <= sum(n_bins) rows total, never
    # O(#batches) rows of partials
    from ocr_processor_ray.functions.agg import two_phase_agg

    partials = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
    p = two_phase_agg(partials, ["ridx", "bin"], [("cnt", "sum", "cnt")]).to_pandas()
    hists = [np.zeros(nb, dtype=np.int64) for nb in n_bins]
    for ri in range(len(ranges)):
        sub = p[p["ridx"] == ri]
        if not sub.empty:
            np.add.at(hists[ri], sub["bin"].to_numpy(), sub["cnt"].to_numpy())
    return hists


def distributed_order_stats(
    ds: Dataset,
    col: str,
    ks: list[int],
    max_collect: int = 1_000_000,
    max_iters: int = 4,
    stats: tuple[int, int, int] | None = None,
) -> dict[int, int]:
    """Exact 0-indexed order statistics of an int64 column.

    Returns {k: value}. One histogram pass per narrowing iteration covers
    every still-active k; one final pass collects the union of the
    narrowed ranges (≤ ``len(ks) × max_collect`` values). Pass a
    precomputed ``stats=(n, min, max)`` to skip the counting scan."""
    n, mn, mx = stats if stats is not None else _scan_stats(ds, col)
    for k in ks:
        if not 0 <= k < n:
            raise ValueError(f"order statistic {k} out of range for n={n}")
    state = {k: [mn, mx, 0, n] for k in set(ks)}  # lo, hi, below, in_range

    for _ in range(max_iters):
        active = [
            k for k, (lo, hi, _, in_r) in state.items()
            if in_r > max_collect and lo < hi
        ]
        if not active:
            break
        ranges = []
        for k in active:
            lo, hi, _, _ = state[k]
            ranges.append((lo, hi, max(1, (hi - lo + 1 + N_BINS - 1) // N_BINS)))
        hists = _range_histograms(ds, col, ranges)
        for k, hist, (lo, hi, width) in zip(active, hists, ranges):
            below = state[k][2]
            cum = np.cumsum(hist)
            b = int(np.searchsorted(cum, k - below + 1))
            state[k] = [
                lo + b * width,
                min(hi, lo + (b + 1) * width - 1),
                below + (int(cum[b - 1]) if b > 0 else 0),
                int(hist[b]),
            ]

    bounds = [(lo, hi) for lo, hi, _, _ in state.values()]

    def narrow(b: pa.Table) -> pa.Table:
        v = b[col]
        mask = None
        for lo, hi in bounds:
            m = pc.and_(pc.greater_equal(v, lo), pc.less_equal(v, hi))
            mask = m if mask is None else pc.or_(mask, m)
        return pa.table({col: v.filter(mask)})

    vals = np.sort(
        ds.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()[col]
        .to_numpy()
    )
    out = {}
    for k, (lo, hi, below, _) in state.items():
        in_range = vals[(vals >= lo) & (vals <= hi)]
        out[k] = int(in_range[k - below])
    return out


def distributed_exact_median(
    ds: Dataset,
    col: str,
    max_collect: int = 1_000_000,
    max_iters: int = 4,
) -> float:
    """Exact median of an int64 column; result matches ``np.median`` /
    DuckDB ``median(BIGINT)`` bit-for-bit (mean of the two middles as a
    float for even N)."""
    stats = _scan_stats(ds, col)
    k1, k2 = (stats[0] - 1) // 2, stats[0] // 2
    res = distributed_order_stats(
        ds, col, [k1, k2], max_collect=max_collect, max_iters=max_iters, stats=stats
    )
    return (res[k1] + res[k2]) / 2.0


def quantile_disc_k(n: int, q: float) -> int:
    """DuckDB ``quantile_disc`` index convention: ceil(q*n) - 1, 0-indexed
    (verified empirically against DuckDB 1.x for n=10, 11)."""
    import math

    return max(0, math.ceil(q * n) - 1)
