"""Mergeable sketches: HyperLogLog approximate distinct count.

The two-phase sketch pattern (guide: "emit one serialized sketch per
batch and merge them in a second, tiny stage"): each batch produces a
2^p-register HLL (deterministic blake2b hashing), registers merge by
elementwise max, and the estimate uses the standard HLL bias-corrected
formula with linear counting for the small range. No shuffle — partials
ride a ``map_batches`` and fold in one combine.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

HLL_P = 12
HLL_M = 1 << HLL_P
_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def _hash64(values) -> np.ndarray:
    return np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(str(v).encode("utf-8"), digest_size=8).digest(), "big"
            )
            for v in values
        ),
        dtype=np.uint64,
    )


def hll_registers(values) -> np.ndarray:
    """Registers (uint8[HLL_M]) for a batch of values."""
    regs = np.zeros(HLL_M, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _hash64(values)
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = (h << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)
    # rank = leading zeros of the remaining 64-P bits + 1
    ranks = np.zeros(len(h), dtype=np.uint8)
    mask = np.uint64(1) << np.uint64(63)
    work = rest.copy()
    rank = 1
    remaining = np.ones(len(h), dtype=bool)
    while remaining.any() and rank <= 64 - HLL_P + 1:
        top = (work & mask) != 0
        newly = remaining & top
        ranks[newly] = rank
        remaining &= ~top
        work = work << np.uint64(1)
        rank += 1
    np.maximum.at(regs, idx, ranks)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    est = _ALPHA * HLL_M * HLL_M / np.sum(2.0 ** (-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * HLL_M and zeros > 0:
        est = HLL_M * np.log(HLL_M / zeros)  # linear counting
    return float(est)


def tree_fold(
    partials: Dataset,
    merge_batch,
    fan_in: int = 64,
    driver_max: int = 256,
) -> list:
    """Fold one-sketch-per-batch rows WITHOUT shipping O(#batches) rows
    to the driver: repeated ``map_batches(merge, batch_size=fan_in)``
    levels (each merges up to ``fan_in`` sketch rows into one) until at
    most ``driver_max`` rows remain, which the caller folds in-process.
    At 10^6 input blocks and the defaults the driver receives ≤ 256
    rows after two distributed levels instead of a terabyte of partials.
    Intermediate levels are materialized — they hold only sketch rows."""
    ds = partials.materialize()
    while ds.count() > driver_max:
        ds = ds.map_batches(
            merge_batch, batch_size=fan_in, batch_format="pyarrow"
        ).materialize()
    return ds.take_all()


def _hll_merge_batch(b: pa.Table) -> pa.Table:
    regs = np.zeros(HLL_M, dtype=np.uint8)
    for buf in b["regs"].to_pylist():
        regs = np.maximum(regs, np.frombuffer(buf, dtype=np.uint8))
    return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})


def approx_distinct(ds: Dataset, column: str) -> int:
    """Approximate COUNT(DISTINCT column): per-batch HLL partials merged
    by elementwise max (sketches are designed to be mergeable); the
    merge runs as a distributed tree fold, so driver traffic is bounded
    regardless of block count."""

    def partial(batch: pa.Table) -> pa.Table:
        regs = hll_registers(batch[column].to_pylist())
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = np.zeros(HLL_M, dtype=np.uint8)
    for row in tree_fold(partials, _hll_merge_batch):
        merged = np.maximum(merged, np.frombuffer(row["regs"], dtype=np.uint8))
    return round(hll_estimate(merged))


# ------------------------------------------------------------- count-min

CMS_DEPTH = 4
CMS_WIDTH = 1 << 14  # 16k counters × 4 rows × 8 B = 512 KB per sketch


def _cms_hash(values: list, row: int) -> np.ndarray:
    """Row-seeded 64-bit hashes → column indices (deterministic)."""
    return np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(
                    str(v).encode("utf-8"), digest_size=8, salt=bytes([row] * 8)
                ).digest(),
                "big",
            )
            % CMS_WIDTH
            for v in values
        ),
        dtype=np.int64,
        count=len(values),
    )


def cms_partial(values: list) -> np.ndarray:
    """Count-Min matrix (int64[CMS_DEPTH, CMS_WIDTH]) for one batch.

    Sketches merge by elementwise ADDITION — the two-phase pattern:
    one small matrix per batch, summed in a tiny fold, regardless of how
    many billions of items streamed through."""
    m = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    if not values:
        return m
    for r in range(CMS_DEPTH):
        np.add.at(m[r], _cms_hash(values, r), 1)
    return m


def cms_query(m: np.ndarray, value) -> int:
    """Point frequency estimate: min over rows (never underestimates)."""
    return int(min(m[r, _cms_hash([value], r)[0]] for r in range(CMS_DEPTH)))


def _cms_merge_batch(b: pa.Table) -> pa.Table:
    m = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    for buf in b["cms"].to_pylist():
        m += np.frombuffer(buf, dtype=np.int64).reshape(CMS_DEPTH, CMS_WIDTH)
    return pa.table({"cms": pa.array([m.tobytes()], pa.binary())})


def approx_frequencies(ds: Dataset, column: str, probes: list) -> dict:
    """Estimated frequency of each probe value via a merged Count-Min
    sketch. One pass; exchange volume = one 512 KB matrix per batch,
    tree-folded distributed so the driver never sums #batches matrices."""

    def partial(batch: pa.Table) -> pa.Table:
        m = cms_partial(batch[column].to_pylist())
        return pa.table({"cms": pa.array([m.tobytes()], pa.binary())})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    for row in tree_fold(partials, _cms_merge_batch):
        merged += np.frombuffer(row["cms"], dtype=np.int64).reshape(
            CMS_DEPTH, CMS_WIDTH
        )
    return {p: cms_query(merged, p) for p in probes}


# ------------------------------------------------------------- t-digest

TD_DELTA = 200.0  # compression: ~2*delta centroids max, ~0.5% rank error


def _td_k(q: np.ndarray) -> np.ndarray:
    """k1 scale function: asin-based, concentrates centroids at the tails."""
    return TD_DELTA / (2 * np.pi) * np.arcsin(2 * np.clip(q, 0.0, 1.0) - 1)


def td_compress(means: np.ndarray, weights: np.ndarray) -> tuple:
    """Greedy left-to-right merge of sorted centroids under the k1 size
    bound (a centroid may span quantile range [q0,q1] only while
    k(q1)-k(q0) <= 1). Deterministic — no randomized merge order."""
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order].astype(np.float64)
    total = weights.sum()
    out_m: list = []
    out_w: list = []
    q0 = 0.0
    acc_w = 0.0
    acc_mw = 0.0
    for m, w in zip(means, weights):
        cand_q1 = q0 + (acc_w + w) / total
        if acc_w > 0 and _td_k(np.array([cand_q1]))[0] - _td_k(np.array([q0]))[0] > 1.0:
            out_m.append(acc_mw / acc_w)
            out_w.append(acc_w)
            q0 += acc_w / total
            acc_w, acc_mw = 0.0, 0.0
        acc_w += w
        acc_mw += m * w
    if acc_w > 0:
        out_m.append(acc_mw / acc_w)
        out_w.append(acc_w)
    return np.array(out_m), np.array(out_w)


def td_partial(values: np.ndarray) -> tuple:
    """One batch -> (means, weights) centroid arrays (<= ~2*TD_DELTA rows)."""
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    if len(v) == 0:
        return np.array([]), np.array([])
    return td_compress(v, np.ones(len(v)))


def td_merge(parts: list) -> tuple:
    """Merge centroid sets by concat + re-compress (mergeable sketch)."""
    nonempty = [p for p in parts if len(p[0])]
    if not nonempty:
        return np.array([]), np.array([])
    ms = np.concatenate([p[0] for p in nonempty])
    ws = np.concatenate([p[1] for p in nonempty])
    return td_compress(ms, ws)


def td_quantile(means: np.ndarray, weights: np.ndarray, q: float) -> float:
    """Interpolated quantile from centroid midpoints."""
    if len(means) == 0:
        return float("nan")
    cum = np.cumsum(weights) - weights / 2.0
    target = q * weights.sum()
    return float(np.interp(target, cum, means))


def _td_merge_batch(b: pa.Table) -> pa.Table:
    parts = [
        (np.frombuffer(m, dtype=np.float64), np.frombuffer(w, dtype=np.float64))
        for m, w in zip(b["m"].to_pylist(), b["w"].to_pylist())
    ]
    m, w = td_merge(parts)
    return pa.table(
        {
            "m": pa.array([m.tobytes()], pa.binary()),
            "w": pa.array([w.tobytes()], pa.binary()),
        }
    )


def approx_quantiles(ds: Dataset, column: str, qs: list) -> dict:
    """Approximate quantiles via merged t-digest: one bounded centroid
    set per batch (<= ~2*TD_DELTA rows of 16 B), tree-folded
    distributed. ONE streaming pass regardless of row count — the scale
    path next to functions/quantile's exact multi-pass select-kth."""

    def partial(batch: pa.Table) -> pa.Table:
        m, w = td_partial(batch[column].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "m": pa.array([m.tobytes()], pa.binary()),
                "w": pa.array([w.tobytes()], pa.binary()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    parts = [
        (np.frombuffer(r["m"], dtype=np.float64), np.frombuffer(r["w"], dtype=np.float64))
        for r in tree_fold(partials, _td_merge_batch)
    ]
    m, w = td_merge(parts) if parts else (np.array([]), np.array([]))
    return {q: td_quantile(m, w, q) for q in qs}


# ---------------------------------------------------- grouped sketches


def approx_distinct_by(ds: Dataset, group_col: str, column: str) -> Dataset:
    """Approximate COUNT(DISTINCT column) per group — the grouped form
    of ``approx_distinct``. Per batch: one HLL register set per group
    present (4 KB each); ONE groupby(group) shuffle then merges
    registers by elementwise max per group. Exchange volume is
    #groups × #batches × 4 KB — independent of row count, so a
    10^12-row / 10^3-group table shuffles megabytes, not the data.
    Output: (group_col, n_approx:int64)."""

    def partial(batch: pa.Table) -> pa.Table:
        groups = batch[group_col]
        dic = pc.dictionary_encode(groups.combine_chunks())
        codes = dic.indices.to_numpy(zero_copy_only=False)
        uniq = dic.dictionary
        vals = batch[column].to_pylist()
        # segment by group via ONE stable argsort — O(n log n), not the
        # O(n × #groups) per-group rescan that bites high-cardinality keys
        order = np.argsort(codes, kind="stable")
        sorted_codes = codes[order]
        bounds = np.searchsorted(sorted_codes, np.arange(len(uniq) + 1))
        out_g, out_r = [], []
        for code in range(len(uniq)):
            seg = order[bounds[code] : bounds[code + 1]]
            out_g.append(uniq[code].as_py())
            out_r.append(hll_registers([vals[i] for i in seg]).tobytes())
        return pa.table(
            {
                group_col: pa.array(out_g),
                "regs": pa.array(out_r, pa.binary()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def merge(g: pa.Table) -> pa.Table:
        regs = np.zeros(HLL_M, dtype=np.uint8)
        for buf in g["regs"].to_pylist():
            regs = np.maximum(regs, np.frombuffer(buf, dtype=np.uint8))
        return pa.table(
            {
                group_col: pa.array([g[group_col][0].as_py()]),
                "n_approx": pa.array([round(hll_estimate(regs))], pa.int64()),
            }
        )

    return partials.groupby(group_col).map_groups(merge, batch_format="pyarrow")


def approx_quantiles_by(
    ds: Dataset, group_col: str, column: str, qs: list
) -> Dataset:
    """Grouped t-digest: approximate quantiles PER KEY — the grouped
    form of ``approx_quantiles`` (same pattern as ``approx_distinct_by``).
    Per batch: one bounded centroid set per group present; ONE
    groupby(group) shuffle merges digests per key. Exchange is
    #groups × #batches × ~3 KB — independent of row count.
    Output: (group_col, q:float64, value_approx:float64)."""

    def partial(batch: pa.Table) -> pa.Table:
        groups = batch[group_col]
        dic = pc.dictionary_encode(groups.combine_chunks())
        codes = dic.indices.to_numpy(zero_copy_only=False)
        uniq = dic.dictionary
        vals = batch[column].to_numpy(zero_copy_only=False)
        # one stable argsort segments every group — linear-ish, no
        # O(n × #groups) mask rescans at high key cardinality
        order = np.argsort(codes, kind="stable")
        sorted_codes = codes[order]
        sorted_vals = vals[order]
        bounds = np.searchsorted(sorted_codes, np.arange(len(uniq) + 1))
        out_g, out_m, out_w = [], [], []
        for code in range(len(uniq)):
            m, w = td_partial(sorted_vals[bounds[code] : bounds[code + 1]])
            out_g.append(uniq[code].as_py())
            out_m.append(m.tobytes())
            out_w.append(w.tobytes())
        return pa.table(
            {
                group_col: pa.array(out_g),
                "m": pa.array(out_m, pa.binary()),
                "w": pa.array(out_w, pa.binary()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def merge(g: pa.Table) -> pa.Table:
        parts = [
            (np.frombuffer(m, dtype=np.float64), np.frombuffer(w, dtype=np.float64))
            for m, w in zip(g["m"].to_pylist(), g["w"].to_pylist())
        ]
        m, w = td_merge(parts)
        key = g[group_col][0].as_py()
        return pa.table(
            {
                group_col: pa.array([key] * len(qs)),
                "q": pa.array(list(qs), pa.float64()),
                "value_approx": pa.array(
                    [round(td_quantile(m, w, q), 4) for q in qs], pa.float64()
                ),
            }
        )

    return partials.groupby(group_col).map_groups(merge, batch_format="pyarrow")
