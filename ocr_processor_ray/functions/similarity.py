"""Similarity search over an embedding column (``list<float>``).

* ``brute_force_topk`` — baseline: numpy matmul per batch against a
  broadcast query matrix (``ray.put`` once, read per actor), partial
  top-k per batch, final merge of ≤ batches×k tiny rows on the driver
  side of a small aggregate. Exact.
* ``lsh_topk`` — scale path: random-hyperplane LSH bucketing; each
  vector lands in one bucket per table; search probes only matching
  buckets. Approximate; recall grows with ``n_tables``.

Embeddings are L2-normalized on the fly; cosine == dot product after
that.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

logger = logging.getLogger(__name__)


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    arr = batch[vec_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
    return flat.reshape(len(arr), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _det_sims(m: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Row×centroid cosine sims with a LAYOUT-INDEPENDENT reduction:
    each output element is a float64 pairwise sum over that (row,
    centroid) pair's dim products only, so the result is bit-identical
    under ANY batch/block split. A float32 GEMM's reduction order
    varies with the matrix SHAPE — measured: one sim_q rounding flipped
    between a 1-block and a split layout at sf0.001 — which would make
    k-means cluster stats (and the single-threaded oracle compare)
    layout-dependent. Cost is k× the GEMM's memory traffic; bounded by
    batch_rows × k × dim float64 (a few MB at k ≤ 64)."""
    return (m[:, None, :].astype(np.float64) * cents[None, :, :].astype(np.float64)).sum(
        axis=2
    )


def brute_force_topk(
    ds: Dataset,
    query: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 5,
) -> pa.Table:
    """Exact cosine top-k of ``query`` (1-D) against every row.

    Per-batch: one matmul + argpartition to local top-k; the driver
    merges the per-batch candidates (≤ num_batches × k rows). The query
    vector rides in the task closure (tiny); for a query *matrix* use
    ``ray.put`` and look it up in ``__init__`` of a class stage.
    """
    q = _normalize(query.astype(np.float64).reshape(1, -1))[0]

    def local_topk(batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, vec_col).astype(np.float64))
        sims = m @ q
        n = min(k, len(sims))
        idx = np.argpartition(-sims, n - 1)[:n]
        return pa.table(
            {
                id_col: pa.array(np.asarray(batch[id_col])[idx], pa.int64()),
                "sim": pa.array(sims[idx]),  # raw doubles; round only at the end
            }
        )

    cands = ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    # candidates are ≤ #blocks × k rows: merge via per-block top-k + tiny
    # Arrow-refs concat (global_topk) instead of an all-to-all sort shuffle
    from ocr_processor_ray.functions.agg import global_topk

    t = global_topk(cands, "sim", k, tiebreak=id_col, descending=True)
    if "sim" not in t.column_names:
        # schema-less empty merge (every block filtered away upstream —
        # e.g. filtered_topk with an allow set matching nothing)
        return pa.table(
            {id_col: pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
        )
    return t.set_column(
        t.schema.get_field_index("sim"),
        "sim",
        pa.array(np.round(t["sim"].to_numpy(), round_to)),
    )


# filtered-ANN id broadcast budget: a sorted int64 id set up to this
# size rides ray.put once (≤ ~160 MB object, cached per node); past it
# the restriction becomes a bucketed semi-join (both sides move once).
_FILTER_ID_LIMIT = 20_000_000


def filtered_topk(
    ds: Dataset,
    allow_ids: Dataset,
    query: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 5,
) -> pa.Table:
    """Predicate-FILTERED exact ANN (the "filtered vector search" shape:
    metadata predicate from another table restricts the candidate set
    BEFORE any similarity math): cosine top-k of ``query`` over only the
    rows whose ``id_col`` appears in ``allow_ids`` (a Dataset with one
    int64 column named ``id_col``, typically the output of a filter over
    a metadata table).

    Scale shape — the restriction happens before the matmul either way:
    the allowed-id set folds to the driver incrementally
    (relational.distinct_ids_bounded); within the broadcast budget it
    rides ``ray.put`` once and the VECTOR side filters map-side (vectors
    never shuffle); past the budget a bucketed semi-join moves each side
    exactly once. Either way the matmul only ever sees allowed rows, so
    the filter is a pushdown, not a post-filter over a full top-k (a
    post-filter under-fills k when the predicate is selective)."""
    from ocr_processor_ray.functions.relational import (
        bucketed_join,
        distinct_ids_bounded,
        restrict_to_ids,
    )

    ids = distinct_ids_bounded(
        allow_ids, id_col, _FILTER_ID_LIMIT, what="filtered-ANN allow"
    )
    if ids is not None:
        restricted = restrict_to_ids(ds, id_col, ids)
    else:
        restricted = bucketed_join(
            ds,
            allow_ids,
            on=id_col,
            how="semi",
            l_schema=None,
            r_schema={id_col: pa.int64()},
        )
    return brute_force_topk(
        restricted, query, k=k, id_col=id_col, vec_col=vec_col, round_to=round_to
    )


_LSH_SIGN_BITS = 32  # sign bits computed per table; bucket key = low kb bits


def _adaptive_key_bits(n_rows: int, n_bits_min: int, target_bucket: int) -> int:
    """Key width sized so EXPECTED bucket population ≈ ``target_bucket``
    regardless of corpus size: kb = log2(n / target), floored at the
    caller's minimum. At 100× the corpus this adds ~7 bits instead of
    letting bucket population grow 100×."""
    import math

    need = math.ceil(math.log2(max(1.0, n_rows / max(1, target_bucket))))
    return int(min(_LSH_SIGN_BITS, max(n_bits_min, need)))


def embedding_near_dup_pairs(
    ds: Dataset,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 4,
    n_tables: int = 8,
    round_to: int = 5,
    max_bucket: int = 500,
    num_join_buckets: int = 16,
    n_rows: int | None = None,
) -> Dataset:
    """Embedding-cosine near-duplicate pairs via hyperplane-LSH buckets.

    Scale shape (each piece sized so a 100× corpus changes constants,
    not structure):

    * **Key width is adaptive**: ``n_bits`` is the MINIMUM; the actual
      per-table key uses ``max(n_bits, log2(n_rows / (max_bucket/4)))``
      bits, so expected bucket population stays ~constant as the corpus
      grows. Recall for a pair at angle θ is
      ``1-(1-(1-θ/π)^kb)^n_tables`` with kb the effective key width.
    * **No vectors in the explode**: candidate generation shuffles
      (table, key, fullkey, id) rows — 28 B/row/table — never the
      embedding payload. Vectors cross the wire only in the verify
      attach, restricted to candidate ids (``bucketed_pair_verify``).
    * **Overflowing buckets split recursively, never truncate**: each
      row carries its full 32-bit sign key, so a bucket beyond
      ``max_bucket`` is subdivided in-task by the next sign bits until
      it fits. Note the split consumes extra sign bits, so for pairs
      inside hot buckets the per-table collision probability is below
      the kb-bit formula above — the formula is exact only in the
      no-overflow regime (what tests/test_lsh_recall.py pins). Only a
      cluster identical in all 32 sign bits can still overflow; it gets
      a STAR (one center to all others, O(c) pairs) with a logged
      warning instead of O(c²) pairs. The star center ROTATES with the
      table index (table t probes ``u[t % c]``), so a center that is a
      below-threshold outlier costs only that table's edges; losing the
      cluster entirely requires all ``n_tables`` probed centers to be
      outliers. In this (near-uniform-cluster) regime recall is
      heuristic, not the formula bound.
    * Cross-table pair dedup and the exact-cosine verify ride the same
      two bounded bucketed exchanges as MinHash verification.
    """
    from ocr_processor_ray.functions.dedup import bucketed_pair_verify

    # ds is consumed up to 3× (count for the adaptive key width, explode,
    # verify attach). On a column-pruned parquet read the count is
    # metadata-only and re-reads are the cheap streaming shape; a COMPUTED
    # input would re-execute its upstream per consumer — materialize it
    # here unless the caller already did (materialize() on a materialized
    # dataset is a no-op) or passed the row count. Callers that know the
    # count can pass n_rows to keep a parquet read fully lazy.
    if n_rows is None:
        from ray.data._internal.logical.operators.read_operator import Read

        try:
            is_read = isinstance(ds._plan._logical_plan.dag, Read)
        except Exception:
            is_read = False
        if not is_read:
            ds = ds.materialize()
        n_rows = ds.count()
    kb = _adaptive_key_bits(n_rows, n_bits, max(32, max_bucket // 4))
    key_mask = (1 << kb) - 1
    powers = 1 << np.arange(_LSH_SIGN_BITS, dtype=np.uint64)

    def explode(batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, vec_col))
        ids = np.asarray(batch[id_col], dtype=np.int64)
        dim = m.shape[1]
        n = len(ids)
        fk = np.empty(n_tables * n, np.int64)
        for t in range(n_tables):
            signs = hyperplane_signs(m, dim, _LSH_SIGN_BITS, t)
            fk[t * n : (t + 1) * n] = (signs @ powers).astype(np.int64)
        return pa.table(
            {
                "table": pa.array(
                    np.repeat(np.arange(n_tables, dtype=np.int32), n)
                ),
                "key": pa.array(fk & key_mask),
                "fullkey": pa.array(fk),
                id_col: pa.array(np.tile(ids, n_tables)),
            }
        )

    def bucket_candidates(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col], dtype=np.int64)
        fk = np.asarray(group["fullkey"], dtype=np.int64)
        table_idx = int(group["table"][0].as_py()) if group.num_rows else 0
        a_out: list[np.ndarray] = []
        b_out: list[np.ndarray] = []
        stack = [(np.arange(len(ids)), kb)]
        while stack:
            idxs, bit = stack.pop()
            if len(idxs) > max_bucket and bit < _LSH_SIGN_BITS:
                side = (fk[idxs] >> bit) & 1
                stack.append((idxs[side == 0], bit + 1))
                stack.append((idxs[side == 1], bit + 1))
                continue
            u = np.unique(ids[idxs])
            if u.size < 2:
                continue
            if u.size > max_bucket:
                logger.warning(
                    "embedding-near-dup: %d ids identical in all %d sign "
                    "bits of one table — emitting a star (%d pairs) "
                    "instead of all-pairs; cluster is near-uniform",
                    u.size,
                    _LSH_SIGN_BITS,
                    u.size - 1,
                )
                # center rotates with the table index: identical-sign
                # clusters land in the same bucket of EVERY table, so a
                # fixed min-id center that happens to be a below-threshold
                # outlier would lose the cluster in all tables at once
                center = int(table_idx) % u.size
                others = np.delete(u, center)
                cvec = np.full(u.size - 1, u[center], np.int64)
                # canonical id_a < id_b so cross-table dedup in the
                # verify's group_by(id_a, id_b) still collapses orders
                a_out.append(np.minimum(cvec, others))
                b_out.append(np.maximum(cvec, others))
            else:
                iu, ju = np.triu_indices(u.size, k=1)
                a_out.append(u[iu])
                b_out.append(u[ju])
        if not a_out:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(a_out)),
                "id_b": pa.array(np.concatenate(b_out)),
            }
        )

    def finalize(pairs: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "cos_sim": pa.array([], pa.float64()),
            }
        )
        if pairs.num_rows == 0:
            return empty
        va = _normalize(_flat_matrix(pairs["pay_a"]))
        vb = _normalize(_flat_matrix(pairs["pay_b"]))
        cos = np.einsum("ij,ij->i", va, vb)
        keep = cos >= threshold
        if not keep.any():
            return empty
        return pa.table(
            {
                "id_a": pairs["id_a"].combine_chunks().filter(pa.array(keep)),
                "id_b": pairs["id_b"].combine_chunks().filter(pa.array(keep)),
                "cos_sim": pa.array(np.round(cos[keep], round_to), pa.float64()),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    raw_pairs = exploded.groupby(["table", "key"]).map_groups(
        bucket_candidates, batch_format="pyarrow"
    )
    return bucketed_pair_verify(
        raw_pairs,
        ds,
        id_col,
        vec_col,
        pa.list_(pa.float64()),
        num_join_buckets,
        finalize,
    )


def _flat_matrix(arr) -> np.ndarray:
    """(n, dim) float64 matrix from a list<float64> column (no nulls)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return (
        arr.flatten().to_numpy(zero_copy_only=False).reshape(len(arr), -1)
    )


def exact_near_dup_pairs(
    ds: Dataset,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_broadcast_rows: int = 2_000_000,
) -> Dataset:
    """EXACT all-pairs cosine similarity join: (id_a < id_b, cos ≥ threshold).

    Broadcast-small-side design: the normalized matrix is built once and
    ``ray.put`` once; each actor reads it in ``__init__`` and every batch
    does a single matmul against it — exchange volume is the input
    batches only. The O(n²) compute is inherent to an *exact* similarity
    join; this is the oracle-checkable baseline, and
    ``embedding_near_dup_pairs`` (LSH) is the scale path once the matrix
    no longer fits a worker's heap.

    SIZE-GATED: building the broadcast matrix materializes the whole
    embedding table once, so inputs beyond ``max_broadcast_rows``
    (2M rows × e.g. 64 dims ≈ 1 GB float64) raise loudly instead of
    OOM-ing the driver — at that size an exact all-pairs join is the
    wrong tool at any engine; use ``embedding_near_dup_pairs``.

    Output carries pair ids only (no float column) so results compare
    bit-exactly across engines; boundary safety requires the corpus to
    have no pair within float-kernel drift (~1e-6) of the threshold.
    """
    import ray

    ds = ds.materialize()
    n_rows = ds.count()  # free on a materialized dataset
    if n_rows > max_broadcast_rows:
        raise ValueError(
            f"exact_near_dup_pairs: input has {n_rows} rows > "
            f"max_broadcast_rows={max_broadcast_rows}; an exact all-pairs "
            "cosine join does not fit a broadcast matrix at this size — "
            "use embedding_near_dup_pairs (LSH) instead, or raise the cap "
            "if a worker can genuinely hold the matrix"
        )
    t = pa.concat_tables(ray.get(ds.to_arrow_refs()))
    ids_all = np.asarray(t[id_col].combine_chunks())
    m_all = _normalize(_batch_matrix(t, vec_col).astype(np.float64))
    ids_ref, m_ref = ray.put(ids_all), ray.put(m_all)

    def pairs(batch: pa.Table) -> pa.Table:
        # ray.get on a task is a zero-copy object-store read; reused
        # worker processes keep the plasma mapping warm, so a task pool
        # beats paying actor-pool startup for the broadcast state.
        ids, m = ray.get(ids_ref), ray.get(m_ref)
        bm = _normalize(_batch_matrix(batch, vec_col).astype(np.float64))
        bids = np.asarray(batch[id_col])
        sims = bm @ m.T
        mask = (sims >= threshold) & (bids[:, None] < ids[None, :])
        r, c = np.nonzero(mask)
        return pa.table(
            {
                "id_a": pa.array(bids[r], pa.int64()),
                "id_b": pa.array(ids[c], pa.int64()),
            }
        )

    return ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)


_HYPERPLANE_SEED = 977


def hyperplane_signs(m: np.ndarray, dim: int, n_bits: int, table: int) -> np.ndarray:
    """Hyperplane sign bits with a LAYOUT-INDEPENDENT projection: each
    (row, plane) projection is a float64 pairwise sum over that row's
    dim products only (same rationale as ``_det_sims`` — a float32 GEMM
    reorders its reduction with the matrix SHAPE, so a projection within
    an ulp of 0 could flip its sign between batch layouts, silently
    moving a vector to a different bucket). Rows are chunked to bound
    the float64 temporary at ~16 MB regardless of batch size."""
    rng = np.random.RandomState(_HYPERPLANE_SEED + table)
    planes = rng.standard_normal((dim, n_bits)).astype(np.float32)
    pt = planes.T.astype(np.float64)[None, :, :]
    out = np.empty((len(m), n_bits), np.uint64)
    step = max(1, (16 << 20) // (max(n_bits, 1) * max(dim, 1) * 8))
    for s in range(0, len(m), step):
        e = min(s + step, len(m))
        proj = (m[s:e, None, :].astype(np.float64) * pt).sum(axis=2)
        out[s:e] = proj > 0
    return out


def lsh_topk(
    ds: Dataset,
    query: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    n_tables: int = 4,
    round_to: int = 5,
) -> pa.Table:
    """Approximate cosine top-k: probe only LSH-matching rows.

    Adds ``n_tables`` hyperplane bucket keys per vector; a row is scored
    only if it shares a bucket with the query in at least one table. At
    cluster scale the bucket keys become a partition key so probes read
    only matching partitions; here the filter happens per batch
    (no shuffle, same pruning semantics).
    """
    q = _normalize(query.astype(np.float32).reshape(1, -1))
    dim = q.shape[1]
    q_keys = [
        int(hyperplane_signs(q, dim, n_bits, t)[0] @ (1 << np.arange(n_bits, dtype=np.uint64)))
        for t in range(n_tables)
    ]

    def probe(batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, vec_col))
        mask = np.zeros(len(m), dtype=bool)
        for t in range(n_tables):
            signs = hyperplane_signs(m, dim, n_bits, t)
            keys = signs @ (1 << np.arange(n_bits, dtype=np.uint64))
            mask |= keys == q_keys[t]
        if not mask.any():
            return pa.table({id_col: pa.array([], pa.int64()), "sim": pa.array([], pa.float64())})
        # per-row float64 einsum: reduction order fixed per row, so the
        # rounded sim is identical under any batch layout
        sims = np.einsum(
            "ij,j->i", m[mask].astype(np.float64), q[0].astype(np.float64)
        )
        ids = np.asarray(batch[id_col])[mask]
        # cut in the SAME (rounded sim desc, id asc) order global_topk
        # merges with, so the per-batch top-k union always contains the
        # exact global top-k even through rounded ties at the boundary
        r = np.round(sims, round_to)
        idx = np.lexsort((ids, -r))[: min(k, len(sims))]
        return pa.table(
            {
                id_col: pa.array(ids[idx], pa.int64()),
                "sim": pa.array(r[idx], pa.float64()),
            }
        )

    cands = ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
    from ocr_processor_ray.functions.agg import global_topk

    return global_topk(cands, "sim", k, tiebreak=id_col, descending=True)


def _kmeans_cosine(sample: np.ndarray, n_cells: int, seed: int, iters: int = 10) -> np.ndarray:
    """Deterministic spherical k-means (Lloyd on normalized vectors) over a
    DRIVER-SIDE SAMPLE — the classic IVF training step. The sample is
    bounded (thousands of rows); the full corpus never leaves the workers."""
    rng = np.random.RandomState(seed)
    sample = _normalize(sample.astype(np.float64))
    centroids = sample[rng.choice(len(sample), size=min(n_cells, len(sample)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def ivf_topk(
    ds: Dataset,
    query: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    train_sample: int = 2048,
    seed: int = 1231,
    round_to: int = 5,
) -> pa.Table:
    """IVF (inverted-file) approximate top-k — the third ANN path next to
    brute force and hyperplane LSH.

    Train: spherical k-means on a bounded driver-side sample → ``n_cells``
    centroids, broadcast once via ``ray.put``. Probe: each batch assigns
    its vectors to the nearest centroid and scores ONLY vectors whose cell
    is among the query's ``n_probe`` nearest cells — a fraction
    ``n_probe/n_cells`` of the corpus does the matmul. At cluster scale
    the cell id becomes the Parquet partition key so non-probed cells are
    never read at all (partition pruning); here the filter runs per batch
    with identical semantics.
    """
    import ray

    sample = _batch_matrix(
        pa.Table.from_pandas(ds.limit(train_sample).to_pandas()), vec_col
    )
    centroids = _kmeans_cosine(sample, n_cells, seed)
    cent_ref = ray.put(centroids)

    q = _normalize(query.astype(np.float64).reshape(1, -1))[0]
    probe_cells = np.argsort(-(centroids @ q))[:n_probe]
    probe_set = set(int(c) for c in probe_cells)

    def probe(batch: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        m = _normalize(_batch_matrix(batch, vec_col).astype(np.float64))
        # layout-independent cell assignment (see _det_sims): a borderline
        # argmax must not flip with the batch split
        cells = np.argmax(_det_sims(m, cents), axis=1)
        mask = np.isin(cells, list(probe_set))
        if not mask.any():
            return pa.table(
                {id_col: pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
            )
        sims = np.einsum("ij,j->i", m[mask], q)
        ids = np.asarray(batch[id_col])[mask]
        # same (sim desc, id asc) cut order as global_topk's merge —
        # identical-vector sim ties cannot drop the id-tiebreak winner
        idx = np.lexsort((ids, -sims))[: min(k, len(sims))]
        return pa.table(
            {
                id_col: pa.array(ids[idx], pa.int64()),
                "sim": pa.array(sims[idx], pa.float64()),
            }
        )

    cands = ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
    # candidates are ≤ #blocks × k rows — same bounded merge as
    # brute_force_topk / lsh_topk (distributed pre-reduce, no full concat)
    from ocr_processor_ray.functions.agg import global_topk

    t = global_topk(cands, "sim", k, tiebreak=id_col, descending=True)
    return t.set_column(
        t.schema.get_field_index("sim"),
        "sim",
        pa.array(np.round(t["sim"].to_numpy(), round_to)),
    )


# --------------------------------------------------------- k-means (full)

_KMEANS_SCALE = 1 << 20  # fixed-point quantum for order-independent sums


def distributed_kmeans(
    ds: Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 3,
) -> tuple[np.ndarray, Dataset]:
    """Full-corpus Lloyd k-means on the unit sphere (cosine assignment).

    Scale shape, per round: centroids (k × dim floats) broadcast once via
    ``ray.put``; every batch emits ONE partial row — k counts plus the
    k × dim coordinate sums QUANTIZED to int64 fixed-point, so the merge
    is pure integer addition and the result is bit-identical under ANY
    merge order / block arrangement (float partial sums would drift with
    the fold shape). Partials tree-fold toward the driver: per-round
    driver traffic is O(k × dim), never O(corpus).

    Init is the k lowest-``id_col`` vectors (deterministic, bounded
    ``global_topk`` — no random driver sample). Returns the final
    centroids and the (id, cluster) assignment Dataset.
    """
    import ray

    from ocr_processor_ray.functions.agg import global_topk
    from ocr_processor_ray.functions.sketch import tree_fold

    seed_tbl = global_topk(
        ds.map_batches(
            lambda b: b.select([id_col, vec_col]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        order_col=id_col,
        k=k,
        tiebreak=id_col,
        descending=False,
    )
    centroids = _normalize(_batch_matrix(seed_tbl, vec_col).astype(np.float64))
    k = centroids.shape[0]  # corpus smaller than requested k → clamp
    dim = centroids.shape[1]

    for _ in range(iters):
        cent_ref = ray.put(centroids.astype(np.float32))

        def partial(b: pa.Table) -> pa.Table:
            cents = ray.get(cent_ref)
            m = _normalize(_batch_matrix(b, vec_col))
            assign = np.argmax(_det_sims(m, cents), axis=1)
            counts = np.bincount(assign, minlength=len(cents)).astype(np.int64)
            q = np.round(m.astype(np.float64) * _KMEANS_SCALE).astype(np.int64)
            sums = np.zeros((len(cents), m.shape[1]), dtype=np.int64)
            # per-cluster masked sums: ~2.5× faster than the unbuffered
            # np.add.at scatter for 2-D rows at small k (measured), and
            # identical int64 arithmetic (addition order per cluster is
            # row order either way)
            for c in range(len(cents)):
                mask = assign == c
                if mask.any():
                    sums[c] = q[mask].sum(axis=0)
            return pa.table(
                {
                    "counts": pa.array([counts.tobytes()], pa.binary()),
                    "sums": pa.array([sums.tobytes()], pa.binary()),
                }
            )

        def merge(b: pa.Table) -> pa.Table:
            counts = np.zeros(k, dtype=np.int64)
            sums = np.zeros((k, dim), dtype=np.int64)
            for cbuf, sbuf in zip(b["counts"].to_pylist(), b["sums"].to_pylist()):
                counts += np.frombuffer(cbuf, dtype=np.int64)
                sums += np.frombuffer(sbuf, dtype=np.int64).reshape(k, dim)
            return pa.table(
                {
                    "counts": pa.array([counts.tobytes()], pa.binary()),
                    "sums": pa.array([sums.tobytes()], pa.binary()),
                }
            )

        rows = tree_fold(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            merge,
        )
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.int64)
        for r in rows:
            counts += np.frombuffer(r["counts"], dtype=np.int64)
            sums += np.frombuffer(r["sums"], dtype=np.int64).reshape(k, dim)
        nonzero = counts > 0
        new = centroids.copy()
        new[nonzero] = sums[nonzero] / (
            counts[nonzero, None].astype(np.float64) * _KMEANS_SCALE
        )
        centroids = _normalize(new)

    cent_ref = ray.put(centroids.astype(np.float32))

    def assign_batch(b: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        m = _normalize(_batch_matrix(b, vec_col))
        sims = _det_sims(m, cents)
        assign = np.argmax(sims, axis=1)
        best = sims[np.arange(len(assign)), assign]
        # quantized similarity: keeps every downstream aggregate integer
        return pa.table(
            {
                id_col: b[id_col],
                "cluster": pa.array(assign.astype(np.int64)),
                "sim_q": pa.array(
                    np.round(best.astype(np.float64) * _KMEANS_SCALE).astype(np.int64)
                ),
            }
        )

    return centroids, ds.map_batches(
        assign_batch, batch_format="pyarrow", zero_copy_batch=True
    )


_PCA_SCALE = 1 << 16  # per-entry fixed-point quantum for exact covariance


def distributed_pca(
    ds: Dataset,
    vec_col: str = "embedding",
    n_components: int = 4,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One-pass distributed PCA via exact integer sufficient statistics.

    Every batch emits ONE partial row — (n, Σx_q, Σ x_q·x_qᵀ) with
    entries quantized to int64 fixed-point — so the merge is pure
    integer addition and the covariance is BIT-IDENTICAL under any block
    arrangement / fold order (float partial covariances drift with the
    fold shape; that nondeterminism is what makes naive distributed PCA
    untestable). The driver sees O(dim²) ints per fold leaf, never the
    corpus; the dense eigendecomposition runs on the tiny dim×dim matrix.

    Range bound: with |x| ≈ O(1), products are ~2³²; int64 partial sums
    hold ~2⁶² → ~10⁹ rows at this quantum. For 10¹²-row corpora drop
    ``_PCA_SCALE`` to 2¹¹ (covariance error ~2⁻¹¹, far below sampling
    noise at that n) or split sums into two int64 lanes.

    Returns (components [k×dim, rows are eigenvectors, sign-canonical],
    explained_variance [k], mean [dim]).
    """
    from ocr_processor_ray.functions.sketch import tree_fold

    def partial(b: pa.Table) -> pa.Table:
        m = _batch_matrix(b, vec_col).astype(np.float64)
        q = np.round(m * _PCA_SCALE).astype(np.int64)
        sx = q.sum(axis=0)
        sxx = q.T @ q  # int64 matmul: object fallback is avoided by dtype
        return pa.table(
            {
                "n": pa.array([m.shape[0]], pa.int64()),
                "sx": pa.array([sx.tobytes()], pa.binary()),
                "sxx": pa.array([sxx.tobytes()], pa.binary()),
                "dim": pa.array([m.shape[1]], pa.int64()),
            }
        )

    def merge(b: pa.Table) -> pa.Table:
        dim = int(b["dim"][0].as_py())
        n = 0
        sx = np.zeros(dim, dtype=np.int64)
        sxx = np.zeros((dim, dim), dtype=np.int64)
        for nn, sxb, sxxb in zip(
            b["n"].to_pylist(), b["sx"].to_pylist(), b["sxx"].to_pylist()
        ):
            n += nn
            sx += np.frombuffer(sxb, dtype=np.int64)
            sxx += np.frombuffer(sxxb, dtype=np.int64).reshape(dim, dim)
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "sx": pa.array([sx.tobytes()], pa.binary()),
                "sxx": pa.array([sxx.tobytes()], pa.binary()),
                "dim": pa.array([dim], pa.int64()),
            }
        )

    rows = tree_fold(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        merge,
    )
    dim = int(rows[0]["dim"])
    n = 0
    sx = np.zeros(dim, dtype=np.int64)
    sxx = np.zeros((dim, dim), dtype=np.int64)
    for r in rows:
        n += int(r["n"])
        sx += np.frombuffer(r["sx"], dtype=np.int64)
        sxx += np.frombuffer(r["sxx"], dtype=np.int64).reshape(dim, dim)
    if n == 0:
        raise ValueError("distributed_pca: empty input")
    mean = sx.astype(np.float64) / (n * _PCA_SCALE)
    cov = sxx.astype(np.float64) / (n * _PCA_SCALE**2) - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T.copy()
    # canonical sign: the largest-|entry| coordinate of each component
    # is made positive (eigenvectors are sign-ambiguous)
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, evals[order], mean


def semantic_dedup(
    ds: Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    threshold: float = 0.95,
    kmeans_iters: int = 2,
    max_cluster: int = 100_000,
) -> Dataset:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster the corpus
    with k-means, then inside each cluster drop every vector whose
    cosine similarity to a LOWER-id cluster member reaches
    ``threshold`` — the greedy keep-first-representative rule, made
    deterministic by ordering on the id. → kept rows (id_col, cluster).

    Scale shape: centroids come from the existing integer-quantized
    ``distributed_kmeans`` (bit-identical under any block layout;
    O(k×dim) driver traffic per round); one extra corpus pass assigns
    clusters and ships (id, cluster, vector) through ONE bucketed
    exchange keyed by cluster; the quadratic membership check runs
    in-task per cluster, chunked so the working set stays
    ``≤ 1024 × m`` floats. The corpus-wide pair explosion SemDeDup
    avoids by design never happens — but per-cluster cost is O(m²·dim),
    so k must scale with the corpus (the paper's own contract: clusters
    sized to fit a worker). Clusters beyond ``max_cluster`` members
    raise loudly with that guidance rather than silently thrashing.

    Driver-visible oracle: DuckDB cannot restate the k-means float
    iterations, so the catalog compares against a materialized
    single-threaded recomputation (oracle_refs.ref_semantic_dedup);
    determinism and the planted near-duplicate contract are
    pytest-pinned (tests/test_semdedup.py).
    """
    import ray

    from ocr_processor_ray.functions.relational import bucketed_map_groups

    centroids, _ = distributed_kmeans(
        ds, vec_col=vec_col, id_col=id_col, k=k, iters=kmeans_iters
    )
    cent_ref = ray.put(centroids.astype(np.float32))

    def assign_with_vec(b: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        m = _normalize(_batch_matrix(b, vec_col))
        cluster = (
            np.argmax(_det_sims(m, cents), axis=1).astype(np.int64)
            if len(m)
            else np.empty(0, np.int64)
        )
        return pa.table(
            {
                id_col: pc.cast(b[id_col], pa.int64()),
                "cluster": pa.array(cluster),
                # explicit type: an EMPTY batch would otherwise infer a
                # null-typed list column and poison the union schema
                "_vec": pa.array(
                    list(m.astype(np.float32)), type=pa.list_(pa.float32())
                ),
            }
        )

    assigned = ds.map_batches(
        assign_with_vec, batch_format="pyarrow", zero_copy_batch=True
    )

    def prune(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        m_rows = len(g)
        if m_rows > max_cluster:
            raise ValueError(
                f"semantic_dedup: cluster {int(g['cluster'].iloc[0])} has "
                f"{m_rows} members > max_cluster={max_cluster}; raise k so "
                "clusters fit a worker (SemDeDup's own scaling contract) "
                "or raise max_cluster explicitly"
            )
        order = np.argsort(g[id_col].to_numpy())
        ids = g[id_col].to_numpy()[order]
        m = np.stack(g["_vec"].to_numpy()[order]).astype(np.float32)
        dropped = np.zeros(m_rows, dtype=bool)
        # chunked lower-triangle check: row i is dropped iff some j < i
        # (kept or not — the paper prunes by raw epsilon-ball membership,
        # and dropping against dropped-j keeps the rule order-free)
        for s in range(1, m_rows, 1024):
            e = min(s + 1024, m_rows)
            sims = m[s:e] @ m[:e].T  # rows s..e vs ALL lower-or-equal rows
            below = np.arange(e)[None, :] < np.arange(s, e)[:, None]
            dropped[s:e] = ((sims >= threshold) & below).any(axis=1)
        keep = ~dropped
        return pd.DataFrame(
            {
                id_col: pd.array(ids[keep], dtype="int64"),
                "cluster": pd.array(
                    g["cluster"].to_numpy()[order][keep], dtype="int64"
                ),
            }
        )

    return bucketed_map_groups(assigned, "cluster", prune, num_buckets=k)
