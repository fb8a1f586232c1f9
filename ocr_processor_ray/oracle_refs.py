"""Single-threaded reference implementations behind driver-visible oracles.

For query semantics no SQL engine can express (hash kernels, mergeable
sketches, quantized k-means, deterministic codec stubs), the oracle is
the same trick the flagship extraction uses (queries_catalog
``ensure_oracle_inputs``; reference analog: the sidecar text file as
the authoritative artifact, ocr_combined.py:169,196): recompute the
query's output with a plain single-process loop — no Ray, no
distributed kernels, no batching — materialize it as an EXPECTED
parquet, and let DuckDB compare it against the distributed pipeline's
result. A green row proves the distributed orchestration (block
splits, shuffles, actor pools, tree folds) preserved the sequential
specification exactly.

Independence policy, stated per function: hash FORMULAS shared with
the production path (FNV-1a constants, blake2b token hashing, the HLL
register layout) are the operator's *specification* — reimplementing
them with different constants would test nothing. What each reference
deliberately does NOT share is the production *orchestration*: the
vectorized batch kernels, candidate bucketing, tree folds, actor
pools, and groupby plumbing. Where even the scalar kernel is shared
(``simhash64``), that function is already the documented per-doc spec
that the production batch kernel is tested against.

Everything here is bounded: references run over the sf0.001/sf0.01
oracle corpora (hundreds to thousands of rows) during
``ensure_oracle_inputs`` — never in the hot path, never at bench scale.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa

# bump when any reference semantics change so stale expected-parquet
# caches are never read (mirrors _EXTRACT_SEMANTICS_VERSION)
REF_VERSION = 1


# ------------------------------------------------------------ fingerprint


def _ref_fnv1a(data: bytes) -> int:
    """Pure-int FNV-1a 64 (independent of functions.text's numpy-scalar
    variant; the constants ARE the spec)."""
    h = 14695981039346656037
    for b in data:
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


def _ref_fingerprint(text: str, window: int = 8) -> int:
    data = text.encode("utf-8")
    if len(data) <= window:
        return _ref_fnv1a(data) - (1 << 63)
    best = min(
        _ref_fnv1a(data[i : i + window])
        for i in range(0, len(data) - window + 1, 4)
    )
    return best - (1 << 63)


def ref_doc_fingerprint(docs: pa.Table) -> pa.Table:
    """(doc_id, fp) — spec for queries 'doc_fingerprint'."""
    fps = [_ref_fingerprint(t) for t in docs["text"].to_pylist()]
    return pa.table(
        {
            "doc_id": docs["doc_id"],
            "fp": pa.array(fps, pa.int64()),
        }
    )


# ------------------------------------------------------ compression ratio


def ref_doc_compression_ratio(docs: pa.Table) -> pa.Table:
    """(doc_id, compress_per_10k). zlib level 6 IS the spec; the same
    container's zlib runs on both sides, so the compare verifies the
    distributed batching around it."""
    out = []
    for t in docs["text"].to_pylist():
        raw = t.encode("utf-8")
        out.append(len(zlib.compress(raw, 6)) * 10_000 // max(len(raw), 1))
    return pa.table(
        {
            "doc_id": docs["doc_id"],
            "compress_per_10k": pa.array(out, pa.int64()),
        }
    )


# ----------------------------------------------------------- simhash pairs


def ref_simhash_pairs(docs: pa.Table, max_hamming: int = 3) -> pa.Table:
    """(id_a, id_b, hamming) by BRUTE FORCE — all O(n²) pairs, no
    bucketing, no pigeonhole. ``simhash64`` is the documented per-doc
    spec (dedup.py) that the production ``batch_simhash64`` kernel is
    A/B-tested against; the brute-force pair scan here is what makes
    this an orchestration oracle: the production path's quarter-key LSH
    + hashed candidate buckets must recover EXACTLY this set (pigeonhole
    guarantees it below the 200-member bucket cap)."""
    from ocr_processor_ray.functions.dedup import simhash64

    ids = docs["doc_id"].to_pylist()
    hs = [simhash64(t) + (1 << 63) for t in docs["text"].to_pylist()]
    order = np.argsort(np.asarray(ids))
    ids = [ids[i] for i in order]
    hs = [hs[i] for i in order]
    a, b, d = [], [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            dist = bin(hs[i] ^ hs[j]).count("1")
            if dist <= max_hamming:
                a.append(ids[i])
                b.append(ids[j])
                d.append(dist)
    return pa.table(
        {
            "id_a": pa.array(a, pa.int64()),
            "id_b": pa.array(b, pa.int64()),
            "hamming": pa.array(d, pa.int64()),
        }
    )


# --------------------------------------------------------- sequence packing


def ref_pack_sequences(
    docs: pa.Table, capacity: int = 128, num_buckets: int = 16
) -> pa.Table:
    """(doc_id, n_tokens, pack_id) — single-threaded first-fit-decreasing
    per hash bucket. Shares the token-count kernel and the bucket hash
    (both are the operator's spec); the FFD loop is reimplemented plain."""
    import pandas as pd

    from ocr_processor_ray.functions.hashing import stable_hash_array
    from ocr_processor_ray.functions.text import add_token_count

    t = add_token_count(docs)
    ids = t["doc_id"].to_pylist()
    toks = t["n_tokens"].to_pylist()
    obj_ids = np.asarray(pd.Series(ids), dtype=object)
    buckets = (stable_hash_array(obj_ids) % num_buckets).astype(int)

    per_bucket: dict[int, list[tuple[int, int]]] = {}
    for did, n, bk in zip(ids, toks, buckets):
        per_bucket.setdefault(int(bk), []).append((int(n), int(did)))

    out = []
    for bk, rows in per_bucket.items():
        rows.sort(key=lambda r: (-r[0], r[1]))
        bins: list[int] = []
        for n, did in rows:
            placed = None
            for i, rem in enumerate(bins):
                if n <= rem:
                    placed = i
                    break
            if placed is None:
                bins.append(max(capacity - n, 0))
                placed = len(bins) - 1
            else:
                bins[placed] -= n
            out.append((did, n, f"{bk}:{placed}"))
    out.sort()
    return pa.table(
        {
            "doc_id": pa.array([o[0] for o in out], pa.int64()),
            "n_tokens": pa.array([o[1] for o in out], pa.int64()),
            "pack_id": pa.array([o[2] for o in out], pa.string()),
        }
    )


# ------------------------------------------------------------- HyperLogLog

_HLL_P = 12
_HLL_M = 1 << _HLL_P
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)


def _ref_hll_registers(values) -> np.ndarray:
    """Scalar-int register builder (the production one is vectorized
    numpy over uint64 lanes; register layout/hash are the spec)."""
    regs = np.zeros(_HLL_M, dtype=np.uint8)
    mask64 = (1 << 64) - 1
    low = (1 << _HLL_P) - 1
    for v in values:
        h = int.from_bytes(
            hashlib.blake2b(str(v).encode("utf-8"), digest_size=8).digest(), "big"
        )
        idx = h >> (64 - _HLL_P)
        rest = ((h << _HLL_P) | low) & mask64
        rank = 64 - rest.bit_length() + 1
        if rank > regs[idx]:
            regs[idx] = rank
    return regs


def _ref_hll_estimate(regs: np.ndarray) -> int:
    est = _HLL_ALPHA * _HLL_M * _HLL_M / np.sum(2.0 ** (-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * _HLL_M and zeros > 0:
        est = _HLL_M * np.log(_HLL_M / zeros)
    return round(float(est))


def ref_approx_distinct_users(events: pa.Table) -> pa.Table:
    n = _ref_hll_estimate(_ref_hll_registers(events["user_id"].to_pylist()))
    return pa.table({"n_users_approx": pa.array([n], pa.int64())})


def ref_approx_users_by_type(events: pa.Table) -> pa.Table:
    per: dict[str, list] = {}
    for et, u in zip(
        events["event_type"].to_pylist(), events["user_id"].to_pylist()
    ):
        per.setdefault(et, []).append(u)
    types = sorted(per)
    ests = [_ref_hll_estimate(_ref_hll_registers(per[t])) for t in types]
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "n_approx": pa.array(ests, pa.int64()),
        }
    )


# ---------------------------------------------------- quantized k-means

_KM_SCALE = 1 << 20  # fixed-point quantum — the algorithm's spec constant


def _ref_normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _ref_vec_matrix(tbl: pa.Table, vec_col: str) -> np.ndarray:
    arr = tbl[vec_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
    return flat.reshape(len(arr), -1)


def _ref_kmeans(
    tbl: pa.Table, id_col: str, vec_col: str, k: int, iters: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Single-threaded Lloyd with the production's integer-quantized
    update rule (round(x·2²⁰) int64 partial sums — that quantization is
    exactly what makes the distributed fold order-free, so the sequential
    recomputation lands on identical centroids). Returns (centroids
    float64, assign int64, sim_q int64) with rows in table order."""
    ids = np.asarray(tbl[id_col].to_pylist(), dtype=np.int64)
    m32 = _ref_vec_matrix(tbl, vec_col)
    # production seeds via global_topk ascending on id: k lowest ids,
    # rows in ascending-id order (centroid row order = cluster numbering)
    seed_rows = np.argsort(ids, kind="stable")[: min(k, len(ids))]
    centroids = _ref_normalize(m32[seed_rows].astype(np.float64))
    kk = centroids.shape[0]

    def det_sims(m, cents):
        # same per-(row,centroid) float64 pairwise reduction as
        # similarity._det_sims — the formula IS the spec (it is what
        # makes the production path layout-independent)
        return (
            m[:, None, :].astype(np.float64) * cents[None, :, :].astype(np.float64)
        ).sum(axis=2)

    norm32 = _ref_normalize(m32)
    q = np.round(norm32.astype(np.float64) * _KM_SCALE).astype(np.int64)
    for _ in range(iters):
        cents32 = centroids.astype(np.float32)
        assign = np.argmax(det_sims(norm32, cents32), axis=1)
        counts = np.bincount(assign, minlength=kk).astype(np.int64)
        sums = np.zeros((kk, m32.shape[1]), dtype=np.int64)
        for c in range(kk):
            mask = assign == c
            if mask.any():
                sums[c] = q[mask].sum(axis=0)
        nonzero = counts > 0
        new = centroids.copy()
        new[nonzero] = sums[nonzero] / (
            counts[nonzero, None].astype(np.float64) * _KM_SCALE
        )
        centroids = _ref_normalize(new)

    cents32 = centroids.astype(np.float32)
    sims = det_sims(norm32, cents32)
    assign = np.argmax(sims, axis=1).astype(np.int64)
    best = sims[np.arange(len(assign)), assign]
    sim_q = np.round(best.astype(np.float64) * _KM_SCALE).astype(np.int64)
    return centroids, assign, sim_q


def ref_embedding_kmeans(emb: pa.Table, k: int = 8, iters: int = 3) -> pa.Table:
    """(cluster, n_points, mean_sim) — spec for 'embedding_kmeans'."""
    _, assign, sim_q = _ref_kmeans(emb, "vec_id", "embedding", k, iters)
    clusters = sorted(set(assign.tolist()))
    n_points, mean_sim = [], []
    for c in clusters:
        mask = assign == c
        n = int(mask.sum())
        n_points.append(n)
        mean_sim.append(float(sim_q[mask].sum()) / float(n * _KM_SCALE))
    return pa.table(
        {
            "cluster": pa.array(clusters, pa.int64()),
            "n_points": pa.array(n_points, pa.int64()),
            "mean_sim": pa.array(mean_sim, pa.float64()),
        }
    )


def ref_semantic_dedup(
    emb: pa.Table,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    threshold: float = 0.95,
    kmeans_iters: int = 2,
) -> pa.Table:
    """Kept (id, cluster) after SemDeDup greedy within-cluster pruning —
    single-threaded, same chunked lower-triangle rule (1024-row chunks,
    drop row i iff cosine ≥ threshold to ANY lower-id member)."""
    centroids, assign, _ = _ref_kmeans(emb, id_col, vec_col, k, kmeans_iters)
    ids = np.asarray(emb[id_col].to_pylist(), dtype=np.int64)
    norm32 = _ref_normalize(_ref_vec_matrix(emb, vec_col))
    keep_ids, keep_cl = [], []
    for c in sorted(set(assign.tolist())):
        rows = np.where(assign == c)[0]
        order = np.argsort(ids[rows])
        rows = rows[order]
        m = norm32[rows].astype(np.float32)
        n = len(rows)
        dropped = np.zeros(n, dtype=bool)
        for s in range(1, n, 1024):
            e = min(s + 1024, n)
            sims = m[s:e] @ m[:e].T
            below = np.arange(e)[None, :] < np.arange(s, e)[:, None]
            dropped[s:e] = ((sims >= threshold) & below).any(axis=1)
        for i in np.where(~dropped)[0]:
            keep_ids.append(int(ids[rows[i]]))
            keep_cl.append(int(c))
    out = sorted(zip(keep_ids, keep_cl))
    return pa.table(
        {
            id_col: pa.array([o[0] for o in out], pa.int64()),
            "cluster": pa.array([o[1] for o in out], pa.int64()),
        }
    )


# ------------------------------------------------------------ ANN / LSH

def _ref_norm32(tbl: pa.Table, vec_col: str) -> np.ndarray:
    return _ref_normalize(_ref_vec_matrix(tbl, vec_col))


def _ref_query_vec(emb: pa.Table) -> np.ndarray:
    idx = emb["vec_id"].to_pylist().index(0)
    return np.asarray(emb["embedding"][idx].as_py(), dtype=np.float32)


def ref_ann_topk_lsh(
    emb: pa.Table, k: int = 10, n_bits: int = 8, n_tables: int = 4
) -> pa.Table:
    """(rank, vec_id) — sequential restatement of lsh_topk: probe the
    query's bucket in every table over the WHOLE corpus at once (no
    batching, no global_topk), score candidates with the same per-row
    float64 einsum, order by (sim desc, id asc). hyperplane_signs and
    the rounding ARE the spec (both layout-independent by construction);
    what this does NOT share is the distributed probe + bounded
    candidate merge the compare is meant to prove."""
    from ocr_processor_ray.functions.similarity import hyperplane_signs

    ids = np.asarray(emb["vec_id"].to_pylist(), dtype=np.int64)
    m = _ref_norm32(emb, "embedding")
    q = _ref_normalize(_ref_query_vec(emb).reshape(1, -1))
    dim = m.shape[1]
    powers = 1 << np.arange(n_bits, dtype=np.uint64)
    mask = np.zeros(len(m), dtype=bool)
    for t in range(n_tables):
        qk = int(hyperplane_signs(q, dim, n_bits, t)[0] @ powers)
        keys = hyperplane_signs(m, dim, n_bits, t) @ powers
        mask |= keys == qk
    sims = np.einsum(
        "ij,j->i", m[mask].astype(np.float64), q[0].astype(np.float64)
    )
    cand_ids = ids[mask]
    order = np.lexsort((cand_ids, -np.round(sims, 4)))[:k]
    return pa.table(
        {
            "rank": pa.array(range(1, len(order) + 1), pa.int64()),
            "vec_id": pa.array(cand_ids[order], pa.int64()),
        }
    )


def ref_ann_topk_ivf(
    emb: pa.Table,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 6,
    train_sample: int = 2048,
    seed: int = 1231,
) -> pa.Table:
    """(rank, vec_id) — sequential restatement of ivf_topk. Training is
    the shared driver-side spec (_kmeans_cosine over the first
    ``train_sample`` rows in table order — exactly what ds.limit hands
    the production path); assignment/scoring reuse the layout-
    independent formulas; the distributed probe + merge is what the
    compare proves."""
    from ocr_processor_ray.functions.similarity import (
        _det_sims,
        _kmeans_cosine,
    )

    ids = np.asarray(emb["vec_id"].to_pylist(), dtype=np.int64)
    sample = _ref_vec_matrix(emb.slice(0, train_sample), "embedding")
    centroids = _kmeans_cosine(sample, n_cells, seed)

    q = _ref_normalize(
        _ref_query_vec(emb).astype(np.float64).reshape(1, -1)
    )[0]
    probe_cells = set(
        int(c) for c in np.argsort(-(centroids @ q))[:n_probe]
    )
    m = _ref_normalize(_ref_vec_matrix(emb, "embedding").astype(np.float64))
    cells = np.argmax(_det_sims(m, centroids), axis=1)
    mask = np.isin(cells, list(probe_cells))
    sims = np.einsum("ij,j->i", m[mask], q)
    cand_ids = ids[mask]
    order = np.lexsort((cand_ids, -sims))[:k]
    return pa.table(
        {
            "rank": pa.array(range(1, len(order) + 1), pa.int64()),
            "vec_id": pa.array(cand_ids[order], pa.int64()),
        }
    )


def ref_embedding_near_dup(
    emb: pa.Table,
    threshold: float = 0.45,
    n_bits: int = 4,
    n_tables: int = 8,
    round_to: int = 5,
    max_bucket: int = 500,
) -> pa.Table:
    """(id_a, id_b, cos_sim) — sequential restatement of
    embedding_near_dup_pairs: same adaptive key width, per-table
    bucketing, recursive overflow subdivision and rotating-star rule,
    then exact float64 cosine verification of the deduped candidate
    set. The sign/key formulas are the spec; the bucketed groupby +
    two-exchange verify orchestration is what the compare proves."""
    from ocr_processor_ray.functions.similarity import (
        _LSH_SIGN_BITS,
        _adaptive_key_bits,
        hyperplane_signs,
    )

    ids = np.asarray(emb["vec_id"].to_pylist(), dtype=np.int64)
    m32 = _ref_norm32(emb, "embedding")
    n = len(ids)
    kb = _adaptive_key_bits(n, n_bits, max(32, max_bucket // 4))
    key_mask = (1 << kb) - 1
    powers = 1 << np.arange(_LSH_SIGN_BITS, dtype=np.uint64)

    cand: set[tuple[int, int]] = set()
    for t in range(n_tables):
        fk = (hyperplane_signs(m32, m32.shape[1], _LSH_SIGN_BITS, t) @ powers).astype(
            np.int64
        )
        by_key: dict[int, list[int]] = {}
        for i, key in enumerate(fk & key_mask):
            by_key.setdefault(int(key), []).append(i)
        for rows in by_key.values():
            stack = [(np.asarray(rows), kb)]
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
                    center = t % u.size
                    others = np.delete(u, center)
                    for o in others:
                        a, b = sorted((int(u[center]), int(o)))
                        cand.add((a, b))
                else:
                    for i in range(u.size):
                        for j in range(i + 1, u.size):
                            cand.add((int(u[i]), int(u[j])))

    # exact verify on float64-normalized RAW vectors (the pay columns
    # cross the production exchange as list<float64> casts of the raw
    # embedding — never the float32 sign path)
    m64 = _ref_normalize(_ref_vec_matrix(emb, "embedding").astype(np.float64))
    row_of = {int(i): r for r, i in enumerate(ids)}
    a_out, b_out, c_out = [], [], []
    for a, b in sorted(cand):
        cos = float(
            np.einsum("j,j->", m64[row_of[a]], m64[row_of[b]])
        )
        if cos >= threshold:
            a_out.append(a)
            b_out.append(b)
            c_out.append(round(cos, round_to))
    return pa.table(
        {
            "id_a": pa.array(a_out, pa.int64()),
            "id_b": pa.array(b_out, pa.int64()),
            "cos_sim": pa.array(c_out, pa.float64()),
        }
    )


_PCA_SCALE = 1 << 16  # must match similarity._PCA_SCALE (the spec quantum)


def ref_embedding_pca(emb: pa.Table, n_components: int = 2) -> pa.Table:
    """(vec_id, pc1, pc2) — sequential restatement of distributed_pca +
    projection: the same int64-quantized sufficient statistics computed
    in ONE pass over the whole table (integer sums are fold-order-free,
    so the sequential totals equal the distributed tree-fold's exactly),
    the same dim×dim eigh, sign canonicalization, and the same per-row
    float64 pairwise projection."""
    ids = emb["vec_id"]
    m = _ref_vec_matrix(emb, "embedding").astype(np.float64)
    q = np.round(m * _PCA_SCALE).astype(np.int64)
    n = m.shape[0]
    sx = q.sum(axis=0)
    sxx = q.T @ q
    mean = sx.astype(np.float64) / (n * _PCA_SCALE)
    cov = sxx.astype(np.float64) / (n * _PCA_SCALE**2) - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T.copy()
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    centered = m - mean
    proj = (centered[:, None, :] * comps.astype(np.float64)[None, :, :]).sum(axis=2)
    return pa.table(
        {
            "vec_id": ids,
            "pc1": pa.array(proj[:, 0], pa.float64()),
            "pc2": pa.array(proj[:, 1], pa.float64()),
        }
    )


# -------------------------------------------------------- media stub specs


def _ref_fake_decode(data: bytes) -> tuple[int, int, float, int]:
    digest = hashlib.blake2b(data, digest_size=24).digest()
    return (
        64 + digest[0] % 192,
        64 + digest[1] % 192,
        round(digest[2] / 255.0, 6),
        int.from_bytes(digest[8:16], "big") - (1 << 63),
    )


def ref_media_decode(media: pa.Table) -> pa.Table:
    """Expected 'media_decode' output: base columns minus payload plus
    the stub features recomputed per row (blake2b formula = the spec)."""
    w, h, luma, ph = [], [], [], []
    for data in media["payload"].to_pylist():
        fw, fh, fl, fp = _ref_fake_decode(data or b"")
        w.append(fw)
        h.append(fh)
        luma.append(fl)
        ph.append(fp)
    return (
        media.drop_columns(["payload"])
        .append_column("dec_width", pa.array(w, pa.int32()))
        .append_column("dec_height", pa.array(h, pa.int32()))
        .append_column("mean_luma", pa.array(luma, pa.float64()))
        .append_column("phash", pa.array(ph, pa.int64()))
    )


def ref_media_resize(media: pa.Table, target=(224, 224)) -> pa.Table:
    """Expected 'media_resize' output with the resized payload reduced
    to (md5, length) for the compare channel (the same reduction
    media_audio_chunks uses for its PCM slices)."""
    tw, th = target
    md5s, lens = [], []
    for data in media["payload"].to_pylist():
        payload = hashlib.blake2b(
            (data or b"") + f"{tw}x{th}".encode(), digest_size=64
        ).digest()
        md5s.append(hashlib.md5(payload).hexdigest())
        lens.append(len(payload))
    return (
        media.drop_columns(["payload"])
        .append_column("rs_width", pa.array([tw] * media.num_rows, pa.int32()))
        .append_column("rs_height", pa.array([th] * media.num_rows, pa.int32()))
        .append_column("payload_md5", pa.array(md5s, pa.string()))
        .append_column("payload_bytes", pa.array(lens, pa.int64()))
    )


def ref_media_frame_sample(media: pa.Table, n_frames: int = 4) -> pa.Table:
    """Expected 'media_frame_sample' rows, frame bytes reduced to
    (md5, length)."""
    ids, fidx, fts, fmd5, flen = [], [], [], [], []
    for mid, data in zip(
        media["media_id"].to_pylist(), media["payload"].to_pylist()
    ):
        data = data or b""
        dur_ms = 1000 + (len(data) * 37) % 600000
        for i in range(n_frames):
            payload = hashlib.blake2b(data + bytes([i]), digest_size=32).digest()
            ids.append(mid)
            fidx.append(i)
            fts.append(int(i * dur_ms / n_frames))
            fmd5.append(hashlib.md5(payload).hexdigest())
            flen.append(len(payload))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int32()),
            "ts_ms": pa.array(fts, pa.int64()),
            "frame_md5": pa.array(fmd5, pa.string()),
            "frame_bytes": pa.array(flen, pa.int64()),
        }
    )


def _ref_fake_embed(data: bytes) -> np.ndarray:
    raw = (
        hashlib.blake2b(data, digest_size=64).digest()
        + hashlib.blake2b(data, digest_size=64, person=b"lane2").digest()
    )
    v = np.frombuffer(raw, dtype=np.uint8).astype(np.float32) / 255.0
    v = v.reshape(2, 64).sum(axis=0) - 1.0
    n = float(np.linalg.norm(v))
    return v / n if n else v


def ref_media_embed_dedup(
    media: pa.Table, k: int = 4, threshold: float = 0.999
) -> pa.Table:
    """Expected 'media_embed_dedup': stub-embed every payload, then the
    sequential SemDeDup rule (kmeans_iters=2, the semantic_dedup
    default) — kept (media_id, cluster)."""
    vecs = np.stack(
        [_ref_fake_embed(d or b"") for d in media["payload"].to_pylist()]
    )
    emb = pa.table(
        {
            "media_id": media["media_id"],
            "emb": pa.array(list(vecs), type=pa.list_(pa.float32())),
        }
    )
    return ref_semantic_dedup(
        emb, id_col="media_id", vec_col="emb", k=k, threshold=threshold,
        kmeans_iters=2,
    )
