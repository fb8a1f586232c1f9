"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes (100 TB honest):

* **exact**      — content-hash column (vectorized) → ``groupby(hash)``
                   keep-first. One shuffle keyed by the hash; group
                   sizes are duplicate-cluster sizes (tiny).
* **MinHash-LSH**— per-batch: shingle → 64-perm minhash → 8 bands × 8
                   rows; explode to ``(band, band_key, doc_id)`` rows →
                   ``groupby(band, band_key)`` emits candidate pairs →
                   verify with exact shingle Jaccard (pair-local).
                   The shuffle moves only (band_key, doc_id) pairs —
                   16 bytes/row/band — never document text.
* **SimHash**    — 64-bit simhash per doc; bucket by the 4 16-bit
                   quarters (any pair within Hamming ≤ 3 must share at
                   least one exact quarter — pigeonhole); verify real
                   Hamming distance inside buckets.

All hashing is blake2b-seeded and deterministic across workers.
"""

from __future__ import annotations

import hashlib
from typing import Iterable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Count, Min

# ------------------------------------------------------------------ exact


def add_md5(batch: pa.Table, column: str = "text", out: str = "h") -> pa.Table:
    hs = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch[column].to_pylist()]
    return batch.append_column(out, pa.array(hs, pa.string()))


def exact_dedup_groups(ds: Dataset, id_col: str = "doc_id", text_col: str = "text") -> Dataset:
    """→ one row per distinct content hash: (h, doc_id=min id, n).

    Arrow two-phase hash aggregation (partials per batch, one combine);
    when the distinct-hash set outgrows a single worker, swap the final
    stage for ``groupby("h").aggregate(...)`` which partitions the key
    space."""
    from ocr_processor_ray.functions.agg import two_phase_agg

    hashed = ds.map_batches(
        lambda t: add_md5(t, text_col).select(["h", id_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return two_phase_agg(
        hashed, ["h"], [(id_col, "min", id_col), (id_col, "count", "n")]
    )


# ---------------------------------------------------------------- minhash

N_PERM = 64
N_BANDS = 8
ROWS_PER_BAND = N_PERM // N_BANDS
_MERSENNE = (1 << 61) - 1


def _perm_params(n_perm: int, seed: int = 12345) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) for universal hashing h_i(x) = (a_i*x + b_i) mod p."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    return a, b


_PERM_A, _PERM_B = _perm_params(N_PERM)


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashes of word k-shingles (uint64). Short docs fall back to the
    whole-text hash so every doc has at least one shingle."""
    words = text.split()
    if len(words) < k:
        grams: Iterable[str] = [" ".join(words)] if words else [""]
    else:
        grams = (" ".join(words[i : i + k]) for i in range(len(words) - k + 1))
    out = np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(g.encode("utf-8"), digest_size=8).digest(), "big")
            for g in grams
        ),
        dtype=np.uint64,
    )
    return np.unique(out)


def minhash_signature(text: str, k: int = 3) -> np.ndarray:
    """64-perm minhash signature (uint64[N_PERM]) — vectorized over shingles."""
    sh = shingle_hashes(text, k)
    if sh.size == 0:
        return np.zeros(N_PERM, dtype=np.uint64)
    # (n_perm, n_shingles) universal hashes, min over shingles
    vals = (_PERM_A[:, None] * (sh[None, :] % _MERSENNE) + _PERM_B[:, None]) % _MERSENNE
    return vals.min(axis=1).astype(np.uint64)


def minhash_band_rows(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Explode each doc into N_BANDS rows: (band, band_key, doc_id).

    band_key is a 64-bit digest of the band's ROWS_PER_BAND minhash
    values — the LSH bucket key.
    """
    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    out_band, out_key, out_id = [], [], []
    for did, text in zip(ids, texts):
        sig = minhash_signature(text)
        for band in range(N_BANDS):
            seg = sig[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
            key = hashlib.blake2b(seg.tobytes(), digest_size=8).digest()
            out_band.append(band)
            out_key.append(int.from_bytes(key, "big") - (1 << 63))
            out_id.append(did)
    return pa.table(
        {
            "band": pa.array(out_band, pa.int32()),
            "band_key": pa.array(out_key, pa.int64()),
            "doc_id": pa.array(out_id, pa.int64()),
        }
    )


MAX_BUCKET_MEMBERS = 50  # caps quadratic candidate blowup per bucket


def _band_pairs(group: pa.Table) -> pa.Table:
    """Candidate pairs from ONE BAND's rows: bucket by band_key in-task
    (a dict), emit pairs per bucket. Grouping by band (8 groups) instead
    of by (band, band_key) (tens of thousands of tiny groups) avoids the
    sort-shuffle's per-group overhead; identical candidate set. At
    extreme scale (a band's rows exceeding one worker) fall back to
    ``groupby(["band", "band_key"])`` — stated here, SURVEY §4.2.
    """
    keys = group["band_key"].to_pylist()
    ids = group["doc_id"].to_pylist()
    buckets: dict[int, list[int]] = {}
    for k, d in zip(keys, ids):
        buckets.setdefault(k, []).append(d)
    a, b = [], []
    for members in buckets.values():
        if len(members) < 2:
            continue
        members = sorted(members)[:MAX_BUCKET_MEMBERS]
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a.append(members[i])
                b.append(members[j])
    return pa.table({"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())})


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = set(shingle_hashes(text_a, k)), set(shingle_hashes(text_b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_lsh_pairs(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
) -> Dataset:
    """Near-duplicate pairs with exact-Jaccard verification.

    Verification broadcasts the (id → text) map via ``ray.put`` once and
    reads it inside each verify batch — a small-side broadcast lookup,
    NOT a shuffle join (valid while the candidate doc set fits the
    object store; at 100 TB the verify side switches to a bucketed
    self-join on id ranges).
    """
    import ray

    bands = ds.map_batches(
        lambda t: minhash_band_rows(t, id_col, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pairs = bands.groupby("band").map_groups(_band_pairs, batch_format="pyarrow")
    # drop duplicate candidate pairs produced by multiple agreeing bands
    # (arrow two-phase: pair count fits one combine worker by construction)
    from ocr_processor_ray.functions.agg import two_phase_agg

    pairs = two_phase_agg(pairs, ["id_a", "id_b"], [("id_a", "count", "n_bands")])

    # one execution for the lookup map: zipping columns from two separate
    # executions would pair ids with texts from different block orders
    id_text = ds.select_columns([id_col, text_col]).to_pandas()
    texts_ref = ray.put(dict(zip(id_text[id_col].tolist(), id_text[text_col].tolist())))

    def verify(batch: pa.Table) -> pa.Table:
        texts = ray.get(texts_ref)
        ja = [
            round(jaccard(texts[a], texts[b]), 6)
            for a, b in zip(batch["id_a"].to_pylist(), batch["id_b"].to_pylist())
        ]
        batch = batch.append_column("jaccard", pa.array(ja, pa.float64()))
        return batch.filter(pc.greater_equal(batch["jaccard"], threshold))

    return pairs.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------- simhash


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (blake2b token hashes), sign-folded."""
    acc = np.zeros(64, dtype=np.int64)
    for w in text.split():
        h = int.from_bytes(hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest(), "big")
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    val = 0
    for i in range(64):
        if acc[i] > 0:
            val |= 1 << i
    return val - (1 << 63)


def add_simhash(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    sh = [simhash64(t) for t in batch[text_col].to_pylist()]
    return pa.table(
        {
            id_col: batch[id_col],
            "simhash": pa.array(sh, pa.int64()),
        }
    )


def simhash_pairs(ds: Dataset, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = 3) -> Dataset:
    """Near-dup pairs by SimHash: bucket on each 16-bit quarter, verify
    Hamming distance inside buckets (pigeonhole: dist ≤ 3 ⇒ one of the
    4 quarters is identical)."""
    hashed = ds.map_batches(
        lambda t: add_simhash(t, id_col, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def explode_quarters(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        shs = batch["simhash"].to_pylist()
        q_i, q_k, q_id, q_sh = [], [], [], []
        for did, sh in zip(ids, shs):
            u = sh + (1 << 63)
            for q in range(4):
                q_i.append(q)
                q_k.append((u >> (16 * q)) & 0xFFFF)
                q_id.append(did)
                q_sh.append(sh)
        return pa.table(
            {
                "q": pa.array(q_i, pa.int32()),
                "qkey": pa.array(q_k, pa.int32()),
                id_col: pa.array(q_id, pa.int64()),
                "simhash": pa.array(q_sh, pa.int64()),
            }
        )

    def quarter_verify(group: pa.Table) -> pa.Table:
        """One quarter's rows: bucket by qkey in-task, verify Hamming per
        bucket (same coarse-group rationale as _band_pairs)."""
        buckets: dict[int, list[tuple[int, int]]] = {}
        for k, did, sh in zip(
            group["qkey"].to_pylist(), group[id_col].to_pylist(), group["simhash"].to_pylist()
        ):
            buckets.setdefault(k, []).append((did, sh))
        a, b, d = [], [], []
        for rows in buckets.values():
            if len(rows) < 2:
                continue
            rows = sorted(rows)[:200]
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    if rows[i][0] == rows[j][0]:
                        continue
                    dist = bin((rows[i][1] + (1 << 63)) ^ (rows[j][1] + (1 << 63))).count("1")
                    if dist <= max_hamming:
                        a.append(rows[i][0])
                        b.append(rows[j][0])
                        d.append(dist)
        return pa.table(
            {
                "id_a": pa.array(a, pa.int64()),
                "id_b": pa.array(b, pa.int64()),
                "hamming": pa.array(d, pa.int32()),
            }
        )

    exploded = hashed.map_batches(explode_quarters, batch_format="pyarrow")
    pairs = exploded.groupby("q").map_groups(quarter_verify, batch_format="pyarrow")
    # a pair can match in several quarters — dedup (two-phase arrow agg)
    from ocr_processor_ray.functions.agg import two_phase_agg

    return two_phase_agg(pairs, ["id_a", "id_b"], [("hamming", "min", "hamming")])
