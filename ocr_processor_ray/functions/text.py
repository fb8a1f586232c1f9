"""Text-analysis stages: language ID, quality scoring, token counting,
document fingerprinting.

All are stateless vectorized ``map_batches`` functions or cheap
stateful classes; all are deterministic (fixed constants, no models).
Generalizes the reference's text-side scalar functions (string scans,
checksum identity; security_validator.py:392-415,463-472).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------- tokens

# BPE-ish pre-tokenization: word pieces OR single non-space symbols
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
WORD_RE = r"\S+"


def add_word_count(batch: pa.Table, column: str = "text", out: str = "n_words") -> pa.Table:
    n = pc.count_substring_regex(batch[column], pattern=WORD_RE)
    return batch.append_column(out, pc.cast(n, pa.int64()))


def add_token_count(batch: pa.Table, column: str = "text", out: str = "n_tokens") -> pa.Table:
    n = pc.count_substring_regex(batch[column], pattern=TOKEN_RE)
    return batch.append_column(out, pc.cast(n, pa.int64()))


# ---------------------------------------------------------------- lang id

# minimal stopword profiles for the languages present in the corpus;
# deterministic n-gram-free heuristic: argmax of stopword hit counts,
# ties broken by fixed language order, 'und' (undetermined) when no hits.
_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the of and to in a is that for it was on are as with be at by this".split()),
    "de": frozenset("der die das und ist nicht ein eine zu den von mit auf für im sich".split()),
    "fr": frozenset("le la les de des et est un une du en que pour dans qui sur pas".split()),
    "es": frozenset("el la los las de y es un una del en que por para con no se".split()),
}
_LANG_ORDER = ("en", "de", "fr", "es")
_SPLIT_RE = re.compile(r"[^\w]+", re.U)


class LangId:
    """Actor-pool language identifier (stopword-profile heuristic).

    Callable-class form so the profiles are built once per actor —
    the A2 pattern (magic.Magic detectors built once,
    security_validator.py:56-58).
    """

    def __init__(self, column: str = "text", out: str = "lang_pred"):
        self.column = column
        self.out = out
        self.profiles = [(lang, _STOPWORDS[lang]) for lang in _LANG_ORDER]

    def predict_one(self, text: str) -> str:
        toks = _SPLIT_RE.split(text.lower())
        best_lang, best_hits = "und", 0
        for lang, sw in self.profiles:
            hits = sum(1 for t in toks if t in sw)
            if hits > best_hits:
                best_lang, best_hits = lang, hits
        return best_lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.predict_one(t) for t in batch[self.column].to_pylist()]
        return batch.append_column(self.out, pa.array(preds, pa.string()))


# ---------------------------------------------------------------- quality

_PUNCT_RE = r"[^\w\s]"


def add_quality_features(batch: pa.Table, column: str = "text") -> pa.Table:
    """Vectorized quality features: char/word counts, punctuation ratio,
    mean word length, stopword(en) ratio — rounded to 6 dp so results
    hash-compare stably across engines."""
    text = batch[column]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_words = pc.cast(pc.count_substring_regex(text, pattern=WORD_RE), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(text, pattern=_PUNCT_RE), pa.int64())
    n_stop = pc.cast(
        pc.count_substring_regex(
            pc.utf8_lower(text),
            pattern=r"\b(?:the|of|and|to|in|is|that|for|it|was)\b",
        ),
        pa.int64(),
    )
    chars_f = pc.cast(pc.max_element_wise(n_chars, 1), pa.float64())
    words_f = pc.cast(pc.max_element_wise(n_words, 1), pa.float64())
    punct_ratio = pc.round(pc.divide(pc.cast(n_punct, pa.float64()), chars_f), ndigits=6)
    stop_ratio = pc.round(pc.divide(pc.cast(n_stop, pa.float64()), words_f), ndigits=6)
    mean_word_len = pc.round(pc.divide(pc.cast(n_chars, pa.float64()), words_f), ndigits=6)
    for name, col in (
        ("n_chars_q", n_chars),
        ("n_words", n_words),
        ("punct_ratio", punct_ratio),
        ("stop_ratio", stop_ratio),
        ("mean_word_len", mean_word_len),
    ):
        batch = batch.append_column(name, col)
    return batch


# ------------------------------------------------------------ fingerprint

_FP_BASE = np.uint64(1099511628211)   # FNV-1a prime
_FP_OFFSET = np.uint64(14695981039346656037)


def _fnv1a(data: bytes) -> np.uint64:
    h = _FP_OFFSET
    for b in data:
        h = np.uint64((int(h) ^ b) * int(_FP_BASE) & 0xFFFFFFFFFFFFFFFF)
    return h


def fingerprint_text(text: str, window: int = 8) -> int:
    """Winnowing-style fingerprint: min FNV-1a hash over ``window``-byte
    rolling windows (int64, sign-folded). Stable content identity that
    tolerates neither edits (use MinHash for near-dup) — the analog of
    the reference's SHA-256 content identity (security_validator.py:463-472)
    but cheap enough for a per-row column."""
    data = text.encode("utf-8")
    if len(data) <= window:
        return int(_fnv1a(data)) - (1 << 63)
    best = min(_fnv1a(data[i : i + window]) for i in range(0, len(data) - window + 1, 4))
    return int(best) - (1 << 63)


class Fingerprint:
    def __init__(self, column: str = "text", out: str = "fp", window: int = 8):
        self.column, self.out, self.window = column, out, window

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [fingerprint_text(t, self.window) for t in batch[self.column].to_pylist()]
        return batch.append_column(self.out, pa.array(fps, pa.int64()))


# -------------------------------------------------------- sequence packing


def pack_sequences(
    ds,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    capacity: int = 512,
    num_buckets: int = 16,
):
    """Greedy sequence packing: assign docs to fixed-capacity token bins
    (the training-batch packing step that turns ragged docs into dense
    context windows). First-fit-decreasing runs PER HASH BUCKET — packing
    is inherently sequential, so the parallel unit is a bounded bucket,
    not the corpus; FFD waste is ≤ (11/9·OPT + 1) per bucket and buckets
    only ever lose pairing opportunities ACROSS buckets, never validity.
    A doc longer than ``capacity`` gets a singleton (truncation is the
    trainer's call, not the packer's). Output:
    (id, n_tokens, pack_id:string "bucket:bin"). Deterministic: FFD order
    breaks token ties by id."""

    def tag(b: pa.Table) -> pa.Table:
        from ocr_processor_ray.functions.hashing import stable_hash_array

        ids = np.asarray(b[id_col].to_pandas(), dtype=object)
        bucket = (stable_hash_array(ids) % num_buckets).astype(np.int32)
        return pa.table(
            {
                id_col: b[id_col],
                token_col: pc.cast(b[token_col], pa.int64()),
                "_bucket": pa.array(bucket),
            }
        )

    def pack(g: pa.Table) -> pa.Table:
        bucket = int(g["_bucket"][0].as_py())
        rows = sorted(
            zip(g[token_col].to_pylist(), g[id_col].to_pylist()),
            key=lambda t: (-t[0], t[1]),
        )
        bins: list = []  # remaining capacity per bin
        assign: list = []
        for n, did in rows:
            placed = None
            for i, rem in enumerate(bins):
                if n <= rem:
                    placed = i
                    break
            if placed is None:
                bins.append(max(capacity - n, 0))  # oversize doc → full singleton
                placed = len(bins) - 1
            else:
                bins[placed] -= n
            assign.append((did, n, f"{bucket}:{placed}"))
        assign.sort()
        return pa.table(
            {
                id_col: pa.array([a[0] for a in assign]),
                token_col: pa.array([a[1] for a in assign], pa.int64()),
                "pack_id": pa.array([a[2] for a in assign], pa.string()),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return tagged.groupby("_bucket").map_groups(pack, batch_format="pyarrow")


# ---------------------------------------------------- decontamination


def flag_contaminated(
    ds,
    snippets: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    out: str = "contaminated",
):
    """Benchmark decontamination: flag rows whose text contains any of
    the given benchmark passages (exact substring — the conservative
    n-gram-overlap special case used to keep eval sets out of training
    corpora). → (id_col, out bool) per row.

    Scale shape: the snippet set is a FIXED benchmark — small by
    definition — shipped to workers ONCE via ``ray.put`` and read from
    the local object store per task (never re-serialized per batch);
    the scan is one vectorized ``match_substring`` kernel pass per
    snippet per batch. Cost is O(snippets × corpus bytes); for snippet
    sets beyond a few thousand, swap the inner loop for a compiled
    alternation (same semantics, one pass).
    """
    import ray

    if any(not s for s in snippets):
        raise ValueError("empty snippet matches everything — refuse")
    snip_ref = ray.put(list(snippets))

    def scan(b: pa.Table) -> pa.Table:
        snips = ray.get(snip_ref)
        mask = pa.array(np.zeros(b.num_rows, dtype=bool))
        for s in snips:
            mask = pc.or_(mask, pc.match_substring(b[text_col], pattern=s))
        return pa.table({id_col: b[id_col], out: mask})

    return ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True)


def flag_contaminated_ngrams(
    ds,
    snippets: list[str],
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    out: str = "contaminated",
):
    """Benchmark decontamination by n-gram OVERLAP (the GPT-3 rule:
    a training doc is contaminated if it shares any 13-gram with an
    eval example) — the word-window generalization of
    ``flag_contaminated``'s exact-substring rule: it also catches
    partially quoted / reformatted eval content that substring matching
    misses. → (id_col, out bool) per row.

    Scale shape: the benchmark's n-gram hash sets are computed ONCE on
    the driver (eval sets are small by definition), sorted, shipped via
    ``ray.put``; each batch computes its docs' rolling n-gram hashes
    with the same vectorized polynomial combine the minhash family uses
    (``dedup._rolling_shingles`` — one ``stable_hash_array`` pass per
    batch) and probes membership with ``np.searchsorted``. Cost is
    O(corpus tokens · sizes · log |benchmark n-grams|); nothing
    corpus-sized ever leaves the workers. A snippet SHORTER than ``n``
    words contributes its full-length window (a rolling m-gram with
    m = its word count), so verbatim inclusions of short eval examples
    still match; the distinct window-size count is ≤ n and 1 in the
    common all-snippets-long case.
    """
    import ray

    from ocr_processor_ray.functions.dedup import (
        _rolling_shingles,
        _word_hashes,
    )

    if any(not s.split() for s in snippets):
        raise ValueError("blank snippet matches everything — refuse")

    by_size: dict[int, list[np.ndarray]] = {}
    for s in snippets:
        wh = _word_hashes(s.split())
        m = min(len(wh), n)
        by_size.setdefault(m, []).append(_rolling_shingles(wh, m))
    bench = {
        m: np.unique(np.concatenate(gs)) for m, gs in by_size.items()
    }
    bench_ref = ray.put(bench)

    def scan(b: pa.Table) -> pa.Table:
        bsets = ray.get(bench_ref)  # local zero-copy after first fetch
        flags = np.zeros(b.num_rows, dtype=bool)
        words_per = [t.split() for t in b[text_col].to_pylist()]
        lens = np.array([len(w) for w in words_per], dtype=np.int64)
        flat = [w for ws in words_per for w in ws]
        if flat:
            wh = _word_hashes(flat)
            offs = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=offs[1:])
            for i, (o, ln) in enumerate(zip(offs, lens)):
                if ln == 0:
                    continue
                doc_wh = wh[o : o + ln]
                for m, bset in bsets.items():
                    if ln < m:
                        continue
                    doc_grams = _rolling_shingles(doc_wh, m)
                    idx = np.searchsorted(bset, doc_grams)
                    idx[idx == len(bset)] = 0
                    if (bset[idx] == doc_grams).any():
                        flags[i] = True
                        break
        return pa.table(
            {id_col: b[id_col], out: pa.array(flags)}
        )

    return ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------- PII scrub

# One source of truth for both the Arrow kernel and the DuckDB oracle:
# the catalog's ORACLE_SQL interpolates these exact patterns, so the
# comparison is engine-vs-engine on IDENTICAL RE2 regexes (pyarrow's
# replace_substring_regex and DuckDB's regexp_replace are both RE2).
# Order matters (email before phone: a phone pattern must never eat the
# digits of an already-matched host); counts are taken on the
# progressively scrubbed text, mirrored by the oracle's CTE chain.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (
        "phone",
        r"(\+\d{1,2}[\s.-])?(\(\d{3}\)|\d{3})[\s.-]\d{3}[\s.-]\d{4}",
        "<PHONE>",
    ),
]


def scrub_pii(
    batch: pa.Table, column: str = "text", count_col: str = "n_pii"
) -> pa.Table:
    """Redact emails, IPv4s and phone numbers in ``column`` in place and
    append an int64 redaction count — the pre-training privacy pass.
    Pure vectorized RE2 over the batch (one count + one replace per
    pattern); no Python per-row loop."""
    cur = batch[column]
    total = None
    for _, pat, tok in PII_PATTERNS:
        c = pc.count_substring_regex(cur, pattern=pat)
        total = c if total is None else pc.add(total, c)
        cur = pc.replace_substring_regex(cur, pattern=pat, replacement=tok)
    batch = batch.set_column(
        batch.schema.get_field_index(column), column, cur
    )
    return batch.append_column(count_col, pc.cast(total, pa.int64()))
