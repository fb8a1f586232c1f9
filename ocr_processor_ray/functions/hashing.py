"""One stable vectorized hash for every bucketing decision in the repo.

``pd.util.hash_array``'s default ``categorize=True`` path (and
``pd.factorize``) build khash string tables with C-string semantics:
a NUL byte truncates, so two strings that differ only past a NUL
CONFLATE — and, worse, the conflation depends on which other strings
share the array. A key could therefore hash to different buckets on
the two sides of a join (silently dropping matches) or between the
partial and combine stages of an aggregate. Found by the hypothesis
batch-vs-per-doc minhash property (functions/dedup.py).

``stable_hash_array`` keeps the speed of the categorize trick —
factorize once, siphash only the unique values with element-wise
``categorize=False`` — while escaping NUL-bearing inputs first so the
result depends only on the VALUE, never on the surrounding array.
"""

from __future__ import annotations

import numpy as np


# the pandas default key is "0123456789123456"; this second key gives an
# INDEPENDENT siphash lane for 128-bit content identity (content_hash128)
_LANE2_KEY = "fedcba9876543210"


def stable_hash_array(values, hash_key: str | None = None) -> np.ndarray:
    """uint64 value-determined hash per element (int or string arrays).
    Same fixed-key siphash family as pandas, safe for NUL-containing
    strings, identical results for the same value in any array.
    ``hash_key`` (16 chars) selects an independent siphash lane."""
    import pandas as pd

    kw = {} if hash_key is None else {"hash_key": hash_key}
    if isinstance(values, np.ndarray) and values.dtype.kind in "iuf":
        # numeric: element-wise, no string table involved
        return pd.util.hash_array(values, categorize=False, **kw).astype(np.uint64)
    # strings go STRAIGHT to object dtype: np.asarray(list_of_str) builds
    # a '<U' array, and numpy '<U' arrays silently strip trailing NULs
    arr = np.asarray(values, dtype=object)
    # Injective NUL escape: the escape char itself is escaped first, so
    # 'a\x00b' → 'a\\0b' can never collide with a literal 'a\\0b' (which
    # becomes 'a\\\\0b'). Strings without NUL or backslash — the vast
    # majority — pass through untouched, and the encoding of a value
    # never depends on what else shares the array.
    if any(isinstance(w, str) and ("\x00" in w or "\\" in w) for w in arr):
        arr = np.asarray(
            [
                w.replace("\\", "\\\\").replace("\x00", "\\0")
                if isinstance(w, str) and ("\x00" in w or "\\" in w)
                else w
                for w in arr
            ],
            dtype=object,
        )
    codes, uniq = pd.factorize(arr)
    h = pd.util.hash_array(
        np.asarray(uniq, dtype=object), categorize=False, **kw
    ).astype(np.uint64)
    if (codes < 0).any():
        # factorize sends None/NaN to code -1, which would wrap to the
        # LAST unique's hash — array-dependent, the exact bug this module
        # exists to prevent. Give nulls one fixed value-determined hash.
        out = np.empty(len(codes), dtype=np.uint64)
        valid = codes >= 0
        out[valid] = h[codes[valid]]
        out[~valid] = np.uint64(0x9E3779B97F4A7C15)
        return out
    return h[codes]


def content_hash128(values) -> tuple[np.ndarray, np.ndarray]:
    """Two INDEPENDENT uint64 siphash lanes per element — a vectorized
    128-bit content identity. At 10^10 distinct values the birthday
    collision odds anywhere in the corpus are ~(10^10)^2 / 2^129 ≈
    1.5e-19 (vs ~0.3% for one 64-bit lane). Each lane is the same
    factorize-once pipeline as ``stable_hash_array``, so the pair costs
    ~2× one lane — far cheaper than per-row ``hashlib.md5`` and fully
    vectorized.

    STRING INPUT ONLY: for numeric dtypes ``pd.util.hash_array`` ignores
    ``hash_key`` (the keyed siphash applies to the object/string path
    only), so both "lanes" would be IDENTICAL and the 128-bit claim
    silently degrades to 64 bits. Refuse loudly rather than hand a
    caller a fake collision bound."""
    if isinstance(values, np.ndarray) and values.dtype.kind in "iuf":
        raise TypeError(
            "content_hash128 requires string input: pandas' keyed siphash "
            "lane only applies to object/string arrays, so numeric input "
            "would yield two identical lanes (64-bit identity, not 128). "
            "Hash the numeric column's string form, or use "
            "stable_hash_array if 64 bits suffice."
        )
    return (
        stable_hash_array(values),
        stable_hash_array(values, hash_key=_LANE2_KEY),
    )
