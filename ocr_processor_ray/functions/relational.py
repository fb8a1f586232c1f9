"""Relational helpers: broadcast joins and bucketed big-big hash joins.

The reference's processing path has no relational joins (SURVEY.md §2.4)
— these exist to make the engine a complete query surface over Parquet
tables, with scale-honest shapes:

* ``broadcast_join`` — small side ``ray.put`` ONCE, looked up inside
  every map task via a pandas merge. No shuffle; the small side ships
  to each node once via the object store, not per batch.
* ``bucketed_join`` — both sides large: add ``bucket = key % B`` to
  each side, union with a side tag, ``groupby(bucket)`` and merge the
  two sides pairwise inside ``map_groups`` — an explicit partitioned
  hash join. B sizes a bucket to worker memory; salt hot keys upstream.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

logger = logging.getLogger(__name__)


def broadcast_join(
    big: Dataset,
    small_df: "pd.DataFrame | pa.Table",
    on: str | list[str],
    how: str = "inner",
) -> Dataset:
    """Join a Dataset against a small in-memory table without a shuffle.

    ``ray.put`` ships the small side to the object store once; each task
    reads it zero-copy from the local store (at cluster scale the object
    transfers to each node once and is cached there — never re-shipped
    per batch).

    Hot path is Arrow-native (``pc.index_in`` on the key + ``take`` of
    the small side's payload columns — no Arrow→pandas→Arrow copy per
    batch); it requires a single key that is UNIQUE on the small side
    (the lookup-join contract). Multi-key or duplicate-key small sides
    fall back to a pandas merge.

    ``how`` ∈ {"inner", "left"} only: a per-batch broadcast join cannot
    implement outer/right semantics — each map task would emit the
    small rows unmatched in ITS batch, duplicating a globally-unmatched
    small row once per block. Use ``bucketed_join`` for those.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"broadcast_join supports how='inner'/'left', got {how!r}; "
            "outer/right need a partitioned join (bucketed_join) — a "
            "per-batch broadcast would duplicate unmatched small rows "
            "once per block"
        )
    small_tbl = (
        pa.Table.from_pandas(small_df, preserve_index=False)
        if isinstance(small_df, pd.DataFrame)
        else small_df
    )
    single_key = isinstance(on, str)
    unique_small = (
        single_key
        and pc.count_distinct(small_tbl[on]).as_py() == small_tbl.num_rows
    )

    if single_key and unique_small and how in ("inner", "left"):
        payload_cols = [c for c in small_tbl.column_names if c != on]
        small_ref = ray.put(
            {"keys": small_tbl[on].combine_chunks(),
             "payload": small_tbl.select(payload_cols).combine_chunks()}
        )

        def join_arrow(batch: pa.Table) -> pa.Table:
            small = ray.get(small_ref)  # local zero-copy read after first fetch
            idx = pc.index_in(batch[on], value_set=small["keys"])
            # Defensive SQL-null guard: Arrow's index_in MATCHES a null
            # probe to a null in the value set. TODAY this path is only
            # reached with a null-free small side (count_distinct ignores
            # nulls, so a null-bearing small side fails the uniqueness
            # check and routes to the fallback) — the guard exists so a
            # future change to that eligibility test cannot silently
            # reintroduce null-matching.
            idx = pc.if_else(pc.is_valid(batch[on]), idx, pa.scalar(None, pa.int32()))
            if how == "inner":
                valid = pc.is_valid(idx)
                batch = batch.filter(valid)
                idx = idx.filter(valid)
            taken = small["payload"].take(idx)  # null index → null row (left)
            for c in payload_cols:
                # non-key name collision with the big side: suffix the
                # small side's column (same "_r" convention as the pandas
                # fallback below); keep suffixing until unused so a big
                # side that already has both `c` and `c_r` can never get
                # a duplicate column name
                name = c
                while name in batch.column_names:
                    name = name + "_r"
                batch = batch.append_column(name, taken[c])
            return batch

        return big.map_batches(join_arrow, batch_format="pyarrow", zero_copy_batch=True)

    small_pdf = small_tbl.to_pandas()
    key_cols = {on} if single_key else set(on)
    # SQL null semantics: pandas merge matches NaN↔NaN — a null-keyed
    # small-side row must never match, so drop it before broadcasting
    small_pdf = small_pdf.dropna(subset=list(key_cols))
    small_ref = ray.put(small_pdf)

    def join_batch(batch: pd.DataFrame) -> pd.DataFrame:
        small = ray.get(small_ref)
        # same until-unused suffix rule as the Arrow fast path: pandas'
        # fixed suffixes=("", "_r") raises on a second-level collision
        # (big side already has both `c` and `c_r`), so pre-rename the
        # small side's colliding payload columns instead
        rename = {}
        for c in small.columns:
            if c in key_cols or c not in batch.columns:
                continue
            name = c
            while (
                name in batch.columns
                or (name != c and name in small.columns)
                or name in rename.values()
            ):
                name = name + "_r"
            rename[c] = name
        s = small.rename(columns=rename) if rename else small
        return batch.merge(s, on=on, how=how, suffixes=("", "_r"))

    return big.map_batches(join_batch, batch_format="pandas")


def bucketed_map_groups(
    ds: Dataset,
    key: str,
    kernel,
    num_buckets: int = 64,
) -> Dataset:
    """``groupby(key).map_groups(kernel)`` with a COARSE shuffle key.

    Grouping a sort-based Ray shuffle by a high-cardinality raw key
    (user_id at 10^8 users) creates one tiny Ray group per key — the
    measured #1 wall-time trap (see pipelines/conversations.py). This
    groups by ``hash(key) % num_buckets`` instead, which co-locates all
    rows of one key in one bounded group, then runs ``kernel`` once per
    REAL key inside the task via an in-task pandas groupby. Semantics
    are identical to the raw-key map_groups for any per-key kernel.

    ``num_buckets`` bounds both shuffle fan-out and per-task memory
    (one bucket ≈ rows/num_buckets); skewed keys bound a bucket by the
    hottest key's row count — salt upstream if one key dominates.
    """

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_bucket", pa.array(_bucket_of(b[key], num_buckets))
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_bucket"])
        # dropna=False: a null key is a real group, same as the raw-key
        # Ray groupby this replaces (pandas' default dropna=True would
        # silently drop those rows — a behavior change, not a semantics
        # choice). _bucket_of routes nulls to bucket 0 deterministically.
        outs = [
            kernel(sub)
            for _, sub in g.groupby(key, sort=False, dropna=False)
        ]
        return pd.concat(outs, ignore_index=True)

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return tagged.groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def hash_join(
    left: Dataset,
    right: Dataset,
    on: str,
    num_partitions: int = 32,
    right_on: str | None = None,
) -> Dataset:
    """Large-large inner join via Ray Data's native hash-partitioned join
    when available (Ray ≥ 2.46), else the explicit ``bucketed_join``.

    ``num_partitions`` is the shuffle fan-out — size it so one partition
    of the bigger side fits a worker's heap.
    """
    if hasattr(left, "join"):
        return left.join(
            right,
            join_type="inner",
            num_partitions=num_partitions,
            on=(on,),
            right_on=(right_on,) if right_on else None,
        )
    if right_on is not None:  # pragma: no cover - fallback path
        right = right.map_batches(
            lambda t: t.rename_columns(
                [on if c == right_on else c for c in t.column_names]
            ),
            batch_format="pyarrow",
        )
    return bucketed_join(left, right, on=on, num_buckets=num_partitions)


def _bucket_of(col: pa.ChunkedArray | pa.Array, num_buckets: int):
    """Vectorized, process-stable ``hash(key) % B`` for int OR string keys.

    Integer keys bucket by value; other types go through
    ``pd.util.hash_array`` (cython siphash with a fixed hash key —
    deterministic across workers and sessions)."""
    import numpy as np
    import pyarrow.compute as pc

    if pa.types.is_integer(col.type):
        # null keys go to bucket 0 deterministically (the cast keeps
        # nulls; to_numpy on a null-bearing int column would otherwise
        # produce float NaN and an undefined int32 bucket)
        filled = pc.fill_null(pc.cast(col, pa.int64()), 0)
        keys = filled.to_numpy(zero_copy_only=False)
        return (keys % num_buckets).astype(np.int32)
    vals = np.asarray(col.to_pandas(), dtype=object)
    from ocr_processor_ray.functions.hashing import stable_hash_array

    # value-determined hash — see functions/hashing.py for the pandas
    # NUL/C-string trap that would otherwise drop join matches; nulls
    # hash to a fixed constant there, i.e. one deterministic bucket
    return (stable_hash_array(vals) % num_buckets).astype(np.int32)


def _tagged_bucket_union(
    left: Dataset,
    right: Dataset,
    on: str,
    num_buckets: int,
    l_schema: dict | None = None,
    r_schema: dict | None = None,
):
    """Tag each side, bucket by ``hash(key) % B``, pad to a common schema
    and union — the explicit partitioned-exchange prelude shared by the
    bucketed hash join and the as-of join.

    ``l_schema``/``r_schema`` ({col: pa.DataType}, insertion-ordered) let
    callers that know their input schemas skip the ``Dataset.schema()``
    probe — which executes a prefix of the upstream pipeline and, in a
    chain of joins, re-runs the previous join once just to learn types.
    Returns (unioned, l_cols, r_cols, l_types, r_types)."""

    def _probe_schema(ds: Dataset) -> dict:
        """{col: pa.DataType} from Dataset.schema(), tolerating pandas-block
        schemas (numpy dtypes) as produced by ``from_pandas`` inputs."""
        s = ds.schema()
        out = {}
        for name, typ in zip(s.names, s.types):
            if not isinstance(typ, pa.DataType):
                import numpy as np

                typ = (
                    pa.string()
                    if np.dtype(typ) == np.dtype(object)  # pandas object = str
                    else pa.from_numpy_dtype(typ)
                )
            out[name] = typ
        return out

    _tag_types = {"_bucket": pa.int32(), "_side": pa.int8()}
    if l_schema is None:
        l_schema = _probe_schema(left)
    if r_schema is None:
        r_schema = _probe_schema(right)
    all_types = {**l_schema, **r_schema, **_tag_types}
    ordered_cols = list(all_types)

    def tag_pad(side: int):
        """ONE map stage per side: bucket tag + null-pad to the union
        schema + fixed column order (fused — three stages' worth of
        per-operator overhead is pure coordination cost on Ray)."""

        def fn(batch: pa.Table) -> pa.Table:
            bucket = _bucket_of(batch[on], num_buckets)
            cols = {}
            for c in ordered_cols:
                if c == "_bucket":
                    cols[c] = pa.array(bucket)
                elif c == "_side":
                    cols[c] = pa.array([side] * batch.num_rows, pa.int8())
                elif c in batch.column_names:
                    cols[c] = batch[c]
                else:
                    cols[c] = pa.nulls(batch.num_rows, all_types[c])
            return pa.table(cols)

        return fn

    l_padded = left.map_batches(tag_pad(0), batch_format="pyarrow", zero_copy_batch=True)
    r_padded = right.map_batches(tag_pad(1), batch_format="pyarrow", zero_copy_batch=True)
    return l_padded.union(r_padded), list(l_schema), list(r_schema), dict(l_schema), dict(r_schema)


def _restore_schema(expected: dict[str, "pa.DataType"]):
    """Post-merge normalizer: the null-padded union + pandas merge coerce
    int64-with-nulls to float64 and can emit empty/short-schema blocks.
    Re-impose the recorded Arrow dtypes and column order on every block
    (nulls survive the float→int cast; see ADVICE round 1)."""
    import pyarrow.compute as pc

    names = list(expected)

    def fn(batch: pa.Table) -> pa.Table:
        cols = {}
        for name in names:
            if name in batch.column_names:
                col = batch[name]
                if col.type != expected[name]:
                    col = pc.cast(col, expected[name])
            else:
                col = pa.nulls(batch.num_rows, expected[name])
            cols[name] = col
        return pa.table(cols)

    return fn


def bucketed_join(
    left: Dataset,
    right: Dataset,
    on: str,
    num_buckets: int = 32,
    suffix_right: str = "_r",
    l_schema: dict | None = None,
    r_schema: dict | None = None,
    how: str = "inner",
) -> Dataset:
    """Partitioned hash join of two large Datasets on an int64 key.

    Exchange volume = both inputs exactly once, keyed by
    ``hash(key) % num_buckets`` (int or string keys).
    ``how`` ∈ {"inner", "left", "outer", "anti", "semi"} — "anti" keeps
    left rows with NO match (the big-big anti-join the resume skip uses
    at partition granularity, here at row granularity); "semi" keeps
    left rows WITH a match, without duplicating them per match (EXISTS);
    "outer" is a FULL OUTER join (correct under bucketing because every
    row of a key — from either side — hashes to the same bucket, so a
    key unmatched globally is unmatched in its bucket too).
    """
    if how not in ("inner", "left", "outer", "anti", "semi"):
        raise ValueError(f"unsupported how={how!r}")
    both, l_cols, r_cols, l_types, r_types = _tagged_bucket_union(
        left, right, on, num_buckets, l_schema, r_schema
    )
    # right-side columns that collide with left names carry the suffix in
    # the merged output (pandas applies it inside merge; unmatched right
    # rows appended manually for outer need the same names)
    rename_right = {
        c: c + suffix_right for c in r_cols if c != on and c in l_types
    }

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        lhs = group[group["_side"] == 0][l_cols]
        rhs = group[group["_side"] == 1][r_cols]
        # SQL null semantics: NULL never equals NULL. pandas disagrees —
        # merge MATCHES NaN↔NaN and isin(NaN, [NaN]) is True — so strip
        # null keys from the match side first: inner/semi then drop
        # null-keyed left rows (nothing to match), anti KEEPS them
        # (NOT EXISTS), left keeps them unmatched; outer re-appends the
        # stripped right rows as unmatched output.
        rhs_null = rhs[rhs[on].isna()]
        rhs = rhs[rhs[on].notna()]
        if how == "anti":
            return lhs[~lhs[on].isin(rhs[on])]
        if how == "semi":
            return lhs[lhs[on].isin(rhs[on])]
        merged = lhs.merge(rhs, on=on, how=how, suffixes=("", suffix_right))
        if how == "outer" and len(rhs_null):
            merged = pd.concat(
                [merged, rhs_null.rename(columns=rename_right)],
                ignore_index=True,
            )
        return merged

    expected = dict(l_types)
    if how not in ("anti", "semi"):
        for c in r_cols:
            if c == on:
                continue
            expected[c + suffix_right if c in l_types else c] = r_types[c]
    return (
        both.groupby("_bucket")
        .map_groups(merge_bucket, batch_format="pandas")
        .map_batches(_restore_schema(expected), batch_format="pyarrow")
    )


def asof_join(
    left: Dataset,
    right: Dataset,
    key: str,
    ts: str,
    num_buckets: int = 32,
    suffix_right: str = "_r",
    l_schema: dict | None = None,
    r_schema: dict | None = None,
) -> Dataset:
    """As-of (backward) join: for each left row, the latest right row of
    the same ``key`` with ``right.ts <= left.ts`` (LEFT-join semantics —
    unmatched rows keep nulls). Ray Data has no native as-of join; this
    is the documented composition: bucket both sides by ``hash(key) % B``
    (co-locates every key's rows), then ``pd.merge_asof(by=key)`` over
    the ts-sorted bucket. Partitioning assumption: one key's rows all
    land in one bucket; skewed keys bound bucket size by B choice.
    """
    both, l_cols, r_cols, l_types, r_types = _tagged_bucket_union(
        left, right, key, num_buckets, l_schema, r_schema
    )

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        lhs = group[group["_side"] == 0][l_cols].sort_values(ts, kind="mergesort")
        rhs = group[group["_side"] == 1][r_cols].sort_values(ts, kind="mergesort")
        # SQL null semantics (same rule as bucketed_join): a null key
        # never matches — drop null-keyed right rows so merge_asof's
        # NaN-matching `by` grouping can't pair them; null-keyed LEFT
        # rows survive unmatched (left-join contract)
        rhs = rhs[rhs[key].notna()]
        return pd.merge_asof(
            lhs, rhs, on=ts, by=key, direction="backward",
            suffixes=("", suffix_right),
        )

    expected = dict(l_types)
    for c in r_cols:
        if c in (key, ts):
            continue
        expected[c + suffix_right if c in l_types else c] = r_types[c]
    return (
        both.groupby("_bucket")
        .map_groups(merge_bucket, batch_format="pandas")
        .map_batches(_restore_schema(expected), batch_format="pyarrow")
    )


def distinct_ids_bounded(
    ds: Dataset, col: str, limit: int, what: str = "id"
) -> "np.ndarray | None":
    """Distinct values of one int64 column as a SORTED array, or None
    when the set exceeds ``limit`` (the broadcast budget).

    Streams only the single int64 column to the driver (never payloads)
    and merges per-batch uniques INCREMENTALLY: buffering every batch's
    uniques before one global np.unique would hold up to 8× the budget
    (plus the concatenate copy) on the driver before deciding to bail —
    a multi-GB spike exactly at the scale the budget protects against.
    The running merged array is capped at ``limit``, so peak driver
    memory is limit + one pending buffer, and the over-budget exit fires
    on the first merge that exceeds it. ``what`` names the id family in
    the fallback warning."""
    merged = np.empty(0, np.int64)
    pending: list[np.ndarray] = []
    pending_n = 0

    def fold() -> "np.ndarray | None":
        out = np.unique(np.concatenate([merged, *pending]))
        return None if out.size > limit else out

    for b in ds.select_columns([col]).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        u = pc.unique(b[col]).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        pending.append(u)
        pending_n += u.size
        if pending_n >= limit:
            m = fold()
            if m is None:
                logger.warning(
                    "distinct %s %s set exceeds the broadcast budget "
                    "(%d ids); falling back to the bucketed path",
                    what,
                    col,
                    limit,
                )
                return None
            merged, pending, pending_n = m, [], 0
    ids = fold() if pending else merged
    if ids is None:
        logger.warning(
            "distinct %s %s set exceeds the broadcast budget (%d ids); "
            "falling back to the bucketed path",
            what,
            col,
            limit,
        )
    return ids


def restrict_to_ids(
    ds: Dataset, id_col: str, ids: "np.ndarray | None"
) -> Dataset:
    """Filter ``ds`` to rows whose ``id_col`` is in the broadcast sorted
    id array — a local, shuffle-free semi-join applied map-side (the
    payload columns never move). ``ids=None`` (over budget) passes the
    dataset through unchanged so callers can chain a bucketed fallback."""
    if ids is None:
        return ds
    ids_ref = ray.put(ids)

    def fn(t: pa.Table) -> pa.Table:
        arr = ray.get(ids_ref)  # local zero-copy read after first fetch
        keys = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        if arr.size == 0:
            return t.slice(0, 0)
        pos = np.searchsorted(arr, keys)
        pos[pos == arr.size] = 0  # out-of-range probes can't match anyway
        return t.filter(pa.array(arr[pos] == keys))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
