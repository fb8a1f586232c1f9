"""Two-phase hash aggregation on Arrow kernels.

Ray Data's ``groupby().aggregate()`` is a sort-based all-to-all whose
reduce cost grows with group count (measured: 7.3 s for a 600k-row /
147k-group Sum at 32 CPUs). When the *result* fits a single worker,
the classic two-phase plan is far cheaper:

    map_batches:  pyarrow Table.group_by per batch   (C++ hash agg)
    repartition(1) → one combine task: group_by again over the partials

Exchange volume = the partial rows only. The single-combine plan is
valid while the partial rows fit one worker's heap; ``two_phase_agg``
MEASURES the partial row count after phase 1 (the partials are
materialized either way — they are the exchange payload) and routes
automatically: ≤ ``max_combine_rows`` → one combine task; beyond that
→ Ray's key-partitioned ``groupby().aggregate()`` over the partials,
which shards the key space across workers instead of funnelling it
through one. High-cardinality aggregates (e.g. exact dedup, where
#groups ≈ #distinct docs) therefore never OOM the combine worker at
100 TB — they just take the shuffle.

Supported aggs mirror the catalog's needs: sum / count / min / max.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

# (agg_name, merge_fn_for_phase2)
_MERGE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}

# partial-row threshold for the one-task combine: 5M rows × ~50 B/row
# ≈ 250 MB — comfortably one worker's heap, far below it in practice.
DEFAULT_MAX_COMBINE_ROWS = 5_000_000


def two_phase_agg(
    ds: Dataset,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    max_combine_rows: int = DEFAULT_MAX_COMBINE_ROWS,
) -> Dataset:
    """``aggs`` = [(col, fn, out_name)] with fn ∈ {sum, count, min, max}.

    ``count`` counts rows of the group (pass any non-null col).
    Output columns: keys + out_names.
    """
    for _, fn, _ in aggs:
        if fn not in _MERGE:
            raise ValueError(f"unsupported agg {fn!r}")

    phase1 = [(col, fn) for col, fn, _ in aggs]
    p1_names = [f"{col}_{fn}" for col, fn, _ in aggs]
    phase2 = [(n, _MERGE[fn]) for n, (_, fn, _) in zip(p1_names, aggs)]
    p2_names = [f"{n}_{_MERGE[fn]}" for n, (_, fn, _) in zip(p1_names, aggs)]
    out_names = [out for _, _, out in aggs]
    # cast to int64 only for true row-count aggs (a user column merely
    # *named* '...count...' must keep its own type)
    count_outs = {out for _, fn, out in aggs if fn == "count"}

    def partial(batch: pa.Table) -> pa.Table:
        # COUNT(*) semantics: pyarrow's hash count defaults to only_valid
        # (non-null), which would silently undercount vs a count(*)
        # oracle on any null-bearing column — force mode='all' (ADVICE
        # round 2). CountOptions is built HERE because the cython options
        # object cannot ride a cloudpickled closure.
        import pyarrow.compute as _pc

        specs = [
            (col, fn, _pc.CountOptions(mode="all")) if fn == "count" else (col, fn)
            for col, fn in phase1
        ]
        return batch.group_by(keys).aggregate(specs)

    def _finalize(out: pa.Table, src_names: list[str]) -> pa.Table:
        cols = {k: out[k] for k in keys}
        for src, name in zip(src_names, out_names):
            col = out[src]
            if name in count_outs and col.type != pa.int64():
                col = col.cast(pa.int64())
            cols[name] = col
        return pa.table(cols)

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    if partials.count() <= max_combine_rows:

        def combine(batch: pa.Table) -> pa.Table:
            return _finalize(batch.group_by(keys).aggregate(phase2), p2_names)

        return partials.repartition(1).map_batches(
            combine, batch_format="pyarrow", batch_size=None
        )

    # partitioned fallback: merge partials with Ray's key-sharded aggregate
    from ray.data.aggregate import Max, Min, Sum

    _CLS = {"sum": Sum, "min": Min, "max": Max}
    agg_objs = [
        _CLS[_MERGE[fn]](p1, alias_name=out)
        for p1, (_, fn, out) in zip(p1_names, aggs)
    ]
    merged = partials.groupby(keys).aggregate(*agg_objs)
    if not count_outs:
        return merged

    def cast_counts(batch: pa.Table) -> pa.Table:
        for name in count_outs:
            i = batch.schema.get_field_index(name)
            if batch.column(i).type != pa.int64():
                batch = batch.set_column(
                    i, name, batch.column(i).cast(pa.int64())
                )
        return batch

    return merged.map_batches(cast_counts, batch_format="pyarrow")


def _local_topk(
    batch: pa.Table, key: str, order_col: str, k: int, tiebreak: str,
    descending: bool = True,
) -> pa.Table:
    """Keep each key's top-k rows of ONE batch (vectorized rank filter
    over the batch sorted by (key, order desc/asc, tiebreak))."""
    if batch.num_rows == 0:
        return batch
    direction = "descending" if descending else "ascending"
    batch = batch.sort_by(
        [(key, "ascending"), (order_col, direction), (tiebreak, "ascending")]
    )
    karr = batch[key].to_numpy(zero_copy_only=False)
    changed = np.r_[True, karr[1:] != karr[:-1]]
    starts = np.nonzero(changed)[0]
    sizes = np.diff(np.r_[starts, len(karr)])
    rank = np.arange(len(karr)) - np.repeat(starts, sizes)
    return batch.filter(pa.array(rank < k))


def grouped_topk(
    ds: Dataset,
    key: str,
    order_col: str,
    k: int,
    tiebreak: str,
    rank_col: str = "rank",
    descending: bool = True,
    combine_shard_threshold: int = 200_000,
) -> Dataset:
    """Per-key top-k rows WITHOUT shipping whole groups anywhere.

    Scale shape: each batch keeps only its local top-k per key
    (``map_batches``), so the combine input is ≤ #blocks × #keys × k
    rows — bounded, even when one key covers the whole corpus (the
    ``groupby(key).map_groups`` alternative would put the entire corpus
    into #keys tasks). One combine task re-ranks and emits a 1-indexed
    ``rank_col``; when the candidate set exceeds
    ``combine_shard_threshold`` rows the combine automatically shards by
    key hash (all rows of a key co-locate, so per-shard ranks are exact).
    """

    def partial(batch: pa.Table) -> pa.Table:
        return _local_topk(batch, key, order_col, k, tiebreak, descending)

    def combine(batch: pa.Table) -> pa.Table:
        out = _local_topk(batch, key, order_col, k, tiebreak, descending)
        karr = out[key].to_numpy(zero_copy_only=False)
        changed = np.r_[True, karr[1:] != karr[:-1]] if len(karr) else np.array([], bool)
        starts = np.nonzero(changed)[0]
        sizes = np.diff(np.r_[starts, len(karr)])
        rank = np.arange(len(karr)) - np.repeat(starts, sizes) + 1
        return out.append_column(rank_col, pa.array(rank.astype(np.int64)))

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    if partials.count() <= combine_shard_threshold:
        return partials.repartition(1).map_batches(
            combine, batch_format="pyarrow", batch_size=None
        )
    # candidate set (≤ #blocks × #keys × k) outgrew one worker: shard
    # the combine by key hash — all rows of a key land in one shard, so
    # per-shard ranking is exact; only candidates move through the
    # shuffle, never whole groups
    def add_shard(b: pa.Table) -> pa.Table:
        from ocr_processor_ray.functions.hashing import stable_hash_array

        kv = b[key].to_numpy(zero_copy_only=False)
        shard = (stable_hash_array(kv) % 64).astype(np.int32)
        return b.append_column("_kshard", pa.array(shard))

    sharded = partials.map_batches(
        add_shard, batch_format="pyarrow", zero_copy_batch=True
    )
    return sharded.groupby("_kshard").map_groups(
        lambda g: combine(g.drop_columns(["_kshard"])), batch_format="pyarrow"
    )


_TOMB = "_budget_tomb"


def _local_budget_select(
    batch: pa.Table,
    key: str,
    order_col: str,
    weight_col: str,
    budget: int,
    tiebreak: str,
    cum_col: str | None,
    emit_tombstones: bool = False,
) -> pa.Table:
    """Keep each key's greedy budget prefix of ONE batch: rows sorted by
    (order desc, tiebreak asc) whose inclusive per-key running
    ``weight_col`` sum is ≤ ``budget``. Weights are non-negative, so the
    running sum is monotone and the kept set is a true prefix. When
    ``cum_col`` is set the inclusive running sum is emitted (combine
    stage only — partial cums are block-local and meaningless).

    ``emit_tombstones`` (partial stage): per key that dropped ≥1 row,
    also emit the FIRST dropped row with its weight overridden to
    ``budget + 1`` and ``_TOMB=1``. The semantics require a candidate's
    running sum over ALL better rows (selected or not) — a combine over
    kept rows alone under-counts and can admit false positives (proof
    sketch: if any row better than r was dropped in block B, that row's
    block-local cum in B already exceeded the budget, and every row in
    that cum is also better than r, so r's TRUE cum > budget). The
    tombstone rides at the dropped row's exact sort position and its
    budget+1 weight poisons the whole per-key suffix in the combine,
    which is exactly the required exclusion. Kept rows are better than
    every tombstone of their key, so their emitted cums never include
    tombstone weight."""
    if batch.num_rows == 0:
        if emit_tombstones and _TOMB not in batch.column_names:
            batch = batch.append_column(_TOMB, pa.array([], pa.int8()))
        if cum_col is not None:
            batch = batch.append_column(cum_col, pa.array([], pa.int64()))
        return batch
    batch = batch.sort_by(
        [(key, "ascending"), (order_col, "descending"), (tiebreak, "ascending")]
    )
    karr = batch[key].to_numpy(zero_copy_only=False)
    w = batch[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(w) and w.min() < 0:
        raise ValueError(
            f"grouped_budget_select: negative weight in {weight_col!r} "
            "breaks the monotone-prefix selection rule"
        )
    changed = np.r_[True, karr[1:] != karr[:-1]]
    starts = np.nonzero(changed)[0]
    sizes = np.diff(np.r_[starts, len(karr)])
    cum = np.cumsum(w)
    # per-key inclusive running sum: subtract the cumsum just before
    # each key's first row
    base = np.repeat(cum[starts] - w[starts], sizes)
    cum = cum - base
    # incoming tombstones (combine stage) carry weight budget+1 already,
    # so the cum <= budget filter removes them and everything after them
    keep = cum <= budget
    if cum_col is not None:
        batch = batch.append_column(cum_col, pa.array(cum, pa.int64()))
    kept = batch.filter(pa.array(keep))
    if not emit_tombstones:
        return kept
    # first dropped row per key: prefix property puts it right after the
    # kept prefix — index starts[g] + kept_count[g] when any row dropped
    kept_per_key = np.add.reduceat(keep.astype(np.int64), starts)
    has_drop = kept_per_key < sizes
    tomb_idx = (starts + kept_per_key)[has_drop]
    kept = kept.append_column(_TOMB, pa.array(np.zeros(kept.num_rows, np.int8)))
    if tomb_idx.size == 0:
        return kept
    tombs = batch.take(pa.array(tomb_idx))
    tombs = tombs.set_column(
        tombs.schema.get_field_index(weight_col),
        weight_col,
        pa.array(np.full(tombs.num_rows, budget + 1, np.int64)),
    )
    tombs = tombs.append_column(_TOMB, pa.array(np.ones(tombs.num_rows, np.int8)))
    return pa.concat_tables([kept, tombs])


def grouped_budget_select(
    ds: Dataset,
    key: str,
    order_col: str,
    weight_col: str,
    budget: int,
    tiebreak: str,
    cum_col: str = "cum_weight",
    combine_shard_threshold: int = 200_000,
) -> Dataset:
    """Per-key greedy BUDGET selection (the token-budget curation
    primitive of a training-data mixer): order each key's rows by
    (``order_col`` desc, ``tiebreak`` asc) and keep the prefix whose
    inclusive ``weight_col`` running sum stays ≤ ``budget``; the
    inclusive sum is emitted as ``cum_col``. Weights must be ≥ 0, so
    "running sum ≤ budget" is a contiguous prefix and the rule is
    exactly a SQL window SUM — see the ``docs_token_budget`` oracle.

    Scale shape (mirrors :func:`grouped_topk` — no whole-group
    shuffle): each block keeps only rows whose BLOCK-LOCAL inclusive
    running sum fits the budget (globally-selected ⊆ block-kept: the
    global running sum of a selected row is ≥ its block-local sum), PLUS
    one tombstone per (block, key) that dropped rows — the first dropped
    row re-weighted to budget+1, so the combine's prefix rule excludes
    everything at-or-after any dropped row's sort position (a kept row
    with a better row dropped anywhere provably exceeds the budget —
    see ``_local_budget_select``; a combine over kept rows alone would
    under-count those dropped weights and admit false positives, found
    by hypothesis fuzz). Candidates entering the combine are bounded by
    budget-worth of rows + 1 tombstone per (block, key); past
    ``combine_shard_threshold`` rows the combine shards by key hash
    (all rows of a key co-locate, so per-shard prefix sums are exact)."""

    def partial(batch: pa.Table) -> pa.Table:
        return _local_budget_select(
            batch, key, order_col, weight_col, budget, tiebreak,
            cum_col=None, emit_tombstones=True,
        )

    def combine(batch: pa.Table) -> pa.Table:
        out = _local_budget_select(
            batch, key, order_col, weight_col, budget, tiebreak, cum_col=cum_col
        )
        # tombstones carry weight budget+1, so the cum filter removed
        # them (and their poisoned suffixes) — only the marker column
        # itself remains to drop
        return out.drop_columns([_TOMB])

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    if partials.count() <= combine_shard_threshold:
        return partials.repartition(1).map_batches(
            combine, batch_format="pyarrow", batch_size=None
        )
    def add_shard(b: pa.Table) -> pa.Table:
        from ocr_processor_ray.functions.hashing import stable_hash_array

        kv = b[key].to_numpy(zero_copy_only=False)
        shard = (stable_hash_array(kv) % 64).astype(np.int32)
        return b.append_column("_kshard", pa.array(shard))

    sharded = partials.map_batches(
        add_shard, batch_format="pyarrow", zero_copy_batch=True
    )
    return sharded.groupby("_kshard").map_groups(
        lambda g: combine(g.drop_columns(["_kshard"])), batch_format="pyarrow"
    )


def global_topk(
    ds: Dataset,
    order_col: str,
    k: int,
    tiebreak: str,
    descending: bool = True,
    prereduce_threshold: int | None = None,
) -> pa.Table:
    """Top-k rows of the whole dataset WITHOUT a global sort shuffle.

    ``Dataset.sort().limit(k)`` is an all-to-all over every block with a
    fixed multi-second coordination cost; top-k only needs each block's
    local top-k (map_batches) and one tiny merge of ≤ #blocks × k rows,
    which is collected as Arrow refs (no pandas round-trip)."""
    import ray

    direction = "descending" if descending else "ascending"
    order = [(order_col, direction), (tiebreak, "ascending")]

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows <= k:
            return b
        return b.sort_by(order).slice(0, k)

    cands = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    # at ~10^6 blocks the candidate set is #blocks × k rows — pre-reduce
    # distributed so the driver only ever concatenates a bounded set
    threshold = (
        prereduce_threshold if prereduce_threshold is not None else max(100_000, 64 * k)
    )
    if cands.count() > threshold:
        cands = (
            cands.repartition(32)
            .map_batches(
                partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
            )
            .materialize()
        )
    tabs = [tb for tb in ray.get(cands.to_arrow_refs()) if tb.num_rows]
    if not tabs:
        # an entirely-empty input (e.g. a selective filter upstream
        # matched nothing) has no non-empty candidate block to concat —
        # return an empty result with whatever schema the blocks carry
        all_tabs = ray.get(cands.to_arrow_refs())
        if all_tabs:
            return all_tabs[0].slice(0, 0)
        s = cands.schema()
        if s is not None and s.names:
            return pa.schema(list(zip(s.names, s.types))).empty_table()
        return pa.table({})
    t = pa.concat_tables(tabs, promote_options="default")
    return t.sort_by(order).slice(0, k)
