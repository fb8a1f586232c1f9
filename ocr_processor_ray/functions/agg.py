"""Two-phase hash aggregation on Arrow kernels.

Ray Data's ``groupby().aggregate()`` is a sort-based all-to-all whose
reduce cost grows with group count (measured: 7.3 s for a 600k-row /
147k-group Sum at 32 CPUs). When the *result* fits a single worker,
the classic two-phase plan is far cheaper:

    map_batches:  pyarrow Table.group_by per batch   (C++ hash agg)
    repartition(1) → one combine task: group_by again over the partials

Exchange volume = the partial rows only. Use this when
``#groups × row_width`` fits one worker's heap (hundreds of MB);
for group counts beyond that, fall back to ``groupby().aggregate()``
(it partitions the key space) — stated per call site.

Supported aggs mirror the catalog's needs: sum / count / min / max.
"""

from __future__ import annotations

import pyarrow as pa
from ray.data import Dataset

# (agg_name, merge_fn_for_phase2)
_MERGE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def two_phase_agg(
    ds: Dataset,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
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

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(keys).aggregate(phase1)

    def combine(batch: pa.Table) -> pa.Table:
        out = batch.group_by(keys).aggregate(phase2)
        cols = {k: out[k] for k in keys}
        for p2, name in zip(p2_names, out_names):
            col = out[p2]
            if name.endswith("_count") or "count" in p2:
                col = col.cast(pa.int64()) if col.type != pa.int64() else col
            cols[name] = col
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # one combine task over all partials (result fits one worker by contract)
    return partials.repartition(1).map_batches(
        combine, batch_format="pyarrow", batch_size=None
    )
