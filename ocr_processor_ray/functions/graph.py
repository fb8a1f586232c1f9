"""Distributed connected components (near-dup cluster assignment).

Near-dup PAIRS (dedup.py / similarity.py) become deletion decisions
only after clustering: every doc in a component keeps one survivor.
This is iterative min-label propagation — the standard large-graph CC
(cf. the MapReduce "hash-to-min" family):

    labels[v] ← v
    repeat:  labels[v] ← min(labels[v], min over neighbors' labels)

Each iteration is ONE bucketed hash join (edge endpoints ⋈ labels,
keyed by the endpoint) plus ONE min-aggregate keyed by node — both
bounded-per-task shuffles of (node, label) int64 pairs; no driver-side
graph. Labels decrease monotonically, so ``sum(labels)`` is a
convergence metric that needs no old-vs-new join. Iterations are
bounded by component diameter (≈ log n rounds for the hash-to-min
variant's pathological chains; near-dup components are tiny).

Partitioning assumption: nodes are int64 ids; each iteration re-keys by
node hash, so skew only matters if one node's degree approaches a
block — true near-dup components are capped upstream (MAX_BUCKET_MEMBERS).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ocr_processor_ray.functions.agg import two_phase_agg


def connected_components(
    edges: Dataset,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iters: int = 20,
) -> Dataset:
    """→ (node:int64, component:int64) for every node in ``edges``;
    ``component`` is the minimum node id reachable from ``node``."""

    def symmetrize(b: pa.Table) -> pa.Table:
        a = pc.cast(b[a_col], pa.int64())
        bb = pc.cast(b[b_col], pa.int64())
        return pa.table(
            {
                "dst": pa.concat_arrays(
                    [a.combine_chunks(), bb.combine_chunks()]
                ),
                "src": pa.concat_arrays(
                    [bb.combine_chunks(), a.combine_chunks()]
                ),
            }
        )

    sym = edges.map_batches(
        symmetrize, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # labels init: every node labels itself
    labels = two_phase_agg(
        sym.map_batches(
            lambda b: pa.table({"node": b["dst"], "label": b["dst"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        ["node"],
        [("label", "min", "label")],
    ).materialize()

    def _label_sum(ls: Dataset) -> int:
        p = ls.map_batches(
            lambda b: pa.table(
                {"s": pa.array([pc.sum(b["label"]).as_py() or 0], pa.int64())}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return sum(r["s"] for r in p.take_all())

    import logging

    logger = logging.getLogger(__name__)

    converged = False
    prev_sum = _label_sum(labels)
    for _ in range(max_iters):
        from ocr_processor_ray.functions.relational import bucketed_join

        # neighbor messages: for edge (dst ← src), dst receives src's label
        msgs = bucketed_join(
            sym,
            labels.map_batches(
                lambda b: pa.table({"src": b["node"], "label": b["label"]}),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            on="src",
            l_schema={"dst": pa.int64(), "src": pa.int64()},
            r_schema={"src": pa.int64(), "label": pa.int64()},
        ).map_batches(
            lambda b: pa.table({"node": b["dst"], "label": b["label"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        labels = two_phase_agg(
            msgs.union(labels), ["node"], [("label", "min", "label")]
        ).materialize()
        cur = _label_sum(labels)
        if cur == prev_sum:
            converged = True
            break
        prev_sum = cur

    if not converged:
        # labels propagate one hop per round, so a component whose
        # diameter exceeds max_iters would come back silently split —
        # make that loud instead of wrong-looking-right
        logger.warning(
            "connected_components: no fixpoint within max_iters=%d — "
            "components wider than that are NOT fully merged; raise "
            "max_iters (rounds needed = max component diameter)",
            max_iters,
        )

    return labels.map_batches(
        lambda b: pa.table(
            {
                "node": pc.cast(b["node"], pa.int64()),
                "component": pc.cast(b["label"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
