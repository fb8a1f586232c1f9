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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ocr_processor_ray.functions.agg import two_phase_agg

# edge budget for the driver-local solve: two int64 columns pulled once
# (16 B/edge → 80 MB at the limit). Near-dup pair sets are tiny relative
# to their corpus, so at 100 TB this path still usually wins; past the
# budget the iterative distributed loop below takes over.
_LOCAL_CC_EDGE_LIMIT = 5_000_000


def _local_cc(a: np.ndarray, b: np.ndarray) -> pa.Table:
    """Min-hooking + pointer-jumping CC over int64 edge arrays — the
    Shiloach–Vishkin shape, fully vectorized (no per-edge Python).
    Converges in O(log n) hook/compress rounds. Nodes are relabeled to
    their rank via ``np.unique``; ranks are id-ordered, so the fixpoint
    root of each tree is the component's minimum id — identical output
    to the distributed min-label loop."""
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    n = len(nodes)
    ia, ib = inv[: len(a)], inv[len(a) :]
    parent = np.arange(n, dtype=np.int64)
    while True:
        ra, rb = parent[ia], parent[ib]
        lo = np.minimum(ra, rb)
        hi = np.maximum(ra, rb)
        before = parent.copy()
        np.minimum.at(parent, hi, lo)
        while True:  # full path compression
            pp = parent[parent]
            if np.array_equal(pp, parent):
                break
            parent = pp
        if np.array_equal(before, parent):
            break
    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "component": pa.array(nodes[parent], pa.int64()),
        }
    )


def connected_components(
    edges: Dataset,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iters: int = 20,
) -> Dataset:
    """→ (node:int64, component:int64) for every node in ``edges``;
    ``component`` is the minimum node id reachable from ``node``.

    Size-gated: edge sets within ``_LOCAL_CC_EDGE_LIMIT`` (counted on
    the materialized bounded (id, id) pairs) are solved on the driver
    with a vectorized union-find — each distributed round below costs
    a join + agg + fold (~1.5 s of stage latency even on 100 edges),
    so small graphs were paying seconds to label a handful of nodes.
    Larger edge sets run the iterative bucketed min-label loop."""
    edges = edges.materialize()  # bounded: (id, id) int64 pair rows
    n_edges = edges.count()
    if n_edges <= _LOCAL_CC_EDGE_LIMIT:
        import ray

        parts_a: list[np.ndarray] = []
        parts_b: list[np.ndarray] = []
        for t in edges.select_columns([a_col, b_col]).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        ):
            parts_a.append(
                pc.cast(t[a_col], pa.int64()).to_numpy(zero_copy_only=False)
            )
            parts_b.append(
                pc.cast(t[b_col], pa.int64()).to_numpy(zero_copy_only=False)
            )
        empty = np.empty(0, np.int64)
        out = _local_cc(
            np.concatenate(parts_a) if parts_a else empty,
            np.concatenate(parts_b) if parts_b else empty,
        )
        return ray.data.from_arrow(out)

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


PAGERANK_SCALE = 10**12  # total rank mass in integer quanta


def pagerank(
    edges: Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 10,
    damping_pct: int = 85,
) -> Dataset:
    """Integer fixed-point PageRank → (node:int64, rank_q:int64).

    The web-scale corpus-curation weight (link centrality as a quality
    prior). All arithmetic is int64 fixed-point over a total mass of
    ``PAGERANK_SCALE`` quanta with FLOOR division everywhere, so every
    iteration is exactly order-independent — the result is bit-identical
    under any block layout / merge order and therefore testable (float
    PageRank partial sums drift with the fold shape). Floor division
    leaks ≤ 1 quantum per node per round (≤ iters·N·10⁻¹² of the mass),
    a bias far below any ranking decision and the price of determinism.

    Per iteration (all exchanges bounded, nothing corpus-sized on the
    driver):
      1. contribs: edges ⋈ (rank, out-degree) bucketed on src —
         each edge carries ``rank_q // deg`` to its dst;
      2. incoming: one two-phase hash sum keyed by dst;
      3. dangling mass (nodes with no out-edges) + teleport fold back
         in: ranks LEFT-join incoming bucketed on node, then
         ``new = (100-d)%·TOTAL/N + d%·(in + dangling/N)`` in ints.
    Dangling/teleport totals are single-row folds, never a node list on
    the driver.
    """
    from ocr_processor_ray.functions.relational import bucketed_join

    # node universe = src ∪ dst (a node with only in-edges still ranks)
    nodes = two_phase_agg(
        edges.map_batches(
            lambda t: pa.table(
                {"node": pa.concat_arrays(
                    [c.combine_chunks() for c in (pc.cast(t[src_col], pa.int64()),
                                                  pc.cast(t[dst_col], pa.int64()))]
                )}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        ["node"],
        [("node", "count", "_n")],
    ).map_batches(
        lambda t: t.drop_columns(["_n"]), batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # consumed every iteration (join + renew) — pin once
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("pagerank: empty edge set")

    deg = two_phase_agg(
        edges.map_batches(
            lambda t: pa.table({"node": pc.cast(t[src_col], pa.int64())}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        ["node"],
        [("node", "count", "deg")],
    ).materialize()  # static across iterations — pin once

    base_q = PAGERANK_SCALE // n_nodes
    ranks = nodes.map_batches(
        lambda t: t.append_column(
            "rank_q", pa.array([base_q] * t.num_rows, pa.int64())
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    edges64 = edges.map_batches(
        lambda t: pa.table(
            {
                "node": pc.cast(t[src_col], pa.int64()),
                "dst": pc.cast(t[dst_col], pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()  # consumed once per iteration

    def _scalar_sum(ds: Dataset, col: str) -> int:
        # one int64 per block to the driver (same shape as
        # connected_components._label_sum) — no extra exchange
        p = ds.map_batches(
            lambda b: pa.table(
                {"s": pa.array([pc.sum(b[col]).as_py() or 0], pa.int64())}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return sum(r["s"] for r in p.take_all())

    for _ in range(iters):
        # rank+degree on the rank side; nodes with no out-edges are
        # dangling (deg null after the left join)
        rd_join = bucketed_join(ranks, deg, on="node", how="left").materialize()
        dangling_q = _scalar_sum(
            rd_join.map_batches(
                lambda b: pa.table(
                    {
                        "d_q": pc.if_else(
                            pc.is_valid(b["deg"]),
                            pa.array([0] * b.num_rows, pa.int64()),
                            b["rank_q"],
                        )
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            "d_q",
        )
        contribs = bucketed_join(
            edges64,
            rd_join.map_batches(
                lambda b: b.filter(pc.is_valid(b["deg"])),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            on="node",
        ).map_batches(
            lambda b: pa.table(
                {
                    "node": b["dst"],
                    "in_q": pc.divide(b["rank_q"], b["deg"]),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        incoming = two_phase_agg(contribs, ["node"], [("in_q", "sum", "in_q")])
        teleport_q = (100 - damping_pct) * PAGERANK_SCALE // 100 // n_nodes
        dangling_share = dangling_q // n_nodes

        def renew(b: pa.Table) -> pa.Table:
            in_q = pc.fill_null(pc.cast(b["in_q"], pa.int64()), 0)
            new = pc.add(
                pa.array([teleport_q] * b.num_rows, pa.int64()),
                pc.divide(
                    pc.multiply(
                        pc.add(in_q, pa.array([dangling_share] * b.num_rows, pa.int64())),
                        pa.scalar(damping_pct, pa.int64()),
                    ),
                    pa.scalar(100, pa.int64()),
                ),
            )
            return pa.table({"node": b["node"], "rank_q": new})

        ranks = (
            bucketed_join(nodes, incoming, on="node", how="left")
            .map_batches(renew, batch_format="pyarrow", zero_copy_batch=True)
            .materialize()
        )
    return ranks
