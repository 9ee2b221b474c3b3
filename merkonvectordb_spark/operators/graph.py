"""Iterative graph dataflow: PageRank as repeated join + aggregate.

The reference has nothing iterative; this is the north-star pattern for
graph-shaped analytics over relational fixtures (influence/centrality on
an interaction graph).  Each iteration is one hash join of the edge list
against the current ranks plus one aggregation on the destination — the
classic dataflow PageRank, whose per-iteration shuffle volume is |E|,
never |E|² (no adjacency materialization, no driver-side graph).

Determinism across engines: ranks are rounded to 9 dp after every
iteration (the ``kmeans_refine`` precedent) — neighbor-contribution sums
add in engine-dependent order, and the round re-pins the value below
both engines' accumulated ulp error, so a DuckDB oracle that unrolls the
same iterations hash-matches exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# rank/contrib frames broadcast per iteration only below this node
# count (~a few hundred MB built); bigger graphs keep the |E|-shuffle
# dataflow form.  A dial, not a hard-code: overridable per deployment.
PAGERANK_BROADCAST_MAX_NODES = 5_000_000


def pagerank(
    edges: DataFrame,
    n_nodes: int | None = None,
    iterations: int = 3,
    damping: float = 0.85,
    round_dp: int = 9,
    broadcast_max_nodes: int | None = None,
) -> DataFrame:
    """``iterations`` rounds of r(v) ← (1−d)/N + d·Σ_{u→v} r(u)/deg(u)
    from a uniform start, over an edge list with columns (src, dst).

    No dangling-mass correction — callers feeding an undirected
    (symmetrized) edge list have no zero-out-degree nodes, which is the
    intended use; a DIRECTED edge list still returns every node (the
    node set is src ∪ dst, so sink-only nodes keep the rank they
    receive — they just redistribute none of it, the standard
    no-dangling-correction semantics).  The edge⋈degree frame is
    consumed once per iteration: materialized, because without it every
    iteration would recompute the full degree aggregation lineage
    (measured perf law).

    ``n_nodes=None`` (the default) counts the node set AFTER it is
    derived and checkpointed — a free count on a node-sized frame.
    Passing it explicitly re-runs whatever lineage the caller counts
    over (for the symmetrized fixtures that was a second full
    scan+distinct of the fact table — measured ~40% of the query)."""
    if n_nodes is not None and n_nodes <= 0:
        raise ValueError("need a non-empty graph")
    from pyspark.sql import Window

    # edge⋈degree in ONE shuffle: count(*) over a src-partitioned window
    # instead of groupBy + re-join (two shuffles of |E|, and at scale the
    # degree side is node-sized so the join can't broadcast).  The window
    # partitions on src — per-key state is one counter, no skew trap
    # beyond what the join key itself had.
    # localCheckpoint (eager), not persist: pagerank returns a lazy
    # frame, so a persist here could never be unpersisted — repeated
    # calls would pin edge-list copies in executor storage for the
    # session's lifetime; checkpoint blocks free with the frames' GC.
    # Materialized because the frame re-enters EVERY iteration's join —
    # without it each iteration re-executes the caller's upstream
    # lineage (union-of-distinct), turning 3 iterations into ~10
    # redundant shuffles (measured perf law).
    edeg = edges.withColumn(
        "__deg", F.count(F.lit(1)).over(Window.partitionBy("src"))
    ).localCheckpoint(eager=True)
    # node set = src ∪ dst, derived from the checkpoint blocks (not the
    # caller's lineage) — no third materialization job
    nodes = (
        edeg.select(F.col("src").alias("node"))
        .unionByName(edeg.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if n_nodes is None:
        n_nodes = nodes.count()
        if n_nodes <= 0:
            raise ValueError("need a non-empty graph")
    base = (1.0 - damping) / n_nodes
    # Join strategy (guide §3.1), decided from the KNOWN node count:
    # the rank table is node-sized, so when it fits a broadcast every
    # iteration becomes a map-side hash join over the edge partitions +
    # a partial-aggregated node-sized exchange — per-iteration shuffle
    # drops from |E| rows to the aggregate partials (measured round 10:
    # 4.8 s → 2.3 s at sf0.1, and the two AQE-coalesced 1-task rank
    # stages disappear).  Past the threshold (≈5M nodes ≈ hundreds of
    # MB built) the |E|-shuffle dataflow form is the scale-correct one
    # and remains the fallback — never broadcast an unbounded side.
    # broadcast_max_nodes: per-call override of the module dial (ADVICE
    # r10 — the dial was documented as overridable but only the module
    # global could be mutated).  Semantics are identical either way;
    # this only picks the physical join strategy.
    cap = (
        PAGERANK_BROADCAST_MAX_NODES
        if broadcast_max_nodes is None
        else int(broadcast_max_nodes)
    )
    bcast_ranks = n_nodes <= cap
    ranks = nodes.withColumn("r", F.lit(1.0 / n_nodes))
    for it in range(iterations):
        r = F.broadcast(ranks) if bcast_ranks else ranks
        contrib = (
            edeg.join(r, edeg["src"] == r["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("r") / F.col("__deg")).alias("__s"))
        )
        c = F.broadcast(contrib) if bcast_ranks else contrib
        ranks = nodes.join(
            c, nodes["node"] == c["dst"], "left"
        ).select(
            "node",
            F.round(
                F.lit(base) + damping * F.coalesce(F.col("__s"), F.lit(0.0)),
                round_dp,
            ).alias("r"),
        )
        # the broadcast path nests one unmaterialized broadcast plan per
        # iteration — plan depth (and driver broadcast memory) grows
        # with `iterations` (ADVICE r10).  Cut the lineage every few
        # iterations so long runs stay bounded; at the default 3
        # iterations this never fires and the plan is byte-identical.
        if bcast_ranks and (it + 1) % 4 == 0 and (it + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
