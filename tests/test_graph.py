"""PageRank dataflow: mass conservation and centrality ordering."""

from __future__ import annotations

import pytest

from merkonvectordb_spark.operators.graph import pagerank


def _star(spark):
    """Hub 0 connected to spokes 1..5, symmetrized."""
    pairs = [(0, i) for i in range(1, 6)]
    edges = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(edges, "src LONG, dst LONG")


def test_pagerank_mass_and_ordering(spark):
    out = {r.node: r.r for r in pagerank(_star(spark), 6, iterations=5).collect()}
    assert len(out) == 6
    # rank mass is conserved (no dangling nodes in a symmetrized graph)
    assert abs(sum(out.values()) - 1.0) < 1e-6
    # the hub out-ranks every spoke, spokes are symmetric
    assert all(out[0] > out[i] for i in range(1, 6))
    spoke_ranks = {round(out[i], 9) for i in range(1, 6)}
    assert len(spoke_ranks) == 1


def test_pagerank_rejects_empty(spark):
    df = spark.createDataFrame([], "src LONG, dst LONG")
    with pytest.raises(ValueError):
        pagerank(df, 0)


def test_pagerank_derives_n_nodes_when_omitted(spark):
    """n_nodes=None must count the derived node set — identical ranks
    to the explicit count, without the caller's extra distinct pass."""
    from merkonvectordb_spark.operators.graph import pagerank

    df = _star(spark)
    explicit = sorted(map(tuple, pagerank(df, 6, iterations=3).collect()))
    derived = sorted(map(tuple, pagerank(df, iterations=3).collect()))
    assert explicit == derived


def test_free_persisted_blocks_reaps_checkpoints(spark):
    """The session-level reaper must free localCheckpoint blocks (which
    catalog.clearCache does not touch): after a pagerank call is fully
    materialized, its two checkpoint RDDs are dead weight — measured
    round 8, getPersistentRDDs grows by 2 per call and the accumulated
    blocks turn long sweeps into GC-pressure benchmarks."""
    from merkonvectordb_spark import free_persisted_blocks

    free_persisted_blocks(spark)  # start from a clean context
    # hold the frame across the assertions: persistentRdds is a
    # weak-value map and the ContextCleaner unpersists asynchronously
    # once the frame is GC'd, so dropping it here would race the counts
    # below (ADVICE r8)
    ranked = pagerank(_star(spark), 6, iterations=2)
    ranked.collect()
    n_pinned = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert n_pinned >= 2  # the edge + nodes checkpoints are pinned
    freed = free_persisted_blocks(spark)
    assert freed >= 2
    assert freed <= n_pinned
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0
    del ranked
