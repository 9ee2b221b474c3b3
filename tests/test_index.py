"""Persisted IVF index (operators.index): build/search parity with the
in-memory operator, partition-pruned list scans, and time-travel search.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from merkonvectordb_spark.functions.vector import l2_norm
from merkonvectordb_spark.operators import ann as A
from merkonvectordb_spark.operators.index import (
    build_ivf_index,
    search_ivf_index,
)
from merkonvectordb_spark.schema import load_table

SF = "/root/testdata/sf0.001"


def _corpus(spark):
    emb = load_table(spark, SF, "embeddings").where(
        F.size("embedding") == A.DIM
    )
    return emb.where(l2_norm(F.col("embedding")) > 0)


def _cents(emb):
    return emb.where(F.col("vec_id") < A.IVF_K).select(
        F.col("vec_id").alias("cid"),
        F.transform("embedding", lambda x: x.cast("double")).alias("cv"),
    )


def _qset(emb):
    return emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_persisted_search_equals_in_memory_ivf(spark, tmp_path):
    emb = _corpus(spark)
    cents = _cents(emb)
    idx = build_ivf_index(
        spark, emb, cents, str(tmp_path / "idx"), extra_cols=("label",)
    )
    got = search_ivf_index(idx, _qset(emb), k=3, n_probe=A.IVF_N_PROBE)
    want = A.knn_batch_ivf(
        emb, _qset(emb), k=3, centroids=cents, extra_cols=("label",)
    )
    g = sorted(
        (r.query_id, r.vec_id, r.label, r.score) for r in got.collect()
    )
    w = sorted(
        (r.query_id, r.vec_id, r.label, r.score) for r in want.collect()
    )
    assert g == w and len(g) == 15


def test_search_scans_only_probed_partitions(spark, tmp_path):
    """The scale claim: the lists scan must plan with a partition filter
    on cid — n_probe/K of the index read, not all of it."""
    emb = _corpus(spark)
    idx = build_ivf_index(spark, emb, _cents(emb), str(tmp_path / "idx"))
    out = search_ivf_index(idx, _qset(emb), k=3, n_probe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # at least one scan (the lists table) must carry a non-empty cid
    # partition filter; other scans legitimately have empty ones
    import re

    filters = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("cid" in f and "IN" in f for f in filters), filters


def test_time_travel_search_hits_old_index_version(spark, tmp_path):
    """Rebuilding the index bumps the version; a search pinned to v1
    still answers from the ORIGINAL build (snapshot isolation)."""
    emb = _corpus(spark)
    half = emb.where(F.col("vec_id") % 2 == 0)
    idx = build_ivf_index(spark, half, _cents(emb), str(tmp_path / "idx"))
    # rebuild over the full corpus → version 2
    full_assign = build_ivf_index(
        spark, emb, _cents(emb), str(tmp_path / "idx")
    )
    assert full_assign.lists.current_version() == 2
    old = search_ivf_index(idx, _qset(emb), k=3, n_probe=A.IVF_K, version=1)
    # v1 only ever saw even vec_ids
    assert all(r.vec_id % 2 == 0 for r in old.collect())
    new = search_ivf_index(idx, _qset(emb), k=3, n_probe=A.IVF_K, version=2)
    assert any(r.vec_id % 2 == 1 for r in new.collect())


def test_search_pins_the_paired_quantizer(spark, tmp_path):
    """A lists-only maintenance write (compaction) desyncs the two
    tables' version counters; a pinned search must still pair each lists
    version with the quantizer it was BUILT against, and open_ivf_index
    must reconstruct the declared schema from the build sidecar."""
    from merkonvectordb_spark.operators.index import open_ivf_index

    emb = _corpus(spark)
    root = str(tmp_path / "pairidx")
    idx = build_ivf_index(
        spark, emb, _cents(emb), root, extra_cols=("label",)
    )
    ref = {
        (r["query_id"], r["vec_id"])
        for r in search_ivf_index(idx, _qset(emb), k=3).collect()
    }
    v1 = idx.lists.current_version()
    idx.lists.compact(max_files_per_partition=1)  # lists-only write
    # a SECOND build on the same root: different quantizer version
    build_ivf_index(spark, emb, _cents(emb), root, extra_cols=("label",))
    reopened = open_ivf_index(spark, root)
    assert reopened.lists.schema_ddl == idx.lists.schema_ddl
    # pinned at the FIRST build's lists version: same results as then,
    # even though centroids.current_version() has moved on
    got = {
        (r["query_id"], r["vec_id"])
        for r in search_ivf_index(
            reopened, _qset(emb), k=3, version=v1
        ).collect()
    }
    assert got == ref


def test_append_equals_scratch_build_over_union(spark, tmp_path):
    """Incremental maintenance invariant: build(base) + append(batch)
    answers searches bit-identically to build(base ∪ batch) — per-row
    assignment is independent given a fixed quantizer."""
    from merkonvectordb_spark.operators.index import append_to_ivf_index

    emb = _corpus(spark)
    base = emb.where(F.col("vec_id") % 2 == 0)
    batch = emb.where(F.col("vec_id") % 2 == 1)
    idx = build_ivf_index(
        spark, base, _cents(emb), str(tmp_path / "inc"),
        extra_cols=("label",),
    )
    v_base = idx.lists.current_version()
    v_new = append_to_ivf_index(idx, batch, extra_cols=("label",))
    assert v_new == v_base + 1
    scratch = build_ivf_index(
        spark, emb, _cents(emb), str(tmp_path / "full"),
        extra_cols=("label",),
    )
    got = sorted(
        (r.query_id, r.vec_id, r.label, r.score)
        for r in search_ivf_index(idx, _qset(emb), k=3).collect()
    )
    want = sorted(
        (r.query_id, r.vec_id, r.label, r.score)
        for r in search_ivf_index(scratch, _qset(emb), k=3).collect()
    )
    assert got == want and len(got) == 15
    # time travel: the pre-append version never sees the batch
    old = search_ivf_index(
        idx, _qset(emb), k=3, n_probe=A.IVF_K, version=v_base
    )
    assert all(r.vec_id % 2 == 0 for r in old.collect())


def test_append_assigns_against_the_paired_quantizer(spark, tmp_path):
    """A centroids-table write AFTER the build must not skew a later
    append: the batch is assigned by the quantizer PAIRED with the lists
    version, not by centroids.current_version()."""
    from merkonvectordb_spark.operators.index import append_to_ivf_index

    emb = _corpus(spark)
    base = emb.where(F.col("vec_id") % 2 == 0)
    batch = emb.where(F.col("vec_id") % 2 == 1)
    idx = build_ivf_index(
        spark, base, _cents(emb), str(tmp_path / "drift"),
        extra_cols=("label",),
    )
    # simulate a concurrent quantizer refresh: HALVE the centroid set
    # (a batch assigned against this would use different lists)
    idx.centroids.replace(
        _cents(emb).where(F.col("cid") < A.IVF_K // 2)
    )
    append_to_ivf_index(idx, batch, extra_cols=("label",))
    scratch = build_ivf_index(
        spark, emb, _cents(emb), str(tmp_path / "full2"),
        extra_cols=("label",),
    )
    got = sorted(
        (r.query_id, r.vec_id)
        for r in search_ivf_index(idx, _qset(emb), k=3).collect()
    )
    want = sorted(
        (r.query_id, r.vec_id)
        for r in search_ivf_index(scratch, _qset(emb), k=3).collect()
    )
    assert got == want
