"""Cost-based kNN routing: decision correctness and plan equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from merkonvectordb_spark.plans.router import (
    estimate_rows,
    route_knn_batch,
)
from merkonvectordb_spark.schema import load_table

SF_DIR = "/root/testdata/sf0.001"


def _fixtures(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    qset = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return emb, qset


def test_estimate_rows_without_a_job(spark):
    emb, _ = _fixtures(spark)
    est = estimate_rows(emb, row_bytes=4 * 64 + 32)
    exact = emb.count()
    # catalog-size estimate is order-of-magnitude, never zero
    assert est > 0
    assert est / exact < 100 and exact / est < 100


def test_router_brute_under_budget_matches_knn_batch(spark):
    from merkonvectordb_spark.operators.search import knn_batch

    emb, qset = _fixtures(spark)
    decision, routed = route_knn_batch(
        emb, qset, k=3, dim=64, n_queries=3,
        flop_budget=1e15,
        brute_kwargs={"tie_break": "vec_id"},
    )
    assert decision.strategy == "brute"
    direct = knn_batch(emb, qset, k=3, tie_break="vec_id")
    cols = ["query_id", "vec_id", "score"]
    assert sorted(map(tuple, routed.select(cols).collect())) == sorted(
        map(tuple, direct.select(cols).collect())
    )


def test_router_switches_to_ann_over_budget(spark):
    emb, qset = _fixtures(spark)
    decision, routed = route_knn_batch(
        emb, qset, k=3, dim=64, n_queries=3,
        flop_budget=1.0,  # everything exceeds this
    )
    assert decision.strategy == "ann"
    assert decision.est_flops > decision.budget
    out = routed.collect()
    assert len(out) > 0  # the ANN plan runs and returns candidates


def test_router_respects_exactness_requirement(spark):
    emb, qset = _fixtures(spark)
    decision, _ = route_knn_batch(
        emb, qset, k=3, dim=64, n_queries=3,
        flop_budget=1.0,
        allow_approx=False,
        brute_kwargs={"tie_break": "vec_id"},
    )
    assert decision.strategy == "brute"  # never silently approximate


def test_router_picks_sq8_when_io_bound(spark):
    """Compute within budget but scan bytes over it: the byte-reduction
    path (SQ8) wins over both brute force and candidate pruning."""
    emb, qset = _fixtures(spark)
    decision, routed = route_knn_batch(
        emb, qset, k=3, dim=64, n_queries=3,
        flop_budget=1e15,  # compute is fine
        byte_budget=1.0,   # IO is not
    )
    assert decision.strategy == "sq8"
    out = routed.collect()
    assert len(out) > 0
    assert {r.query_id for r in out} <= {0, 1, 2}


def test_router_picks_ivfpq_when_both_bounds_fire(spark):
    emb, qset = _fixtures(spark)
    from merkonvectordb_spark.operators.ann import IVF_K

    valid = emb.where(F.size("embedding") == 64)
    cents = valid.where(F.col("vec_id") < IVF_K).select(
        F.col("vec_id").alias("cid"),
        F.transform("embedding", lambda x: x.cast("double")).alias("cv"),
    )
    decision, routed = route_knn_batch(
        emb, qset, k=3, dim=64, n_queries=3,
        flop_budget=1.0, byte_budget=1.0,  # both blown
        ivfpq_kwargs={"centroids": cents},
    )
    assert decision.strategy == "ivfpq"
    assert decision.binding_resource == "flops+bytes"
    assert len(routed.collect()) > 0


def test_router_falls_back_to_ann_without_centroids(spark):
    emb, qset = _fixtures(spark)
    decision, _ = route_knn_batch(
        emb, qset, k=3, dim=64, n_queries=3,
        flop_budget=1.0, byte_budget=1.0,
    )
    # no IVF-PQ index material supplied → candidate pruning still routes
    assert decision.strategy == "ann"


def test_stats_less_source_routes_exact_not_approx(spark):
    """An RDD-backed plan reports defaultSizeInBytes (Long.MaxValue) —
    the router must treat that as UNKNOWN and stay exact, not inflate
    the estimate to ~1e16 rows and silently go approximate."""
    from merkonvectordb_spark.plans.router import (
        estimate_rows,
        route_knn_batch,
    )

    rdd = spark.sparkContext.parallelize(
        [(i, [float(i), 1.0]) for i in range(20)]
    )
    corpus = spark.createDataFrame(rdd, "vec_id LONG, embedding ARRAY<DOUBLE>")
    assert estimate_rows(corpus, row_bytes=40) is None
    qs = corpus.limit(2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    decision, plan = route_knn_batch(
        corpus, qs, k=3, dim=2, n_queries=2, flop_budget=1.0
    )
    assert decision.strategy == "brute"
    assert plan.count() > 0
