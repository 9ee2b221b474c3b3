"""Materialized-view contract: incremental refresh chain ≡ one-shot,
version history across refreshes."""

from __future__ import annotations

from pyspark.sql import functions as F

from merkonvectordb_spark.operators.matview import MaterializedView

_DDL = "k STRING, n LONG, total LONG, mx LONG"
_AGGS = {
    "n": ("count", "v"),
    "total": ("sum", "v"),
    "mx": ("max", "v"),
}


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        (F.col("id") % 7).cast("string").alias("k"),
        F.col("id").alias("v"),
    )


def _snap(df):
    return sorted(map(tuple, df.select("k", "n", "total", "mx").collect()))


def test_incremental_chain_equals_one_shot(spark, tmp_path):
    mv = MaterializedView(
        spark, str(tmp_path / "mv1"), _DDL, ["k"], _AGGS
    )
    mv.refresh_full(_rows(spark, 0, 100))
    mv.refresh_incremental(_rows(spark, 100, 250))
    mv.refresh_incremental(_rows(spark, 250, 300))
    got = _snap(mv.read())
    want_mv = MaterializedView(
        spark, str(tmp_path / "mv_oneshot"), _DDL, ["k"], _AGGS
    )
    want_mv.refresh_full(_rows(spark, 0, 300))
    assert got == _snap(want_mv.read())


def test_versions_time_travel_across_refreshes(spark, tmp_path):
    mv = MaterializedView(
        spark, str(tmp_path / "mv2"), _DDL, ["k"], _AGGS
    )
    v1 = mv.refresh_full(_rows(spark, 0, 50))
    before = _snap(mv.read())
    v2 = mv.refresh_incremental(_rows(spark, 50, 80))
    assert v2 > v1
    # historical version still reads the pre-refresh state
    assert _snap(mv.read(v1)) == before
    assert _snap(mv.read()) != before


def test_new_keys_appear_via_delta(spark, tmp_path):
    mv = MaterializedView(
        spark, str(tmp_path / "mv3"), "k STRING, n LONG", ["k"],
        {"n": ("count", "v")},
    )
    mv.refresh_full(
        spark.createDataFrame([("a", 1), ("a", 2)], "k STRING, v LONG")
    )
    mv.refresh_incremental(
        spark.createDataFrame([("b", 3)], "k STRING, v LONG")
    )
    got = {r.k: r.n for r in mv.read().collect()}
    assert got == {"a": 2, "b": 1}


def test_incremental_refresh_exactly_once(spark, tmp_path):
    """A redelivered foreachBatch delta must not double-count: with
    app_id/batch_id, a batch at or below the committed watermark is a
    no-op, and the watermark commits atomically with the merged state."""
    mv = MaterializedView(
        spark, str(tmp_path / "mv_eo"), "k STRING, n LONG", ["k"],
        {"n": ("count", "v")},
    )
    mv.refresh_full(
        spark.createDataFrame([("a", 1)], "k STRING, v LONG")
    )
    delta = spark.createDataFrame([("a", 2), ("b", 3)], "k STRING, v LONG")
    v = mv.refresh_incremental(delta, app_id="job", batch_id=7)
    # redelivery of the same batch: same version back, state unchanged
    assert mv.refresh_incremental(delta, app_id="job", batch_id=7) == v
    assert {r.k: r.n for r in mv.read().collect()} == {"a": 2, "b": 1}
    # the next batch folds normally
    mv.refresh_incremental(
        spark.createDataFrame([("b", 4)], "k STRING, v LONG"),
        app_id="job", batch_id=8,
    )
    assert {r.k: r.n for r in mv.read().collect()} == {"a": 2, "b": 2}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="together"):
        mv.refresh_incremental(delta, app_id="job")
