"""CDC application (operators.cdc): log-replay semantics + plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from merkonvectordb_spark.operators.cdc import apply_changes

DDL = "k LONG, seq LONG, op STRING, v STRING"


def test_latest_wins_and_delete_semantics(spark):
    log = spark.createDataFrame(
        [
            (1, 1, "U", "a1"),
            (1, 2, "U", "a2"),      # latest for key 1
            (2, 3, "U", "b1"),
            (2, 4, "D", None),      # key 2 deleted
            (3, 5, "D", None),
            (3, 6, "U", "c-back"),  # delete then re-insert: revived
        ],
        DDL,
    )
    snap = {r.k: (r.seq, r.v) for r in apply_changes(log, ["k"], "seq").collect()}
    assert snap == {1: (2, "a2"), 3: (6, "c-back")}


def test_apply_changes_is_one_aggregate_no_window(spark):
    """The argmax must be a partial-aggregable max_by (map-side combine,
    one exchange), never a per-row window over the whole log."""
    log = spark.createDataFrame([(1, 1, "U", "x")], DDL).repartition(4)
    snap = apply_changes(log, ["k"], "seq")
    plan = snap._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial" in plan.lower()  # map-side partial aggregation


def test_apply_changes_null_op_is_upsert(spark):
    """Review finding: a NULL op (CDC encodings that only mark deletes)
    must be treated as insert-or-update, not silently dropped."""
    from merkonvectordb_spark.operators.cdc import apply_changes

    log = spark.createDataFrame(
        [(1, 1, None, "a"), (2, 1, "D", "b"), (2, 2, None, "b2")],
        "k LONG, seq LONG, op STRING, v STRING",
    )
    got = {r.k: r.v for r in apply_changes(log, ["k"], "seq", "op").collect()}
    assert got == {1: "a", 2: "b2"}
