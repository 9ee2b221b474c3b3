"""Dedup operator tests (exact now; near-dup variants join as they land)."""

from __future__ import annotations

from pyspark.sql import functions as F

from merkonvectordb_spark.operators.dedup import exact_dedup, keep_survivors
from merkonvectordb_spark.plans import executed_plan


def _corpus(spark):
    rows = [
        (1, "The quick brown fox"),
        (2, "the  quick   BROWN fox "),  # dup of 1 after normalization
        (3, "a different document"),
        (4, "A DIFFERENT document"),  # dup of 3
        (5, "unique content here"),
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_exact_dedup_groups(spark):
    out = exact_dedup(_corpus(spark), "text", "doc_id").collect()
    by_survivor = {r.survivor_id: r.group_sz for r in out}
    assert by_survivor == {1: 2, 3: 2, 5: 1}


def test_keep_survivors(spark):
    kept = keep_survivors(_corpus(spark), "text", "doc_id")
    assert sorted(r.doc_id for r in kept.collect()) == [1, 3, 5]
    # survivor keeps its original (un-normalized) payload
    assert kept.where(F.col("doc_id") == 1).first().text == "The quick brown fox"


def test_exact_dedup_shuffle_is_aggregated(spark):
    # the plan must partial-aggregate before the exchange: one shuffled row
    # per distinct fingerprint, not per input row (100 TB gate)
    plan = executed_plan(exact_dedup(_corpus(spark), "text", "doc_id"))
    before_exchange = plan.split("Exchange")[-1]  # text BELOW the exchange
    assert "partial_min" in before_exchange or "partial" in before_exchange
