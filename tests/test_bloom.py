"""Bloom-filter semi-join: exactness, pruning power, degenerate cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from merkonvectordb_spark.operators.bloom import (
    bloom_filter_rows,
    bloom_semi_join,
    build_bloom,
)


def test_equals_plain_semi_join(spark):
    fact = spark.range(0, 5000).select(
        (F.col("id") % 997).alias("key"), F.col("id").alias("payload")
    )
    dim = spark.range(0, 200).select((F.col("id") * 7).alias("dkey"))
    got = sorted(
        (r["key"], r["payload"])
        for r in bloom_semi_join(fact, dim, "key", "dkey").collect()
    )
    want = sorted(
        (r["key"], r["payload"])
        for r in fact.join(
            dim.select(F.col("dkey").alias("key")), "key", "semi"
        ).collect()
    )
    assert got == want and len(got) > 0


def test_no_false_negatives_and_prunes(spark):
    # 10k fact keys, 50 dim keys: the pre-filter must pass every true
    # match and (at 64 Kbit / k=3 / n=50) kill essentially all others.
    fact = spark.range(0, 10_000).select(F.col("id").alias("key"))
    dim = spark.range(0, 50).select((F.col("id") * 101).alias("dkey"))
    words = build_bloom(dim, "dkey")
    passed = bloom_filter_rows(fact, "key", words).count()
    true_matches = fact.join(
        dim.select(F.col("dkey").alias("key")), "key", "semi"
    ).count()
    assert true_matches == 50
    assert passed >= true_matches  # no false negatives
    assert passed < 200  # pruning actually happened (FP ~0.0004%)


def test_empty_build_side(spark):
    fact = spark.range(0, 100).select(F.col("id").alias("key"))
    dim = spark.range(0, 0).select(F.col("id").alias("dkey"))
    assert bloom_semi_join(fact, dim, "key", "dkey").count() == 0


def test_null_keys_dropped(spark):
    fact = spark.createDataFrame(
        [(1,), (None,), (2,)], "key long"
    )
    dim = spark.createDataFrame([(1,), (None,)], "dkey long")
    got = [r["key"] for r in bloom_semi_join(fact, dim, "key", "dkey").collect()]
    assert got == [1]


def test_filter_is_scan_local(spark):
    # the bloom pre-filter must evaluate below any exchange: the filtered
    # frame's plan contains no Exchange at all (pure scan+project+filter)
    fact = spark.range(0, 1000).select(F.col("id").alias("key"))
    dim = spark.range(0, 10).select(F.col("id").alias("dkey"))
    words = build_bloom(dim, "dkey")
    plan = (
        bloom_filter_rows(fact, "key", words)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
