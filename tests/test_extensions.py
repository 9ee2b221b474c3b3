"""UDF / UDAF / UDTF extension surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from merkonvectordb_spark.functions.extensions import (
    char_entropy_udf,
    geometric_mean_udf,
    sentence_udtf,
)


def test_scalar_udf_entropy(spark):
    df = spark.createDataFrame(
        [("aaaa",), ("abab",), ("",), (None,)], "s STRING"
    ).select("s", char_entropy_udf()("s").alias("h"))
    got = {r.s: r.h for r in df.collect()}
    assert got["aaaa"] == 0.0
    assert abs(got["abab"] - 1.0) < 1e-12  # two equiprobable symbols
    assert got[""] is None and got[None] is None


def test_udaf_geometric_mean(spark):
    df = spark.createDataFrame(
        [("g", 1.0), ("g", 100.0), ("h", 5.0)], "k STRING, v DOUBLE"
    )
    got = {
        r.k: r.g
        for r in df.groupBy("k").agg(geometric_mean_udf()("v").alias("g")).collect()
    }
    assert abs(got["g"] - 10.0) < 1e-9  # sqrt(1*100)
    assert abs(got["h"] - 5.0) < 1e-9


def test_udtf_matches_jvm_formulation(spark):
    """The Python UDTF is the extension point; the JVM explode/split is
    the hot-path equivalent — they must agree."""
    Split = sentence_udtf()
    spark.udtf.register("split_sentences", Split)
    got = spark.sql(
        "SELECT * FROM split_sentences('One. Two! Three?')"
    ).collect()
    assert [(r.sent_idx, r.sentence) for r in got] == [
        (0, "One"),
        (1, "Two"),
        (2, "Three"),
    ]
    jvm = (
        spark.createDataFrame([("One. Two! Three?",)], "t STRING")
        .select(
            F.posexplode(
                F.filter(
                    F.transform(
                        F.split(F.translate("t", "!?", ".."), r"\."),
                        lambda x: F.trim(x),
                    ),
                    lambda x: x != F.lit(""),
                )
            ).alias("sent_idx", "sentence")
        )
        .collect()
    )
    assert [(r.sent_idx, r.sentence) for r in jvm] == [
        (r.sent_idx, r.sentence) for r in got
    ]


def test_udaf_empty_group_is_null(spark):
    """NaN crosses the Arrow hop as NULL (the round-1 cosine lesson) —
    the contract is NULL for an unscorable group, in BOTH paths."""
    df = spark.createDataFrame([("g", -1.0)], "k STRING, v DOUBLE")
    out = df.groupBy("k").agg(geometric_mean_udf()("v").alias("g")).collect()
    assert out[0].g is None
