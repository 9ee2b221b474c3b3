"""R2 helper-surface tests (reference Linq/AsyncEnumerable.cs semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from merkonvectordb_spark.functions.strings import (
    is_null_or_empty,
    normalize_line_endings,
)
from merkonvectordb_spark.operators import linq


def _df(spark):
    return spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "key STRING, seq LONG"
    )


def test_first_last(spark):
    df = _df(spark)
    assert linq.first_or_none(df, ["seq"]).key == "a"
    assert linq.last_or_none(df, ["seq"]).key == "c"
    empty = df.where(F.col("seq") > 99)
    assert linq.first_or_none(empty, ["seq"]) is None
    assert linq.last_or_none(empty, ["seq"]) is None


def test_count_any_contains_to_list(spark):
    df = _df(spark)
    assert linq.count(df) == 3
    assert linq.any_match(df, F.col("seq") > 2)
    assert not linq.any_match(df, F.col("seq") > 99)
    assert linq.contains(df, "key", "b")
    assert not linq.contains(df, "key", "z")
    assert [r.key for r in linq.to_list(df.orderBy("seq"))] == ["a", "b", "c"]


def test_summary_matches_helpers(spark):
    df = _df(spark)
    row = linq.summary(
        df, key_col="key", order_col="seq",
        any_pred=F.col("seq") > 2, contains_value="b",
    ).first()
    assert (row.first_key, row.last_key, row.n_rows) == ("a", "c", 3)
    assert row.any_match and row.contains_key


def test_string_normalization(spark):
    df = spark.createDataFrame(
        [(1, "a\r\nb\r\nc"), (2, "plain"), (3, ""), (4, None)],
        "id LONG, s STRING",
    )
    out = {r.id: (r.n, r.e) for r in df.select(
        "id",
        normalize_line_endings(F.col("s")).alias("n"),
        is_null_or_empty(F.col("s")).alias("e"),
    ).collect()}
    assert out[1] == ("a\nb\nc", False)
    assert out[2] == ("plain", False)
    assert out[3] == ("", True)
    assert out[4] == (None, True)
