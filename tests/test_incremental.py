"""Incremental aggregate maintenance ≡ full recompute."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from merkonvectordb_spark.operators.incremental import (
    aggregate_state,
    merge_states,
)

AGGS = {
    "n": ("count", "v"),
    "s": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


def test_multi_round_maintenance_equals_recompute(spark):
    df = spark.range(3000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 3 % 101).alias("v")
    )
    # three maintenance rounds over disjoint slices
    slices = [df.where(F.col("id") % 3 == i) for i in range(3)]
    state = aggregate_state(slices[0], ["k"], AGGS)
    for delta in slices[1:]:
        state = merge_states(
            state, aggregate_state(delta, ["k"], AGGS), ["k"], AGGS
        )
    got = sorted(map(tuple, state.collect()))
    want = sorted(map(tuple, aggregate_state(df, ["k"], AGGS).collect()))
    assert got == want


def test_new_and_untouched_keys(spark):
    hist = spark.createDataFrame([(1, 10), (2, 20)], "k LONG, v LONG")
    delta = spark.createDataFrame([(2, 5), (3, 7)], "k LONG, v LONG")
    out = {
        r.k: (r.n, r.s, r.lo, r.hi)
        for r in merge_states(
            aggregate_state(hist, ["k"], AGGS),
            aggregate_state(delta, ["k"], AGGS),
            ["k"],
            AGGS,
        ).collect()
    }
    assert out[1] == (1, 10, 10, 10)  # untouched key passes through
    assert out[2] == (2, 25, 5, 20)  # merged key folds both sides
    assert out[3] == (1, 7, 7, 7)  # new key appears


def test_rejects_non_distributive(spark):
    df = spark.createDataFrame([(1, 1)], "k LONG, v LONG")
    with pytest.raises(ValueError):
        aggregate_state(df, ["k"], {"p": ("percentile", "v")})
    with pytest.raises(ValueError):
        merge_states(df, df, ["k"], {"p": ("avg", "v")})
