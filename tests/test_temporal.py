"""Edge semantics of the temporal joins (operators/temporal.py).

The fixture-scale oracle queries (queries_temporal) already hash-match
DuckDB's native ASOF JOIN / inequality join; these tests pin the edge
cases hash-matching could survive by accident: equal-timestamp
inclusivity, no-prior-row NULLs, bin-boundary containment, and
intervals longer than one bin.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from merkonvectordb_spark.operators.temporal import asof_join, interval_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 100.0),
            (1, _ts("2024-01-01 10:05:00"), 101.0),
            (2, _ts("2024-01-01 10:03:00"), 200.0),
        ],
        "k LONG, ts TIMESTAMP, px DOUBLE",
    )


def test_asof_basic_and_equal_ts_inclusive(spark, quotes):
    trades = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:02:00")),  # after first quote
            (1, _ts("2024-01-01 10:05:00")),  # EXACTLY at second quote
            (2, _ts("2024-01-01 10:10:00")),
        ],
        "k LONG, ts TIMESTAMP",
    )
    out = {
        (r["k"], r["ts"]): r["px_right"]
        for r in asof_join(
            trades, quotes, on=["k"], right_cols=["px"]
        ).collect()
    }
    assert out[(1, _ts("2024-01-01 10:02:00"))] == 100.0
    # inclusive: a right row AT the left timestamp matches
    assert out[(1, _ts("2024-01-01 10:05:00"))] == 101.0
    assert out[(2, _ts("2024-01-01 10:10:00"))] == 200.0


def test_asof_no_prior_row_is_null(spark, quotes):
    trades = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"))], "k LONG, ts TIMESTAMP"
    )
    rows = asof_join(trades, quotes, on=["k"], right_cols=["px"]).collect()
    assert len(rows) == 1  # left rows always survive
    assert rows[0]["px_right"] is None and rows[0]["ts_right"] is None


def test_asof_carries_whole_rows_not_per_column_lasts(spark):
    """Right rows with NULLs in DIFFERENT payload columns must never
    blend: the carried payload is the latest right ROW as a unit (struct
    carry), not each column's latest non-null value independently."""
    quotes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 100.0, None),
            (1, _ts("2024-01-01 10:01:00"), None, 7.0),
        ],
        "k LONG, ts TIMESTAMP, px DOUBLE, sz DOUBLE",
    )
    trades = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:02:00"))], "k LONG, ts TIMESTAMP"
    )
    row = asof_join(
        trades, quotes, on=["k"], right_cols=["px", "sz"]
    ).collect()[0]
    # winner is the 10:01 row AS A WHOLE: px must be its NULL, not the
    # 10:00 row's 100.0 bleeding through
    assert row["ts_right"] == _ts("2024-01-01 10:01:00")
    assert row["px_right"] is None
    assert row["sz_right"] == 7.0


def test_asof_key_isolation(spark, quotes):
    # key 3 has no quotes at all: must not borrow key 1's
    trades = spark.createDataFrame(
        [(3, _ts("2024-01-01 12:00:00"))], "k LONG, ts TIMESTAMP"
    )
    rows = asof_join(trades, quotes, on=["k"], right_cols=["px"]).collect()
    assert rows[0]["px_right"] is None


@pytest.fixture(scope="module")
def intervals(spark):
    # 600s bins; second interval spans a bin boundary, third is 3 bins long
    return spark.createDataFrame(
        [
            (10, 1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:05:00")),
            (11, 1, _ts("2024-01-01 10:08:00"), _ts("2024-01-01 10:12:00")),
            (12, 1, _ts("2024-01-01 11:00:00"), _ts("2024-01-01 11:25:00")),
        ],
        "iid LONG, k LONG, s TIMESTAMP, e TIMESTAMP",
    )


def _events(spark, rows):
    return spark.createDataFrame(rows, "k LONG, ts TIMESTAMP")


def _match_ids(events_df, intervals):
    out = interval_join(
        events_df, intervals, on=["k"], left_ts="ts", start="s", end="e"
    )
    return sorted(r["iid"] for r in out.collect())


def test_interval_half_open(spark, intervals):
    # at start → in; at end → out
    assert _match_ids(
        _events(spark, [(1, _ts("2024-01-01 10:00:00"))]), intervals
    ) == [10]
    assert _match_ids(
        _events(spark, [(1, _ts("2024-01-01 10:05:00"))]), intervals
    ) == []


def test_interval_bin_boundary_crossing(spark, intervals):
    # interval 11 spans the 10:10 bin boundary; events on both sides match
    assert _match_ids(
        _events(spark, [(1, _ts("2024-01-01 10:09:00"))]), intervals
    ) == [11]
    assert _match_ids(
        _events(spark, [(1, _ts("2024-01-01 10:11:59"))]), intervals
    ) == [11]


def test_interval_longer_than_bin(spark, intervals):
    # interval 12 covers three 600s bins; a mid-bin event still matches once
    assert _match_ids(
        _events(spark, [(1, _ts("2024-01-01 11:15:00"))]), intervals
    ) == [12]


def test_interval_overlapping_multiplicity(spark):
    # overlapping intervals: event matches BOTH (true join multiplicity)
    iv = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:20:00")),
            (2, 1, _ts("2024-01-01 10:10:00"), _ts("2024-01-01 10:30:00")),
        ],
        "iid LONG, k LONG, s TIMESTAMP, e TIMESTAMP",
    )
    assert _match_ids(
        _events(spark, [(1, _ts("2024-01-01 10:15:00"))]), iv
    ) == [1, 2]


def test_asof_single_shuffle_plan(spark, quotes):
    trades = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:02:00"))], "k LONG, ts TIMESTAMP"
    )
    out = asof_join(trades, quotes, on=["k"], right_cols=["px"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union-merge shape: ONE hash exchange on the key, no join node
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_scd2_history_intervals_and_single_shuffle(spark):
    import datetime as dt

    from merkonvectordb_spark.operators.temporal import scd2_history

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        (1, "a", t(1), 1), (1, "a", t(2), 2),  # run of a
        (1, "b", t(3), 3),                      # change -> close a at t3
        (1, "a", t(5), 4),                      # back to a (new interval!)
        (2, "x", t(9), 5),                      # single open row
    ]
    df = spark.createDataFrame(
        rows, "user_id LONG, event_type STRING, ts TIMESTAMP, event_id LONG"
    )
    out = scd2_history(
        df, ("user_id",), "event_type", "ts", ("ts", "event_id")
    )
    # read the plan BEFORE executing: after an action, AdaptiveSparkPlan
    # toString prints Final AND Initial sections (double-counts operators)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re as _re

    assert len(_re.findall(r"Exchange hashpartitioning", plan)) == 1
    got = sorted(
        (r.user_id, r.event_type, r.valid_from.second,
         r.valid_to.second if r.valid_to else None)
        for r in out.collect()
    )
    assert got == [
        (1, "a", 1, 3),   # repeated 'a' collapses into one interval
        (1, "a", 5, None),  # returning to 'a' opens a NEW interval
        (1, "b", 3, 5),
        (2, "x", 9, None),
    ]


def test_scd2_null_attribute_is_a_run(spark):
    """Review finding: a transition INTO NULL must open its own validity
    interval — a bare != extended the previous value through the NULL
    period."""
    from merkonvectordb_spark.operators.temporal import scd2_history

    df = spark.createDataFrame(
        [(1, "a", 1), (1, None, 2), (1, "b", 3), (1, "b", 4)],
        "k LONG, attr STRING, ts LONG",
    )
    rows = {
        r.valid_from: (r.attr, r.valid_to)
        for r in scd2_history(df, ["k"], "attr", "ts", ("ts",)).collect()
    }
    assert rows == {1: ("a", 2), 2: (None, 3), 3: ("b", None)}
