"""Temporal-join queries (as-of + interval) over the events fixture.

The as-of oracle uses DuckDB's NATIVE ``ASOF JOIN`` — an independent
implementation of the same semantics, not a mirror of our plan — so a
hash match here is evidence the union-merge shape (operators/temporal.py)
is semantically correct, not merely self-consistent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from merkonvectordb_spark.operators.temporal import asof_join, interval_join
from merkonvectordb_spark.registry import register
from merkonvectordb_spark.schema import load_table

# ---------------------------------------------------------------------------
# as-of: each purchase matched to the user's latest click at-or-before it.
# The click side is deduplicated to one row per (user_id, ts) — max
# event_id — so the greatest-ts match is unique and both engines agree
# without relying on tie-break internals.
# ---------------------------------------------------------------------------

_ASOF_ORACLE = """
WITH clicks AS (
  SELECT user_id, ts, max(event_id) AS click_id
  FROM events WHERE event_type = 'click'
  GROUP BY user_id, ts
),
purchases AS (
  SELECT event_id AS purchase_id, user_id, ts
  FROM events WHERE event_type = 'purchase'
)
SELECT p.purchase_id, p.user_id,
       c.click_id,
       CAST(date_diff('microsecond', c.ts, p.ts) AS BIGINT) AS wait_us
FROM purchases p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""".strip()


@register("events_asof_join", _ASOF_ORACLE)
def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: purchases ← latest click per user (inclusive).

    Union-merge plan: ONE shuffle of |purchases|+|clicks| rows hash-
    partitioned by user, a running ``last(ignorenulls)`` window per user,
    no inequality cross product — the shape that survives dense keys at
    100 TB (vs. range-join + per-row argmax, which explodes)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["click_id"],
    )
    return joined.select(
        "purchase_id",
        "user_id",
        F.col("click_id_right").alias("click_id"),
        (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts_right"))
        ).alias("wait_us"),
    )


# ---------------------------------------------------------------------------
# interval join: 10-minute incident windows opened by each error event;
# count same-user activity inside each window.
# ---------------------------------------------------------------------------

# CAST(ts AS TIMESTAMP) pins µs precision in the oracle regardless of
# the harness DuckDB build's parquet timestamp surface (a ns-native
# reader would otherwise evaluate the containment boundaries at ns
# while Spark's scan is µs) — r4 driver-red hedge, cf. queries_events.
_RANGE_ORACLE = """
WITH ev AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
  FROM events
),
inc AS (
  SELECT event_id AS incident_id, user_id,
         ts AS w_start, ts + INTERVAL 600 SECOND AS w_end
  FROM ev WHERE event_type = 'error'
)
SELECT i.incident_id,
       count(*) AS n_events,
       CAST(sum(CAST(floor(e.value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM inc i
JOIN ev e
  ON e.user_id = i.user_id AND e.ts >= i.w_start AND e.ts < i.w_end
GROUP BY i.incident_id
""".strip()


@register("events_range_join", _RANGE_ORACLE)
def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval containment join: events × same-user 10-min error windows.

    Bucketed plan (operators.temporal.interval_join): intervals explode
    into ≤2 time bins, events equi-join on (user_id, bin), exact
    containment filters — candidate count is bin-bucket-bounded, never
    the |events|×|errors| cross product the oracle's inequality join
    forms."""
    ev = load_table(spark, sf_dir, "events")
    inc = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 600 SECONDS")).alias("w_end"),
    )
    left = ev.select("user_id", "ts", "value")
    matched = interval_join(
        left,
        inc,
        on=["user_id"],
        left_ts="ts",
        start="w_start",
        end="w_end",
        bin_seconds=600,
    )
    return matched.groupBy("incident_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias(
            "sum_cents"
        ),
    )


# ---------------------------------------------------------------------------
# sliding window analytics: per-user 5-row moving average over event
# values — window-function surface coverage with a direct SQL twin.
# ---------------------------------------------------------------------------

_MOVING_ORACLE = """
SELECT event_id, user_id,
       round(avg(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS mov_avg,
       count(*) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS n_in_window
FROM events
""".strip()


@register("events_moving_avg", _MOVING_ORACLE)
def q_events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 5-row trailing moving average: one hash-partition window
    (user_id), deterministic (ts, event_id) order, no second shuffle."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-4, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 6).alias("mov_avg"),
        F.count(F.lit(1)).over(w).alias("n_in_window"),
    )


@register(
    "events_scd2_history",
    """
WITH marked AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
changes AS (
  SELECT user_id, event_type, ts, event_id FROM marked
  WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type, epoch_us(ts) AS valid_from_us,
       epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS valid_to_us
FROM changes
""".strip(),
)
def q_events_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 historization of each user's event_type: the event log
    collapses into validity intervals (valid_to NULL = current).  Both
    windows share one hash partitioning on user_id — a single shuffle
    of the log, no self-joins (operators.temporal.scd2_history).
    Validity bounds ship as epochs (registry invariant: no raw
    TIMESTAMP output columns — collect() rendering is process-zone
    dependent)."""
    from merkonvectordb_spark.operators.temporal import scd2_history

    ev = load_table(spark, sf_dir, "events")
    hist = scd2_history(
        ev,
        key_cols=("user_id",),
        attr_col="event_type",
        ts_col="ts",
        order_cols=("ts", "event_id"),
    )
    return hist.select(
        "user_id",
        "event_type",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
    )


@register(
    "events_time_window_agg",
    """
SELECT event_id, user_id,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT) AS sum_cents_1h,
       count(*) OVER w AS n_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""".strip(),
)
def q_events_time_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-based trailing window (vs the ROW-based moving average):
    each event's sum/count over the same user's preceding hour, as a
    RANGE frame on epoch micros.  One hash-partition window, no second
    shuffle; frame membership is defined by event time, so ties at the
    same microsecond share identical frames in both engines.  The frame
    sum is integer cents: DuckDB evaluates window sums via segment tree
    while Spark folds in frame order, so a DOUBLE sum could land on
    opposite sides of a 2dp rounding tick — BIGINT sums are fold-order
    free."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600 * 1_000_000, Window.currentRow)
    )
    cents = F.floor(F.col("value") * 100).cast("bigint")
    return ev.select(
        "event_id",
        "user_id",
        F.sum(cents).over(w).alias("sum_cents_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )


@register(
    "events_gap_fill_locf",
    """
WITH hourly AS (
  SELECT user_id, time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS h,
         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS v
  FROM events WHERE user_id < 20
  GROUP BY 1, 2
),
bounds AS (
  SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY user_id
),
grid AS (
  SELECT b.user_id, g.h
  FROM bounds b, unnest(generate_series(b.h0, b.h1, INTERVAL '1 hour')) AS g(h)
),
joined AS (
  SELECT g.user_id, g.h, hr.v,
         count(hr.v) OVER (PARTITION BY g.user_id ORDER BY g.h) AS grp
  FROM grid g LEFT JOIN hourly hr ON hr.user_id = g.user_id AND hr.h = g.h
)
SELECT user_id, epoch_us(h) AS hour_us,
       max(v) OVER (PARTITION BY user_id, grp) AS v_filled_cents,
       (v IS NULL) AS was_gap
FROM joined
""".strip(),
)
def q_events_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling with last-observation-carried-forward:
    per user, a dense hourly grid between their first and last events
    (``sequence`` — no driver-side calendar), left-joined to the hourly
    rollup, gaps filled by the previous present value (``last_value
    IGNORE NULLS`` trailing window).  The grid explode is bounded by
    (users × their own span), the fill is one hash-partition window —
    the hypertable-rollup shape.  ``user_id < 20`` keeps fixture output
    proportionate; the plan is user-count-independent."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 20)
    hourly = ev.groupBy(
        "user_id",
        # window(), not date_trunc(): pure epoch arithmetic, immune to a
        # harness re-pinning the session zone between build and collect
        F.window("ts", "1 hour").getField("start").alias("h"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("v")
    )
    bounds = hourly.groupBy("user_id").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    joined = grid.join(hourly, ["user_id", "h"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.unix_micros("h").alias("hour_us"),
        F.last("v", ignorenulls=True).over(w).alias("v_filled_cents"),
        F.col("v").isNull().alias("was_gap"),
    )


@register(
    "events_outliers_p99",
    """
WITH thr AS (
  SELECT event_type, quantile_cont(value, 0.99) AS p99
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.user_id, e.event_type,
       round(e.value, 2) AS value,
       round(t.p99, 6) AS type_p99
FROM events e JOIN thr t USING (event_type)
WHERE e.value > t.p99
""".strip(),
)
def q_events_outliers_p99(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier detection with a deterministic rule: events above their
    type's exact p99.  Percentile thresholds (5 groups, broadcast back)
    instead of mean+3σ because exact order statistics hash-match across
    engines while variance accumulates in engine-dependent FP order —
    the same determinism discipline as the quantile suite."""
    from merkonvectordb_spark.operators.stats import (
        grouped_exact_quantiles_ranged,
    )

    ev = load_table(spark, sf_dir, "events")
    # grouped_exact_quantiles_ranged, not percentile(): 5 event types ×
    # 10 M events is exactly the few-huge-groups case where the
    # aggregate's per-group value map (unspillable) dies first at scale
    # AND where a per-group window sort would run on 5 tasks; the
    # ranged form sorts on (group, value) range partitions — every core
    # works — and its interpolation is bit-identical (round 9, pinned
    # in test_plan_shapes)
    thr = F.broadcast(
        grouped_exact_quantiles_ranged(
            ev.select("event_type", "value"),
            ["event_type"],
            "value",
            {"p99": 0.99},
        ).select("event_type", "p99")
    )
    return (
        ev.join(thr, "event_type")
        .where(F.col("value") > F.col("p99"))
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.round("value", 2).alias("value"),
            F.round("p99", 6).alias("type_p99"),
        )
    )


@register(
    "events_hierarchical_rollup",
    """
WITH lvl_minute AS (
  SELECT 'minute' AS lvl, time_bucket(INTERVAL '1 minute', ts) AS bucket_ts,
         event_type, count(*) AS n_events,
         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
  FROM events GROUP BY 2, 3
),
lvl_hour AS (
  SELECT 'hour', time_bucket(INTERVAL '1 hour', ts), event_type, count(*),
         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
  FROM events GROUP BY 2, 3
),
lvl_day AS (
  SELECT 'day', time_bucket(INTERVAL '1 day', ts), event_type, count(*),
         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
  FROM events GROUP BY 2, 3
)
SELECT lvl, epoch_us(bucket_ts) AS bucket_us, event_type, n_events, sum_cents
FROM (SELECT * FROM lvl_minute UNION ALL SELECT * FROM lvl_hour
      UNION ALL SELECT * FROM lvl_day)
""".strip(),
)
def q_events_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical rollup: the RAW stream is aggregated
    ONCE at the finest grain (minute), and every coarser level is
    re-aggregated from the previous level's partials — hour from
    |minute-buckets| rows, day from |hour-buckets| rows — never from the
    events again.  The oracle computes each level directly from raw, so
    the hash match proves reaggregation-from-partials ≡ direct (count
    and integer-cent sums are associative; that associativity is the
    entire contract of a continuous-aggregate hierarchy).  At 100 TB the
    raw stream is scanned once; the hierarchy costs |buckets|-sized
    shuffles."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("bigint")
    minute = ev.groupBy(
        F.date_trunc("minute", "ts").alias("bucket_ts"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(cents).alias("sum_cents"),
    )
    minute = minute.localCheckpoint(eager=False)  # partials computed once
    hour = minute.groupBy(
        F.date_trunc("hour", "bucket_ts").alias("bucket_ts"), "event_type"
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_cents").alias("sum_cents"),
    )
    day = hour.groupBy(
        F.date_trunc("day", "bucket_ts").alias("bucket_ts"), "event_type"
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_cents").alias("sum_cents"),
    )

    def lvl(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("lvl"),
            F.unix_micros("bucket_ts").alias("bucket_us"),
            "event_type",
            "n_events",
            "sum_cents",
        )

    return (
        lvl(minute, "minute").unionByName(lvl(hour, "hour"))
        .unionByName(lvl(day, "day"))
    )


@register(
    "events_value_trend",
    """
WITH base AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
t0 AS (SELECT min(sec) AS m FROM base),
c AS (SELECT event_type, sec - t0.m AS x, cents AS y FROM base CROSS JOIN t0),
s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM c GROUP BY event_type
)
SELECT event_type, n,
       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)
         AS slope_cents_per_sec,
       round((CAST(sy AS DOUBLE)
              - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                * sx) / n, 6) AS intercept_cents
FROM s
""".strip(),
)
def q_events_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed least-squares: per-event-type value trend from
    the closed-form normal equations over INTEGER sums (seconds since
    corpus start × value cents — all five sums fit BIGINT exactly at
    the data's ranges, so the aggregation is associative and
    order-free; floats appear only in the final slope/intercept
    arithmetic, identical IEEE expressions in both engines).  The
    scale shape is one partial-aggregated groupBy — regression at
    100 TB costs exactly one aggregation pass."""
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "event_type",
        F.unix_timestamp("ts").alias("sec"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    t0 = base.agg(F.min("sec").alias("m"))
    c = base.crossJoin(F.broadcast(t0)).select(
        "event_type",
        (F.col("sec") - F.col("m")).alias("x"),
        F.col("cents").alias("y"),
    )
    s = c.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    slope = (nd * F.col("sxy") - sxd * F.col("sy")) / (
        nd * F.col("sxx") - sxd * F.col("sx")
    )
    intercept = (F.col("sy").cast("double") - slope * F.col("sx")) / F.col(
        "n"
    )
    return s.select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope_cents_per_sec"),
        F.round(intercept, 6).alias("intercept_cents"),
    )
