"""Additional relational headliners (free from Spark SQL — SURVEY §2.7):
TPC-H-shaped Q5/Q6/Q18 over the driver fixtures.  These exist to (a)
prove the relational surface the reference lacks and (b) give the bench
join/agg shapes whose plans must survive 100×: dimension chains
broadcast, fact-fact joins stay shuffle/AQE, aggregates partial-combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from merkonvectordb_spark.functions.timeutil import utc_ts
from merkonvectordb_spark.registry import register
from merkonvectordb_spark.schema import load_table


@register(
    "tpch_q5",
    """
SELECT n_name,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
""".strip(),
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: five joins — region→nation→supplier chain broadcasts
    (each side tiny after filters), customer⋈orders⋈lineitem is the
    fact spine left to AQE.  Never force-broadcast a fact."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    orders = t["orders"].where(
        (F.col("o_orderdate") >= utc_ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < utc_ts("1997-01-01 00:00:00"))
    )
    region = t["region"].where(F.col("r_name") == "ASIA")
    nation = t["nation"].join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supplier = t["supplier"].join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            # integer-scaled sum (see tpch_q10): per-term rounding to 1e-4
            # ticks is deterministic, the BIGINT sum is order-free, and
            # the final division is the same IEEE op in both engines
            (
                F.sum(
                    F.round(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * 10000
                    ).cast("bigint")
                )
                / 10000.0
            ).alias("revenue")
        )
    )


@register(
    "tpch_q6",
    """
SELECT sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)) / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""".strip(),
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: pure scan-filter-aggregate — every predicate pushes to
    the parquet scan, one partial-agg row per partition shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= utc_ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < utc_ts("1997-01-01 00:00:00"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * F.col("l_discount") * 10000
                    ).cast("bigint")
                )
                / 10000.0
            ).alias("revenue")
        )
    )


@register(
    "tpch_q18",
    """
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
)
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o_totalprice, 2) AS totalprice,
       round(sum(l_quantity), 2) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
""".strip(),
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: self-aggregation of the fact produces a SMALL key set
    (orders over 300 units) → broadcast it back as a semi-join against
    the same fact, then the enrichment joins.  The reduction-then-
    broadcast pattern is the scale-safe form of a correlated IN."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__sq"))
        .where(F.col("__sq") > 300)
        .select("l_orderkey")
    )
    return (
        li.join(F.broadcast(big), "l_orderkey", "left_semi")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "sum_qty",
        )
    )


@register(
    "tpch_q4",
    """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
""".strip(),
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape (EXISTS → left-semi join): priority counts of orders with
    at least one late lineitem (fixtures carry l_shipdate only, so "late"
    is shipdate >= orderdate + 60 days; TPC-H proper uses
    commitdate < receiptdate).  The semi-join deduplicates on the join
    key itself — no distinct, no count>0 subquery — and both sides are
    facts, so the shuffle stays with AQE."""
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= utc_ts("1996-07-01 00:00:00"))
        & (F.col("o_orderdate") < utc_ts("1996-10-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "tpch_q10",
    """
SELECT c_custkey, c_name, n_name,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""".strip(),
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: returned-item revenue per customer, top 20.  nation
    broadcasts; customer joins the aggregated fact side; the final top-20
    plans as TakeOrderedAndProject (heap, no global sort).  Deterministic
    tie-break on c_custkey for oracle parity."""
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= utc_ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < utc_ts("1996-04-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            # exact integer-scaled sum: per-term double products round to
            # 1e-4 ticks, the BIGINT sum is order-independent, and the
            # final /10000.0 is the same division of the same integer in
            # both engines — no final round() (Spark rounds via the
            # decimal string, DuckDB via the binary value; they disagree
            # on exact .xx5 ticks)
            (
                F.sum(
                    F.round(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * 10000
                    ).cast("bigint")
                )
                / 10000.0
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q12",
    """
SELECT l_returnflag AS flag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01 00:00:00'
  AND CAST(l_shipdate AS TIMESTAMP) <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
""".strip(),
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional-sum pivot over a fact-fact join (fixtures
    have no l_shipmode, so the group key is l_returnflag).  The CASE sums
    partial-aggregate map-side; one shuffle on the group key after the
    join."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= utc_ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < utc_ts("1997-01-01 00:00:00"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )
