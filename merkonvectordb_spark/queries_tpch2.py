"""TPC-H completion set — the 14 queries not in ``queries_tpch.py``
(Q2/Q7/Q8/Q9/Q11/Q13/Q14/Q15/Q16/Q17/Q19/Q20/Q21/Q22), adapted to the
driver fixtures (no ``partsupp`` table; no commit/receipt dates, ship
mode, container, phone, or comment columns — each adaptation keeps the
*plan shape* the original exercises and is noted per query).

Determinism rules (see ``queries.py`` docstring): money sums are
integer-scaled BIGINT sums (``round(x*10⁴)`` per term) so partial
aggregation is order-independent and Spark/DuckDB agree bit-for-bit
(their ``round()``s diverge on .xx5 ticks — Spark goes through the
decimal string, DuckDB through the binary double); every LIMIT carries
a total tie-break ordering; averages are scaled-BIGINT-sum ÷ COUNT so
the threshold both engines compare against is the same double.

Scale notes are per query; the common laws: dimension chains broadcast
AFTER their filters, fact⋈fact stays with AQE, correlated sub-queries
become aggregate-then-broadcast-back (the reduction output is small
even when the fact is 100 TB), and NOT IN/EXISTS become left_anti/
left_semi so Spark never builds a null-aware nested loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from merkonvectordb_spark.functions.timeutil import utc_ts
from merkonvectordb_spark.registry import register
from merkonvectordb_spark.schema import load_table


def _scaled(expr, ticks: int = 10000):
    """Per-term integer scaling: round each product to 1/ticks, sum as
    BIGINT (order-independent), divide back once at the end."""
    return F.round(expr * ticks).cast("bigint")


@register(
    "tpch_q2",
    """
WITH eu AS (
  SELECT s_suppkey, s_acctbal, s_name, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
cand AS (
  SELECT p_partkey, p_type, s_acctbal, s_name, n_name,
         CAST(round(l_extendedprice / l_quantity * 100) AS BIGINT) AS unit_cents
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN eu ON l_suppkey = s_suppkey
  WHERE p_type = 'STANDARD' AND p_size <= 15
),
m AS (
  SELECT p_partkey AS mk, min(unit_cents) AS min_cents
  FROM cand GROUP BY p_partkey
)
SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_type,
       min_cents / 100.0 AS supplycost
FROM cand JOIN m ON p_partkey = mk AND unit_cents = min_cents
ORDER BY s_acctbal DESC, s_name, p_partkey
LIMIT 100
""".strip(),
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (correlated MIN sub-query → aggregate + broadcast-back).
    Fixtures lack partsupp, so "supply cost" is the minimum observed
    unit price (extendedprice/quantity, cent-rounded so the equality
    join is on exact integers) per part among EUROPE suppliers.  The
    per-part min is a tiny aggregate of the fact — broadcast it back;
    the region→nation→supplier chain broadcasts into the fact scan."""
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu = (
        sup.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15)
    )
    li = load_table(spark, sf_dir, "lineitem")
    cand = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_type",
            "s_acctbal",
            "s_name",
            "n_name",
            _scaled(F.col("l_extendedprice") / F.col("l_quantity"), 100).alias(
                "unit_cents"
            ),
        )
        .persist()  # feeds the per-part min AND the equality join back
    )
    mins = (
        cand.groupBy(F.col("p_partkey").alias("mk"))
        .agg(F.min("unit_cents").alias("min_cents"))
    )
    return (
        cand.join(
            F.broadcast(mins),
            (F.col("p_partkey") == F.col("mk"))
            & (F.col("unit_cents") == F.col("min_cents")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            (F.col("min_cents") / 100.0).alias("supplycost"),
        )
        .distinct()
        .orderBy(F.desc("s_acctbal"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(100)
    )


@register(
    "tpch_q7",
    """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY supp_nation, cust_nation, l_year
""".strip(),
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape (volume shipping between two nations).  Both nation
    dimensions broadcast; the pair predicate stays on the joined row
    (it references both sides, so it cannot push below the join);
    shipdate range pushes to the lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= utc_ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < utc_ts("1998-01-01 00:00:00"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    n1 = nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            (
                F.sum(_scaled(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                / 10000.0
            ).alias("revenue")
        )
    )


@register(
    "tpch_q8",
    """
WITH all_nations AS (
  SELECT year(o_orderdate) AS o_year,
         CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS volume,
         n1.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region   ON n2.n_regionkey = r_regionkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  WHERE r_name = 'AMERICA'
    AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
SELECT o_year,
       sum(CASE WHEN supp_nation = 'NATION_6' THEN volume ELSE 0 END)
         / CAST(sum(volume) AS DOUBLE) AS mkt_share
FROM all_nations
GROUP BY o_year
""".strip(),
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape (national market share): conditional-sum ÷ total-sum of
    the same integer-scaled volume — one aggregation computes both, the
    ratio divides two exact BIGINTs so both engines emit the same
    double.  Customer-side nation→region chain prunes to one region
    BEFORE the fact join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= utc_ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < utc_ts("1998-01-01 00:00:00"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    n2 = nat.join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")).select(
        F.col("n_nationkey").alias("n2_key")
    )
    n1 = nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _scaled(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "supp_nation")
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_6", F.col("volume")).otherwise(F.lit(0)))
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
    )


@register(
    "tpch_q9",
    """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON o_orderkey = l_orderkey
WHERE p_name LIKE 'red %'
GROUP BY n_name, o_year
""".strip(),
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (product profit by supplier nation × year).  Fixtures
    have no partsupp.ps_supplycost, so profit is the discounted revenue
    of 'red %'-named parts.  The part filter broadcasts into the fact
    scan; orders⋈lineitem is the fact spine left to AQE."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("red %"))
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(
            (
                F.sum(_scaled(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                / 10000.0
            ).alias("sum_profit")
        )
    )


@register(
    "tpch_q11",
    """
WITH v AS (
  SELECT l_partkey, CAST(round(l_extendedprice * 100) AS BIGINT) AS val
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
)
SELECT l_partkey AS partkey, sum(val) / 100.0 AS value
FROM v
GROUP BY l_partkey
HAVING sum(val) > (SELECT sum(val) * 0.001 FROM v)
ORDER BY value DESC, partkey
LIMIT 100
""".strip(),
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (HAVING against a global scalar sub-query).  Fixtures
    lack partsupp, so "stock value" is shipped extendedprice of one
    nation's suppliers per part.  The global total is a one-row
    aggregate cross-joined (broadcast) into the per-part aggregate —
    the scalar never round-trips through the driver.  The per-part
    aggregate is persisted: it feeds both the total and the filter, and
    an unpersisted lineage would re-shuffle the fact twice."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    v = (
        li.join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("l_partkey", _scaled(F.col("l_extendedprice"), 100).alias("val"))
    )
    per_part = (
        v.groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum("val").alias("__tot"))
        .persist()
    )
    total = per_part.agg((F.sum("__tot") * 0.001).alias("__thr"))
    out = (
        per_part.join(F.broadcast(total))
        .where(F.col("__tot") > F.col("__thr"))
        .select("partkey", (F.col("__tot") / 100.0).alias("value"))
        .orderBy(F.desc("value"), F.asc("partkey"))
        .limit(100)
    )
    return out


@register(
    "tpch_q13",
    """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
)
GROUP BY c_count
""".strip(),
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape (order-count distribution; two stacked aggregations).
    The join-side filter lives in the LEFT JOIN condition — customers
    with zero qualifying orders must survive with count 0, so it cannot
    become a WHERE.  Fixtures lack o_comment; the stand-in predicate is
    o_orderpriority.  Second aggregation is trivially small (distinct
    counts), so the only real shuffle is the first groupBy."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q14",
    """
SELECT 100.0 * sum(CASE WHEN p_type = 'PROMO'
                        THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
                        ELSE 0 END)
             / CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE)
       AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
""".strip(),
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape (promo revenue ratio).  Part dimension broadcasts;
    the month predicate prunes the fact scan; both sums are the same
    integer-scaled column so the ratio is exact-over-exact.  (The
    scaled sum stays far below 2^53 even at SF100k, so the final
    double division is lossless.)"""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= utc_ts("1996-09-01 00:00:00"))
        & (F.col("l_shipdate") < utc_ts("1996-10-01 00:00:00"))
    )
    part = load_table(spark, sf_dir, "part")
    vol = _scaled(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(vol.alias("__v"), "p_type")
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", F.col("__v")).otherwise(F.lit(0)))
                / F.sum("__v").cast("double")
            ).alias("promo_revenue")
        )
    )


@register(
    "tpch_q15",
    """
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS total_sc
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_sc / 10000.0 AS total_revenue
FROM supplier
JOIN rev ON s_suppkey = supplier_no
WHERE total_sc = (SELECT max(total_sc) FROM rev)
ORDER BY s_suppkey
""".strip(),
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape (top supplier = scalar-MAX sub-query over a derived
    view).  The per-supplier revenue aggregate is persisted (it feeds
    the max AND the filter); the max is a one-row broadcast.  Equality
    is on the exact scaled BIGINT, so ties (all max suppliers) are kept
    exactly as TPC-H requires."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= utc_ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < utc_ts("1996-04-01 00:00:00"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(_scaled(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "total_sc"
            )
        )
        .persist()
    )
    mx = rev.agg(F.max("total_sc").alias("__mx"))
    sup = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("total_sc") == F.col("__mx"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey", "s_name", (F.col("total_sc") / 10000.0).alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q16",
    """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 100
""".strip(),
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape (distinct-count grouped + NOT IN anti-join).  Fixtures
    lack partsupp, so supplier diversity comes from lineitem; the
    "complaint" exclusion becomes negative-balance suppliers.  The NOT
    IN is a broadcast left_anti (s_suppkey is never NULL, so anti-join
    ≡ NOT IN); count(DISTINCT) expands map-side before one shuffle."""
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
        .limit(100)
    )


@register(
    "tpch_q17",
    """
WITH avg_q AS (
  SELECT l_partkey AS ak,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 / 7.0 AS avg_yearly
FROM lineitem
JOIN part  ON p_partkey = l_partkey
JOIN avg_q ON ak = l_partkey
WHERE p_brand = 'Brand#13' AND p_size < 5
  AND l_quantity < 0.2 * avg_qty
""".strip(),
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape (correlated AVG sub-query → aggregate + broadcast-
    back).  Fixture quantities are integer-valued doubles, so the
    average is an exact BIGINT sum ÷ COUNT — both engines compare
    l_quantity against the identical double.  The per-part average is
    ~|parts| rows: broadcast.  Container filter becomes brand+size."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#13") & (F.col("p_size") < 5)
    )
    avg_q = (
        li.groupBy(F.col("l_partkey").alias("ak"))
        .agg(
            (
                F.sum(F.col("l_quantity").cast("bigint")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_qty")
        )
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(avg_q), F.col("ak") == F.col("l_partkey"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (
                F.sum(_scaled(F.col("l_extendedprice"), 100)) / 100.0 / 7.0
            ).alias("avg_yearly")
        )
    )


@register(
    "tpch_q19",
    """
SELECT sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#5'  AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
""".strip(),
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape (disjunctive mixed-side predicate).  Each disjunct
    mixes part and lineitem columns, so the OR evaluates post-join —
    but Catalyst derives the single-side implications (p_brand IN
    (...), p_size<=15, quantity range) and pushes them below the join;
    the part side shrinks to three brands and broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    d1 = (
        (F.col("p_brand") == "Brand#5")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    d2 = (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    d3 = (
        (F.col("p_brand") == "Brand#25")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .where(d1 | d2 | d3)
        .agg(
            (
                F.sum(_scaled(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                / 10000.0
            ).alias("revenue")
        )
    )


@register(
    "tpch_q20",
    """
WITH shipped AS (
  SELECT l_suppkey, l_partkey, sum(CAST(l_quantity AS BIGINT)) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
)
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
    SELECT l_suppkey FROM shipped
    JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE 'small%' AND qty > 40
  )
ORDER BY s_name
""".strip(),
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (nested IN chain → semi-join of a pre-aggregated
    fact).  Fixtures lack partsupp.availqty, so "excess stock" is a
    fixed shipped-quantity threshold per (supplier, part) of
    'small%'-named parts.  The IN list is the aggregate's key column —
    a left_semi against it keeps supplier rows unique; nation
    broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= utc_ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < utc_ts("1997-01-01 00:00:00"))
    )
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    shipped = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
        .where(F.col("qty") > 40)
        .select("l_suppkey")
    )
    nat = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    sup = load_table(spark, sf_dir, "supplier")
    return (
        sup.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(shipped),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "tpch_q21",
    """
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
),
per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late,
         max(CASE WHEN late THEN l_suppkey END) AS late_supp
  FROM li GROUP BY l_orderkey
)
SELECT s_name, count(*) AS numwait
FROM per_order
JOIN supplier ON s_suppkey = late_supp
JOIN nation   ON s_nationkey = n_nationkey
WHERE n_supp > 1 AND n_late = 1 AND n_name = 'NATION_1'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""".strip(),
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (suppliers who kept orders waiting: EXISTS another
    supplier + NOT EXISTS another LATE supplier).  Fixtures lack
    commit/receipt dates, so "late" is shipdate > orderdate + 90 days.
    Both correlations collapse into ONE per-order aggregation
    (multi-supplier AND exactly-one-late-supplier are distinct-counts;
    the sole late supplier is MAX over the conditional key) — a single
    shuffle where the textbook double-EXISTS plan re-joins the fact
    twice.  max(CASE) is well-defined precisely because n_late = 1."""
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(orders, F.col("o_orderkey") == F.col("l_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ).alias("late"),
    )
    late_key = F.when(F.col("late"), F.col("l_suppkey"))
    per_order = joined.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(late_key).alias("n_late"),
        F.max(late_key).alias("late_supp"),
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    return (
        per_order.where((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("late_supp"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


@register(
    "tpch_q22",
    """
WITH scaled AS (
  SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer
),
thr AS (
  SELECT CAST(sum(bal_c) AS DOUBLE) / count(*) AS avg_c
  FROM scaled WHERE bal_c > 0
)
SELECT c_custkey % 7 AS cntrycode, count(*) AS numcust,
       sum(bal_c) / 100.0 AS totacctbal
FROM scaled
WHERE bal_c > (SELECT avg_c FROM thr)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
  )
GROUP BY cntrycode
""".strip(),
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape (global-average scalar sub-query + NOT EXISTS
    anti-join).  Fixtures lack c_phone, so the "country code" is
    c_custkey % 7 (same integer mod in both engines).  The average is
    over cent-scaled BIGINTs so the threshold double is identical; the
    NOT EXISTS is a left_anti against the orders key column (every
    fixture customer has SOME order, so "inactive" means no order in
    the final years — the date filter prunes the anti-join's build
    side).  The scaled customer projection is persisted — it feeds the
    threshold and the filtered aggregate."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", _scaled(F.col("c_acctbal"), 100).alias("bal_c"))
        .persist()
    )
    thr = cust.where(F.col("bal_c") > 0).agg(
        (F.sum("bal_c").cast("double") / F.count(F.lit(1))).alias("avg_c")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= utc_ts("1999-01-01 00:00:00"))
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(thr))
        .where(F.col("bal_c") > F.col("avg_c"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy((F.col("c_custkey") % 7).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum("bal_c") / 100.0).alias("totacctbal"),
        )
    )
