"""Registered query: declarative data-quality expectation suite
(`operators.expectations`) over the TPC-H-ish tables.

The suite is the pre-curation gate a training-data pipeline runs on
every ingest: completeness, domain bounds, categorical membership,
regex shape, key uniqueness (with an integer ppm budget), and two
referential-integrity audits (one shuffled fact→fact, one broadcast
fact→dim).  The oracle replays every arm in SQL with the same integer
arithmetic, so the report hash-matches cell-for-cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from merkonvectordb_spark.operators import expectations as E
from merkonvectordb_spark.registry import register
from merkonvectordb_spark.schema import load_table

# sorted-value set labels and thresholds must match the operator's
# target-string rendering exactly — the report's `target` column is
# part of the hash
_EXPECT_ORACLE = r"""
WITH li AS (
  SELECT count(*) AS total,
    count(*) FILTER (WHERE l_orderkey IS NULL) AS v_nn,
    count(*) FILTER (WHERE l_quantity IS NOT NULL
                       AND (l_quantity < 1 OR l_quantity > 50)) AS v_bt,
    count(*) FILTER (WHERE l_returnflag IS NOT NULL
                       AND l_returnflag NOT IN ('A','N','R')) AS v_rf,
    count(*) FILTER (WHERE l_linestatus IS NOT NULL
                       AND l_linestatus NOT IN ('F','O')) AS v_ls,
    count(*) FILTER (WHERE NOT coalesce(l_extendedprice > 0, FALSE)) AS v_pp
  FROM lineitem
),
liu AS (
  SELECT count(*) AS total,
         count(*) - count(DISTINCT concat_ws(chr(31),
             coalesce(CAST(l_orderkey AS VARCHAR), chr(0) || '<NULL>'),
             coalesce(CAST(l_linenumber AS VARCHAR), chr(0) || '<NULL>')))
           AS v
  FROM lineitem
),
ord AS (
  SELECT count(*) AS total,
    count(*) FILTER (WHERE o_custkey IS NULL) AS v_nn,
    count(*) FILTER (WHERE o_orderpriority IS NOT NULL
                       AND NOT regexp_matches(o_orderpriority, '^[1-5]-'))
      AS v_pr
  FROM orders
),
ordu AS (
  SELECT count(*) AS total,
         count(*) - count(DISTINCT concat_ws(chr(31),
             coalesce(CAST(o_orderkey AS VARCHAR), chr(0) || '<NULL>')))
           AS v
  FROM orders
),
fk_ord AS (
  SELECT count(*) AS total,
    count(*) FILTER (WHERE l_orderkey IS NOT NULL AND l_orderkey NOT IN
      (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL)) AS v
  FROM lineitem
),
fk_part AS (
  SELECT count(*) AS total,
    count(*) FILTER (WHERE l_partkey IS NOT NULL AND l_partkey NOT IN
      (SELECT p_partkey FROM part WHERE p_partkey IS NOT NULL)) AS v
  FROM lineitem
)
SELECT 'not_null' AS check_name, 'lineitem.l_orderkey' AS target,
       v_nn AS violations, total, v_nn <= 0 AS passed FROM li
UNION ALL
SELECT 'between', 'lineitem.l_quantity[1,50]', v_bt, total,
       v_bt <= 0 FROM li
UNION ALL
SELECT 'in_set', 'lineitem.l_returnflag{A,N,R}', v_rf, total,
       v_rf <= 0 FROM li
UNION ALL
SELECT 'in_set', 'lineitem.l_linestatus{F,O}', v_ls, total,
       v_ls <= 0 FROM li
UNION ALL
SELECT 'satisfies', 'lineitem.positive_extendedprice', v_pp, total,
       v_pp <= 0 FROM li
UNION ALL
SELECT 'unique', 'lineitem.(l_orderkey,l_linenumber)', v, total,
       v <= 300000 * total // 1000000 FROM liu
UNION ALL
SELECT 'not_null', 'orders.o_custkey', v_nn, total, v_nn <= 0 FROM ord
UNION ALL
SELECT 'matches', 'orders.o_orderpriority~^[1-5]-', v_pr, total,
       v_pr <= 0 FROM ord
UNION ALL
SELECT 'unique', 'orders.(o_orderkey)', v, total, v <= 0 FROM ordu
UNION ALL
SELECT 'foreign_key', 'lineitem.l_orderkey->orders.o_orderkey', v,
       total, v <= 0 FROM fk_ord
UNION ALL
SELECT 'foreign_key', 'lineitem.l_partkey->part.p_partkey', v, total,
       v <= 0 FROM fk_part
""".strip()


@register("data_expectations", _EXPECT_ORACLE)
def q_data_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style validation gate: 11 checks over lineitem/orders/part
    in 4 aggregation passes + 2 joins — the row-local lineitem arms
    share ONE scan, uniqueness runs as narrow column-pruned arms, and
    the part-side FK audit broadcasts the dimension keys.  All report
    values are STRING/BIGINT/BOOLEAN from integer arithmetic."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")

    li_report = E.check_expectations(
        li,
        [
            E.not_null("l_orderkey"),
            E.between("l_quantity", 1, 50),
            E.in_set("l_returnflag", ["A", "N", "R"]),
            E.in_set("l_linestatus", ["F", "O"]),
            E.satisfies(
                "positive_extendedprice", F.col("l_extendedprice") > 0
            ),
            # the generator reuses keys, so this check FAILS at 0 ppm;
            # a 30% duplicate budget exercises the integer threshold
            E.unique(
                "l_orderkey", "l_linenumber", max_violation_ppm=300_000
            ),
        ],
        table="lineitem",
    )
    ord_report = E.check_expectations(
        orders,
        [
            E.not_null("o_custkey"),
            E.matches("o_orderpriority", "^[1-5]-"),
            E.unique("o_orderkey"),
        ],
        table="orders",
    )
    fk1 = E.foreign_key(
        li, "l_orderkey", orders, "o_orderkey",
        child_table="lineitem", parent_table="orders",
    )
    fk2 = E.foreign_key(
        li, "l_partkey", part, "p_partkey",
        child_table="lineitem", parent_table="part",
        broadcast_parent=True,
    )
    return (
        li_report.unionByName(ord_report)
        .unionByName(fk1)
        .unionByName(fk2)
    )


# ---------------------------------------------------------------------------
# privacy QA: k-anonymity + l-diversity of quasi-identifiers
# (operators.privacy) — the re-identification-surface audit next to the
# PII detect/redact pair.  Subjects = users; quasi-identifiers =
# (event_type, hour-of-day, value decade); sensitive = user_id, so
# l-diversity measures how many distinct subjects hide in each QI cell.
# ---------------------------------------------------------------------------

_K_ANON_K = 25
_K_ANON_L = 5

_K_ANON_ORACLE = f"""
WITH cells AS (
  SELECT event_type,
         (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24 AS hr,
         CAST(least(9, greatest(0, floor(value / 10.0))) AS BIGINT)
           AS val_bucket,
         count(*) AS n_rows,
         count(DISTINCT user_id) AS n_sensitive
  FROM events GROUP BY 1, 2, 3
)
SELECT event_type, hr, val_bucket, n_rows, n_sensitive,
       n_rows >= {_K_ANON_K} AS k_ok,
       n_sensitive >= {_K_ANON_L} AS l_ok
FROM cells
""".strip()


@register("k_anonymity_audit", _K_ANON_ORACLE)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-QI-cell k-anonymity/l-diversity audit of the events stream:
    one partial-aggregable groupBy on (event_type, hour-of-day, value
    decade) with a count and ONE count-distinct — a |cells|-row shuffle
    at any corpus size; the cell frame is the actionable artifact
    (which combinations to generalize or suppress before release).
    Hour-of-day comes from integer epoch division (zone-free, no
    calendar function — house style); all outputs are STRING/BIGINT/
    BOOLEAN."""
    from merkonvectordb_spark.operators.privacy import k_anonymity_report

    ev = load_table(spark, sf_dir, "events")
    cells = ev.select(
        "event_type",
        (
            F.floor(F.unix_micros("ts") / F.lit(3_600_000_000)) % 24
        ).alias("hr"),
        F.least(
            F.lit(9),
            F.greatest(F.lit(0), F.floor(F.col("value") / 10.0)),
        )
        .cast("bigint")
        .alias("val_bucket"),
        "user_id",
    )
    return k_anonymity_report(
        cells,
        qi_cols=("event_type", "hr", "val_bucket"),
        sensitive_col="user_id",
        k=_K_ANON_K,
        l_div=_K_ANON_L,
    )
