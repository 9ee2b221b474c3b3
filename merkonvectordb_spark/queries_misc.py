"""Remaining SURVEY §2 parity rows: R2 (async-LINQ read surface) and F5
(string normalization), each with a DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from merkonvectordb_spark.functions.strings import (
    is_null_or_empty,
    normalize_line_endings,
)
from merkonvectordb_spark.operators import linq
from merkonvectordb_spark.queries import VECTORS_ORACLE_CTE, vectors_df
from merkonvectordb_spark.registry import register
from merkonvectordb_spark.schema import load_table


@register(
    "linq_summary",
    f"""
WITH {VECTORS_ORACLE_CTE}
SELECT arg_min(key, ingest_seq) AS first_key,
       arg_max(key, ingest_seq) AS last_key,
       count(*) AS n_rows,
       bool_or(ingest_seq > 400) AS any_match,
       bool_or(key = 'k000042') AS contains_key
FROM vectors WHERE collection = 'coll_1'
""".strip(),
)
def q_linq_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.5 R2 (Linq/AsyncEnumerable.cs:44-140): first/last/count/
    any/contains — declaratively, as ONE scan + aggregation instead of
    the reference's six separate iterations."""
    v = vectors_df(spark, sf_dir).where(F.col("collection") == "coll_1")
    return linq.summary(
        v,
        key_col="key",
        order_col="ingest_seq",
        any_pred=F.col("ingest_seq") > 400,
        contains_value="k000042",
    )


@register(
    "string_normalize",
    r"""
WITH crlf AS (
  SELECT doc_id,
         CASE WHEN doc_id < 10 THEN replace(text, ' ', chr(13) || chr(10))
              ELSE text END AS text
  FROM documents
  UNION ALL
  SELECT 100001, '' UNION ALL SELECT 100002, CAST(NULL AS VARCHAR)
),
norm AS (
  SELECT doc_id, text,
         replace(text, chr(13) || chr(10), chr(10)) AS text_norm
  FROM crlf
)
SELECT doc_id,
       CAST(coalesce(length(text), -1) AS BIGINT) AS len_raw,
       CAST(coalesce(length(text_norm), -1) AS BIGINT) AS len_norm,
       (text_norm IS NULL OR text_norm = '') AS is_empty,
       coalesce(md5(text_norm), '') AS norm_md5
FROM norm
""".strip(),
)
def q_string_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.6 F5 (Text/StringExtensions.cs:9-26): CRLF→LF
    normalization + null/empty predicate, exercised on a corpus with
    seeded CRLF line endings and empty/NULL rows."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    crlf = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") < 10, F.replace("text", F.lit(" "), F.lit("\r\n"))
        ).otherwise(F.col("text")),
    )
    injected = spark.createDataFrame(
        [(100001, ""), (100002, None)], "doc_id LONG, text STRING"
    )
    norm = crlf.unionByName(injected).withColumn(
        "text_norm", normalize_line_endings(F.col("text"))
    )
    return norm.select(
        "doc_id",
        F.coalesce(F.length("text"), F.lit(-1)).cast("long").alias("len_raw"),
        F.coalesce(F.length("text_norm"), F.lit(-1)).cast("long").alias("len_norm"),
        is_null_or_empty(F.col("text_norm")).alias("is_empty"),
        F.coalesce(F.md5("text_norm"), F.lit("")).alias("norm_md5"),
    )


# ---------------------------------------------------------------------------
# P2/P4 oracle coverage: collection-scoped knn with embedding projection
# over a state seeded with empty-key / NULL-key / zero-norm rows
# ---------------------------------------------------------------------------

_KNN_COLL_ORACLE = f"""
WITH {VECTORS_ORACLE_CTE},
seeded AS (
  SELECT * FROM vectors
  UNION ALL
  SELECT 'coll_2', '', '{{}}',
         (SELECT embedding FROM vectors WHERE collection = 'coll_2' LIMIT 1),
         CAST(NULL AS TIMESTAMP), 3000001
  UNION ALL
  SELECT 'coll_2', CAST(NULL AS VARCHAR), '{{}}',
         (SELECT embedding FROM vectors WHERE collection = 'coll_2' LIMIT 1),
         CAST(NULL AS TIMESTAMP), 3000002
  UNION ALL
  SELECT 'coll_2', 'zz_zero', '{{}}',
         list_transform((SELECT embedding FROM vectors WHERE collection='coll_2' LIMIT 1), x -> CAST(0.0 AS FLOAT)),
         CAST(NULL AS TIMESTAMP), 3000003
),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 7),
scored AS (
  SELECT s.key, s.ingest_seq,
         round(sqrt(list_dot_product(CAST(s.embedding AS DOUBLE[]),
                                     CAST(s.embedding AS DOUBLE[]))), 6) AS emb_norm,
         list_dot_product(CAST(s.embedding AS DOUBLE[]), q.qv) /
           (sqrt(list_dot_product(CAST(s.embedding AS DOUBLE[]), CAST(s.embedding AS DOUBLE[])))
            * sqrt(list_dot_product(q.qv, q.qv))) AS raw
  FROM seeded s CROSS JOIN q
  WHERE s.collection = 'coll_2'
    AND s.key IS NOT NULL AND s.key <> ''
    AND len(s.embedding) = len(q.qv)
    AND sqrt(list_dot_product(CAST(s.embedding AS DOUBLE[]), CAST(s.embedding AS DOUBLE[]))) > 0
    AND sqrt(list_dot_product(q.qv, q.qv)) > 0
)
SELECT key, ingest_seq, emb_norm, round(raw, 6) AS score
FROM scored WHERE raw >= 0.05
ORDER BY raw DESC, ingest_seq ASC LIMIT 5
""".strip()


@register("knn_collection", _KNN_COLL_ORACLE)
def q_knn_collection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.2 P2/P3/P4 + §2.4 under one oracle: collection-pruned
    knn with ``with_embeddings=True`` (P2: the embedding column survives,
    rendered as its norm), empty/NULL keys excluded (P4 — the
    reference's read-side purge, filtered not mutated), zero-norm rows
    unscorable-excluded, inclusive raw-score threshold, ingest_seq
    tie-break."""
    from merkonvectordb_spark.operators.search import knn

    v = vectors_df(spark, sf_dir)
    donor = (
        v.where(F.col("collection") == "coll_2")
        .select("embedding")
        .limit(1)
    )
    donor_emb = donor.first()[0]
    seeded_rows = [
        ("coll_2", "", "{}", donor_emb, None, 3000001),
        ("coll_2", None, "{}", donor_emb, None, 3000002),
        ("coll_2", "zz_zero", "{}", [0.0] * len(donor_emb), None, 3000003),
    ]
    injected = spark.createDataFrame(
        seeded_rows,
        "collection STRING, key STRING, metadata STRING, "
        "embedding ARRAY<FLOAT>, ts TIMESTAMP, ingest_seq LONG",
    )
    state = v.unionByName(injected)
    qvec = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") == 7)
        .select("embedding")
        .first()[0]
    )
    from merkonvectordb_spark.functions.vector import l2_norm

    out = knn(
        state,
        list(qvec),
        k=5,
        min_score=0.05,
        collection="coll_2",
        with_embeddings=True,
        tie_break="ingest_seq",
    )
    return out.select(
        "key",
        "ingest_seq",
        F.round(l2_norm(F.col("embedding")), 6).alias("emb_norm"),
        "score",
    )


# ---------------------------------------------------------------------------
# §2.7 relational breadth the reference lacks: set ops, ROLLUP
# ---------------------------------------------------------------------------


@register(
    "set_ops",
    """
WITH hi_q AS (SELECT doc_id FROM documents WHERE n_chars >= 200),
en AS (SELECT doc_id FROM documents WHERE lang = 'en')
SELECT 'intersect' AS op, count(*) AS n FROM (SELECT * FROM hi_q INTERSECT SELECT * FROM en)
UNION ALL
SELECT 'except', count(*) FROM (SELECT * FROM hi_q EXCEPT SELECT * FROM en)
UNION ALL
SELECT 'union', count(*) FROM (SELECT * FROM hi_q UNION SELECT * FROM en)
""".strip(),
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (SURVEY §2.7 — absent in the reference, free in
    Spark): intersect/except/union-distinct of two document id sets,
    each planned as an aggregate or hash anti/semi join."""
    docs = load_table(spark, sf_dir, "documents")
    hi_q = docs.where(F.col("n_chars") >= 200).select("doc_id")
    en = docs.where(F.col("lang") == "en").select("doc_id")

    def one(op: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(op).alias("op"), "n"
        )

    return (
        one("intersect", hi_q.intersect(en))
        .unionByName(one("except", hi_q.subtract(en)))
        .unionByName(one("union", hi_q.union(en).distinct()))
    )


@register(
    "events_rollup",
    """
SELECT coalesce(event_type, '<all>') AS event_type,
       coalesce(CAST(extract(hour FROM ts) AS BIGINT), -1) AS hr,
       CAST(GROUPING(event_type, extract(hour FROM ts)) AS BIGINT) AS gid,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events
GROUP BY ROLLUP (event_type, extract(hour FROM ts))
""".strip(),
)
def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (SURVEY §2.7): per (type, hour), per type, and
    grand total in one pass — Spark plans a single Expand + partial-agg,
    not three scans.  ``gid`` (grouping_id) disambiguates an
    aggregated-away dimension from a GENUINE NULL value that renders as
    the same '<all>'/-1 sentinel — the cube query's rule, which the
    sentinel alone cannot give."""
    ev = load_table(spark, sf_dir, "events")
    hr = F.hour("ts").cast("long")
    return (
        ev.rollup(F.col("event_type"), hr.alias("hr"))
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias(
                "sum_cents"
            ),
        )
        .select(
            F.coalesce("event_type", F.lit("<all>")).alias("event_type"),
            F.coalesce("hr", F.lit(-1)).alias("hr"),
            "gid",
            "n_events",
            "sum_cents",
        )
    )


@register(
    "lineitem_cube",
    """
SELECT coalesce(l_returnflag, '<all>') AS l_returnflag,
       coalesce(l_linestatus, '<all>') AS l_linestatus,
       GROUPING(l_returnflag, l_linestatus) AS gid,
       count(*) AS n,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""".strip(),
)
def q_lineitem_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation with grouping_id disambiguation (SURVEY §2.7):
    all four grouping sets of (returnflag, linestatus) in one Expand +
    partial-agg pass — the gid column distinguishes an aggregated-away
    dimension from a genuine NULL value, which the coalesce sentinel
    alone cannot.  Spark's grouping_id() bit order (first listed column
    is the high bit) matches DuckDB's GROUPING(a, b)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            (
                F.sum(
                    F.round(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * 10000
                    ).cast("bigint")
                )
                / 10000.0
            ).alias("revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("l_linestatus"),
            F.col("gid").cast("bigint").alias("gid"),
            "n",
            "sum_qty",
            "revenue",
        )
    )


# ---------------------------------------------------------------------------
# exact order statistics: median/quantiles without sketches.  Spark's
# percentile() (exact, SQL PERCENTILE_CONT semantics with linear
# interpolation) against DuckDB quantile_cont — deterministic on both
# sides, unlike approx_percentile/t-digest which never hash-match.
# ---------------------------------------------------------------------------


@register(
    "lineitem_quantiles",
    """
SELECT l_returnflag, l_suppkey % 32 AS supp_bucket,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
       count(*) AS n
FROM lineitem
GROUP BY 1, 2
""".strip(),
)
def q_lineitem_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped quantiles (PERCENTILE_CONT) via
    ``operators.stats.grouped_exact_quantiles``: one hash exchange on
    the group key, a SPILLABLE per-group window sort, and interpolation
    on the ≤2 fetched rows per quantile — bit-identical arithmetic to
    Spark's ``percentile()`` aggregate, which this replaced in round 9
    after the aggregate form (ObjectHashAggregate value→count map per
    group, no spill) measured slope 1.21/1.34 across two decades
    (115.9 s at sf10; this form ~0.9).  The group count is still the
    parallelism bound — for one-group/global quantiles use
    ``exact_global_quantiles`` (the `global_quantiles` query)."""
    from merkonvectordb_spark.operators.stats import grouped_exact_quantiles

    li = load_table(spark, sf_dir, "lineitem")
    out = grouped_exact_quantiles(
        li.select(
            "l_returnflag",
            (F.col("l_suppkey") % 32).alias("supp_bucket"),
            "l_extendedprice",
        ),
        ["l_returnflag", "supp_bucket"],
        "l_extendedprice",
        {"p50": 0.5, "p90": 0.9, "p99": 0.99},
    )
    return out.select(
        "l_returnflag",
        "supp_bucket",
        F.round("p50", 4).alias("p50"),
        F.round("p90", 4).alias("p90"),
        F.round("p99", 4).alias("p99"),
        "n",
    )


# ---------------------------------------------------------------------------
# relational PIVOT: event-type counts as columns, one row per user bucket.
# Explicit value list keeps the output schema static (a dynamic pivot
# needs a driver-side distinct — a plan-time collect we avoid).
# ---------------------------------------------------------------------------

_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


@register(
    "events_pivot",
    f"""
SELECT user_id % 10 AS user_bucket,
       {", ".join(
           f"count(*) FILTER (event_type = '{t}') AS n_{t}"
           for t in _EVENT_TYPES
       )}
FROM events
GROUP BY 1
""".strip(),
)
def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with a pinned value list: plans as ONE aggregation with a
    conditional-count per pivot value (no per-value scans, no driver
    distinct).  Map-side partial aggregation keeps the shuffle at
    |buckets| × |values| cells."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    renamed = out.select(
        "user_bucket",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _EVENT_TYPES],
    )
    return renamed


# ---------------------------------------------------------------------------
# skew-mitigation operators under oracle: the salted plans must produce
# IDENTICAL results to the plain join/aggregation the oracle runs.
# event_type (5 values over ~100k rows) is a maximally skewed key: a
# plain shuffle join/agg funnels each type through one reducer.
# ---------------------------------------------------------------------------


@register(
    "skew_salted_join",
    """
WITH dim AS (
  SELECT * FROM (VALUES
    ('click', CAST(1.0 AS DOUBLE)), ('view', CAST(0.5 AS DOUBLE)),
    ('purchase', CAST(5.0 AS DOUBLE)), ('signup', CAST(2.0 AS DOUBLE)),
    ('error', CAST(0.0 AS DOUBLE))
  ) AS t(event_type, weight)
)
SELECT e.event_type,
       count(*) AS n_events,
       CAST(sum(CAST(floor(e.value * d.weight * 100 + 0.5) AS BIGINT)) AS BIGINT) AS weighted_cents
FROM events e
JOIN dim d USING (event_type)
GROUP BY e.event_type
""".strip(),
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """salted_join + salted_agg end to end on a 5-value hot key: the fact
    salts deterministically (xxhash64 of the row), the dim replicates
    n_salt×, and the aggregation partial-combines on (key, salt) before
    finishing on the key — so no single reducer owns a whole event_type.
    The oracle is the PLAIN join+group-by: row-identical results are the
    operator's contract.  Integer-scaled sum (see tpch_q10) keeps the
    reduction order out of the hash."""
    from merkonvectordb_spark.operators.skew import salted_agg, salted_join

    ev = load_table(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [
            ("click", 1.0),
            ("view", 0.5),
            ("purchase", 5.0),
            ("signup", 2.0),
            ("error", 0.0),
        ],
        "event_type STRING, weight DOUBLE",
    )
    # floor(x + 0.5), NOT round(): Spark rounds doubles via BigDecimal
    # HALF_UP on the exact binary expansion while DuckDB's round(DOUBLE)
    # implementation has varied across releases — floor is defined
    # identically everywhere, and the two agree for all non-negative x
    # (weights here are ≥ 0).  r4 driver-red hedge: this was the only
    # tie-able rounding left in the registry.
    joined = salted_join(ev, dim, on=["event_type"], n_salt=8).withColumn(
        "cents",
        F.floor(F.col("value") * F.col("weight") * 100 + 0.5).cast("bigint"),
    )
    out = salted_agg(
        joined,
        keys=["event_type"],
        aggs={"event_id": "count", "cents": "sum"},
        n_salt=8,
    )
    return out.select(
        "event_type",
        F.col("count_event_id").alias("n_events"),
        F.col("sum_cents").alias("weighted_cents"),
    )


@register(
    "global_quantiles",
    """
SELECT round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
       count(l_extendedprice) AS n
FROM lineitem
""".strip(),
)
def q_global_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL exact quantiles via distributed order statistics
    (operators.stats.exact_global_quantiles): range-partition + local
    sort, P-row count prefix-sum, then fetch exactly the interpolation
    rows — no task ever buffers more than its own partition, unlike
    percentile() whose single aggregation buffer holds the full column.
    This is the 100 TB path the grouped variant (lineitem_quantiles)
    can't take when there's only one group."""
    from merkonvectordb_spark.operators.stats import exact_global_quantiles

    li = load_table(spark, sf_dir, "lineitem")
    (p50, p90, p99), n = exact_global_quantiles(
        li, "l_extendedprice", [0.5, 0.9, 0.99], return_count=True
    )

    def _r4(x: float) -> float:
        # HALF_UP on the double's exact binary expansion — the SAME
        # convention as F.round (BigDecimal) and DuckDB's round; Python's
        # built-in round is banker's (half-to-even), a THIRD convention
        # that diverges when an interpolated quantile lands on a
        # representable 4-decimal midpoint
        from decimal import ROUND_HALF_UP, Decimal

        return float(Decimal(x).quantize(Decimal("0.0001"), ROUND_HALF_UP))

    return spark.createDataFrame(
        [(_r4(p50), _r4(p90), _r4(p99), n)],
        "p50 DOUBLE, p90 DOUBLE, p99 DOUBLE, n LONG",
    )


def _zorder_sql(cols: list[str], bits: int = 16) -> str:
    """DuckDB mirror of operators.layout.zorder_key — same bit shuffle."""
    n = len(cols)
    terms = []
    for i in range(bits):
        for j, c in enumerate(cols):
            # DuckDB's Postgres-style grammar gives |, &, << EQUAL precedence
            # (left-to-right) -- every term must be fully parenthesized or
            # the ORs re-associate into giant left shifts
            # true clamp (mirror of operators.layout.zorder_key) — not
            # modulo, which would wrap 2^bits next to 0
            clamp = f"least(greatest({c}, 0), {(1 << bits) - 1})"
            terms.append(
                f"((({clamp} >> {i}) & 1) << {i * n + j})"
            )
    return "CAST((" + " | ".join(terms) + ") AS BIGINT)"


@register(
    "zorder_key",
    f"""
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       {_zorder_sql(["l_partkey", "l_suppkey"])} AS z
FROM lineitem WHERE l_orderkey < 1000
""".strip(),
)
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-value for (partkey, suppkey) — the sort key behind the
    multi-dimensional file-clustering layout (operators.layout).  The
    bit interleave is a closed-form expression, so the layout decision
    itself is oracle-checked row-by-row; the clustering QUALITY (every
    interleaved column gets tight per-partition min/max bounds) is
    measured in tests/test_layout.py."""
    from merkonvectordb_spark.operators.layout import zorder_key

    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        zorder_key([F.col("l_partkey"), F.col("l_suppkey")]).alias("z"),
    )


@register(
    "supplier_rank_analytics",
    """
WITH rev AS (
  SELECT l_suppkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY 1
),
ranked AS (
  SELECT l_suppkey, qty,
         CAST(rank()       OVER (ORDER BY qty DESC, l_suppkey) AS BIGINT) AS rnk,
         CAST(dense_rank() OVER (ORDER BY qty DESC, l_suppkey) AS BIGINT) AS drnk,
         round(percent_rank() OVER (ORDER BY qty DESC, l_suppkey), 9) AS prk,
         round(cume_dist()    OVER (ORDER BY qty DESC, l_suppkey), 9) AS cd,
         CAST(ntile(10) OVER (ORDER BY qty DESC, l_suppkey) AS BIGINT) AS decile
  FROM rev
)
-- filter OUTSIDE the window scope: SQL WHERE runs before window
-- functions, and the ranks must be computed over ALL suppliers
SELECT * FROM ranked WHERE l_suppkey % 16 = 0
""".strip(),
)
def q_supplier_rank_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking-window family (SURVEY §2.7 — the reference has no
    window functions at all) in one pass: rank / dense_rank /
    percent_rank / cume_dist / ntile over per-supplier quantity.  The
    pre-aggregation shrinks the stream to one row per supplier BEFORE
    the (inherently single-ordered) ranking window — rank semantics
    need a total order, so the aggregate-first shape is what keeps the
    single-partition window stage at dimension size, not fact size.
    The suppkey filter applies AFTER ranking (it must see all rows)."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("qty")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("qty").desc(), F.col("l_suppkey").asc())
    return (
        rev.select(
            "l_suppkey",
            "qty",
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
            F.round(F.percent_rank().over(w), 9).alias("prk"),
            F.round(F.cume_dist().over(w), 9).alias("cd"),
            F.ntile(10).over(w).cast("bigint").alias("decile"),
        )
        .where(F.col("l_suppkey") % 16 == 0)
    )


def _pr_iter_sql(prev: str, out: str) -> str:
    """One unrolled PageRank iteration (mirror of operators.graph)."""
    return f"""
c_{out} AS (
  SELECT e.dst, sum({prev}.r / deg.d) AS s
  FROM edges e JOIN {prev} ON e.src = {prev}.node
               JOIN deg ON e.src = deg.src
  GROUP BY 1
),
{out} AS (
  SELECT node,
         round(0.15 / (SELECT n FROM nn)
               + 0.85 * coalesce(c_{out}.s, 0), 9) AS r
  FROM nodes LEFT JOIN c_{out} ON node = c_{out}.dst
)""".strip()


@register(
    "graph_pagerank",
    f"""
WITH pairs AS (
  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS a,
                  'p' || CAST(l_partkey AS VARCHAR) AS b
  FROM lineitem
),
edges AS (SELECT a AS src, b AS dst FROM pairs
          UNION ALL SELECT b, a FROM pairs),
deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT count(*) AS n FROM nodes),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes),
{_pr_iter_sql("r0", "r1")},
{_pr_iter_sql("r1", "r2")},
{_pr_iter_sql("r2", "r3")}
SELECT node, round(r, 6) AS rank FROM r3
""".strip(),
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 iterations, d=0.85) on the symmetrized supplier–part
    co-occurrence graph from lineitem.  Each iteration shuffles |E|
    contribution rows — the dataflow formulation, no adjacency blowup,
    no driver-side graph.  The oracle unrolls the same three iterations
    with per-iteration 9 dp rounding, so the hash match verifies every
    round, not just the fixed point's neighborhood."""
    from merkonvectordb_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    # narrow node keys (guide §2.3): the two string domains 's<k>'/'p<k>'
    # are carried as ONE bigint (supplier 2k, part 2k+1) through the
    # distinct, the symmetrized edge list, and every iteration's
    # join+aggregate — the string render is output-only.  Measured
    # round 10: the edge⋈degree checkpoint shrinks 127 MB → ~40 MB per
    # iteration read and the iteration joins hash 8-byte keys instead
    # of variable-length strings (4.8 s → 2.0 s with the broadcast-rank
    # iteration).  Rank VALUES are unchanged: the graph is isomorphic
    # and the per-iteration 9 dp round already pins sums across
    # engine-dependent addition orders (the oracle hash re-verifies it).
    pairs = li.select(
        (F.col("l_suppkey").cast("bigint") * 2).alias("a"),
        (F.col("l_partkey").cast("bigint") * 2 + 1).alias("b"),
    ).distinct()
    edges = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    # n_nodes derives from the operator's checkpointed node set (src is
    # symmetrized here, so src-distinct ≡ src∪dst-distinct) — counting
    # it HERE would re-scan+re-distinct lineitem, ~40% of the query
    out = pagerank(edges, iterations=3, damping=0.85)
    node_str = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("s"), F.shiftright("node", 1).cast("string")),
    ).otherwise(
        F.concat(F.lit("p"), F.shiftright("node", 1).cast("string"))
    )
    return out.select(
        node_str.alias("node"), F.round("r", 6).alias("rank")
    )


@register(
    "source_geomean",
    """
SELECT source,
       count(*) AS n_docs,
       round(exp(avg(ln(n_chars))), 6) AS geo_mean_chars
FROM documents WHERE n_chars > 0
GROUP BY source
""".strip(),
)
def q_source_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UDAF extension point (SURVEY §2.7: the reference has no
    aggregate surface at all): per-source geometric mean of document
    length via a grouped-agg pandas UDF.  The oracle is the closed form
    exp(avg(ln x)) — proving the Python aggregate computes the same
    reduction.  UDAF trade-off on display: no partial aggregation, each
    group funnels to one task (20 sources here; bucket huge keys)."""
    from merkonvectordb_spark.functions.extensions import (
        geometric_mean_udf,
        group_size_udf,
    )

    docs = load_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    # all-pandas aggregation list: Spark refuses to mix grouped-agg
    # pandas UDFs with JVM aggregates in one agg()
    return docs.groupBy("source").agg(
        group_size_udf()(F.col("n_chars")).alias("n_docs"),
        F.round(geometric_mean_udf()(F.col("n_chars")), 6).alias(
            "geo_mean_chars"
        ),
    )


@register(
    "bloom_semi_join",
    """
SELECT l_orderkey,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders WHERE o_totalprice > 400000
)
GROUP BY l_orderkey
""".strip(),
)
def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter runtime join pruning (operators.bloom): lineitem is
    pre-filtered SCAN-LOCALLY by a 64 Kbit bloom built from the
    high-value order keys, then exactly semi-joined — so the exchange
    carries only probable matches, yet the result is EXACTLY the plain
    semi-join (which is the oracle).  The 100 TB case: the build side is
    too big to broadcast raw, but its bit-set summary is 8 KB.
    Sums are integer cents (order-free across partitionings)."""
    from merkonvectordb_spark.operators.bloom import bloom_semi_join

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 400000
    )
    return (
        bloom_semi_join(li, orders, "l_orderkey", "o_orderkey")
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("bigint")
            )
            .cast("bigint")
            .alias("revenue_cents"),
        )
    )


# ---------------------------------------------------------------------------
# data profiling (ANALYZE-style): per-column stats in ONE scan
# ---------------------------------------------------------------------------

_PROFILE_NUM = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                "l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_PROFILE_STR = ["l_returnflag", "l_linestatus"]
_PROFILE_TS = ["l_shipdate"]


def _profile_arm_sql(c: str, kind: str) -> str:
    if kind == "num":
        mn = f"round(CAST(min({c}) AS DOUBLE), 6)"
        mx = f"round(CAST(max({c}) AS DOUBLE), 6)"
        ms = "CAST(NULL AS VARCHAR)"
        xs = "CAST(NULL AS VARCHAR)"
    elif kind == "str":
        mn = "CAST(NULL AS DOUBLE)"
        mx = "CAST(NULL AS DOUBLE)"
        ms = f"min({c})"
        xs = f"max({c})"
    else:  # timestamp, second precision both engines
        mn = "CAST(NULL AS DOUBLE)"
        mx = "CAST(NULL AS DOUBLE)"
        ms = f"strftime(min({c}), '%Y-%m-%d %H:%M:%S')"
        xs = f"strftime(max({c}), '%Y-%m-%d %H:%M:%S')"
    return (
        f"SELECT '{c}' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,"
        f" CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,"
        f" CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,"
        f" {mn} AS min_num, {mx} AS max_num,"
        f" {ms} AS min_str, {xs} AS max_str"
        f" FROM lineitem"
    )


_PROFILE_ORACLE = "\nUNION ALL\n".join(
    [_profile_arm_sql(c, "num") for c in _PROFILE_NUM]
    + [_profile_arm_sql(c, "str") for c in _PROFILE_STR]
    + [_profile_arm_sql(c, "ts") for c in _PROFILE_TS]
)


@register("lineitem_profile", _PROFILE_ORACLE)
def q_lineitem_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style table profile: one row per column with null count,
    exact distinct count, and type-appropriate min/max (numerics as
    rounded doubles, strings raw, timestamps at second precision —
    engine-portable renderings only).

    Plan shape: the null/min/max stats for all 11 columns run in ONE
    scan-and-aggregate (no distinct involved — a single 1-row partial
    agg).  The exact distinct counts run as 11 INDEPENDENT narrow arms
    (per-column select → distinct → count), each shuffling only its
    column's per-partition-distinct values; mixing them into the one
    aggregation instead plans a 12-way Expand carrying every column —
    measured 5× slower.  At 100 TB swap the exact distincts for the
    mergeable KMV sketch in ``operators.sketch``.  The single-row
    aggregate unpivots via stack(), then joins the distinct arms.
    """
    li = load_table(spark, sf_dir, "lineitem")
    all_cols = _PROFILE_NUM + _PROFILE_STR + _PROFILE_TS
    dists = None
    for c in all_cols:
        arm = (
            li.select(F.col(c).alias("v"))
            .where(F.col("v").isNotNull())
            .distinct()
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_distinct"))
            .select(F.lit(c).alias("column_name"), "n_distinct")
        )
        dists = arm if dists is None else dists.unionByName(arm)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for c in all_cols:
        aggs.append(F.count(F.col(c)).cast("bigint").alias(f"__nn_{c}"))
    for c in _PROFILE_NUM:
        aggs.append(
            F.round(F.min(F.col(c)).cast("double"), 6).alias(f"__mn_{c}")
        )
        aggs.append(
            F.round(F.max(F.col(c)).cast("double"), 6).alias(f"__mx_{c}")
        )
    for c in _PROFILE_STR:
        aggs.append(F.min(F.col(c)).alias(f"__mn_{c}"))
        aggs.append(F.max(F.col(c)).alias(f"__mx_{c}"))
    for c in _PROFILE_TS:
        aggs.append(
            F.date_format(F.min(F.col(c)), "yyyy-MM-dd HH:mm:ss").alias(
                f"__mn_{c}"
            )
        )
        aggs.append(
            F.date_format(F.max(F.col(c)), "yyyy-MM-dd HH:mm:ss").alias(
                f"__mx_{c}"
            )
        )
    one = li.agg(*aggs)
    arms = []
    for c in _PROFILE_NUM:
        arms.append(
            f"('{c}', __n, __n - __nn_{c}, __mn_{c}, __mx_{c},"
            f" CAST(NULL AS STRING), CAST(NULL AS STRING))"
        )
    for c in _PROFILE_STR + _PROFILE_TS:
        arms.append(
            f"('{c}', __n, __n - __nn_{c},"
            f" CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),"
            f" __mn_{c}, __mx_{c})"
        )
    stack = (
        f"stack({len(arms)}, "
        + ", ".join(a[1:-1] for a in arms)
        + ") AS (column_name, n_rows, n_nulls,"
        " min_num, max_num, min_str, max_str)"
    )
    stacked = one.select(F.expr(stack))
    return stacked.join(F.broadcast(dists), "column_name").select(
        "column_name", "n_rows", "n_nulls", "n_distinct",
        "min_num", "max_num", "min_str", "max_str",
    )


# ---------------------------------------------------------------------------
# exact correlation matrix from integer moment sums
# ---------------------------------------------------------------------------

# integer codings chosen so every moment sum fits BIGINT exactly at the
# data's ranges (dollars not cents for price: its square must survive
# a 600k-row sum)
_CORR_COLS = {
    "qty": "CAST(l_quantity AS BIGINT)",
    "price_usd": "CAST(floor(l_extendedprice) AS BIGINT)",
    "disc_pct": "CAST(round(l_discount * 100) AS BIGINT)",
    "tax_pct": "CAST(round(l_tax * 100) AS BIGINT)",
}
_CORR_PAIRS = [
    ("qty", "price_usd"), ("qty", "disc_pct"), ("qty", "tax_pct"),
    ("price_usd", "disc_pct"), ("price_usd", "tax_pct"),
    ("disc_pct", "tax_pct"),
]


def _corr_oracle() -> str:
    coded = ", ".join(f"{e} AS {n}" for n, e in _CORR_COLS.items())
    sums = ["CAST(count(*) AS BIGINT) AS n"]
    for c in _CORR_COLS:
        sums.append(f"CAST(sum({c}) AS BIGINT) AS s_{c}")
        sums.append(f"CAST(sum({c} * {c}) AS BIGINT) AS s_{c}_{c}")
    for a, b in _CORR_PAIRS:
        sums.append(f"CAST(sum({a} * {b}) AS BIGINT) AS s_{a}_{b}")
    arms = []
    for a, b in _CORR_PAIRS:
        num = f"(CAST(n AS DOUBLE) * s_{a}_{b} - CAST(s_{a} AS DOUBLE) * s_{b})"
        da = f"(CAST(n AS DOUBLE) * s_{a}_{a} - CAST(s_{a} AS DOUBLE) * s_{a})"
        db = f"(CAST(n AS DOUBLE) * s_{b}_{b} - CAST(s_{b} AS DOUBLE) * s_{b})"
        arms.append(
            f"SELECT '{a}~{b}' AS pair, n,"
            f" round({num} / sqrt({da} * {db}), 6) AS corr FROM s"
        )
    return (
        f"WITH coded AS (SELECT {coded} FROM lineitem),\n"
        f"s AS (SELECT {', '.join(sums)} FROM coded)\n"
        + "\nUNION ALL\n".join(arms)
    )


@register("lineitem_correlations", _corr_oracle())
def q_lineitem_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlations for all 6 column pairs from ONE aggregation
    pass of integer moment sums (codings keep every sum inside BIGINT —
    associative, order-free); floats enter only in the closed-form
    final arithmetic, identical in both engines.  The built-in
    ``corr()`` aggregate is float-accumulating (order-dependent); this
    is the hash-stable formulation."""
    li = load_table(spark, sf_dir, "lineitem")
    coded = li.select(
        *[F.expr(e).alias(n) for n, e in _CORR_COLS.items()]
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(F.col(c)).cast("bigint").alias(f"s_{c}"))
        aggs.append(
            F.sum(F.col(c) * F.col(c)).cast("bigint").alias(f"s_{c}_{c}")
        )
    for a, b in _CORR_PAIRS:
        aggs.append(
            F.sum(F.col(a) * F.col(b)).cast("bigint").alias(f"s_{a}_{b}")
        )
    s = coded.agg(*aggs)
    out = None
    for a, b in _CORR_PAIRS:
        nd = F.col("n").cast("double")
        num = nd * F.col(f"s_{a}_{b}") - F.col(f"s_{a}").cast(
            "double"
        ) * F.col(f"s_{b}")
        da = nd * F.col(f"s_{a}_{a}") - F.col(f"s_{a}").cast(
            "double"
        ) * F.col(f"s_{a}")
        db = nd * F.col(f"s_{b}_{b}") - F.col(f"s_{b}").cast(
            "double"
        ) * F.col(f"s_{b}")
        row = s.select(
            F.lit(f"{a}~{b}").alias("pair"),
            "n",
            F.round(num / F.sqrt(da * db), 6).alias("corr"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# join-key skew report: the pre-join diagnosis that picks salting/AQE
# ---------------------------------------------------------------------------

_SKEW_KEYS = [
    ("lineitem", "l_orderkey"),
    ("orders", "o_custkey"),
    ("events", "user_id"),
    ("events", "event_type"),
]


def _skew_arm_sql(table: str, col: str) -> str:
    return f"""
SELECT '{table}.{col}' AS key_name,
       CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(max(c) AS BIGINT) AS max_key_rows,
       round(CAST(max(c) AS DOUBLE) * count(*) / sum(c), 6)
         AS skew_factor
FROM (SELECT count(*) AS c FROM {table}
      WHERE {col} IS NOT NULL GROUP BY {col})
""".strip()


@register(
    "key_skew_report",
    "\nUNION ALL\n".join(_skew_arm_sql(t, c) for t, c in _SKEW_KEYS),
)
def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis: per candidate key, the row count, key
    count, heaviest key's rows, and the skew factor (max/mean key
    size).  A factor near 1 = uniform (hash join fine); a large factor
    = a straggler partition at shuffle time → route through
    ``operators.skew.salted_join`` or AQE skew handling.  One
    partial-aggregated groupBy per key — the report costs one pass per
    candidate, integers except the final scan-local ratio."""
    out = None
    for table, col in _SKEW_KEYS:
        df = load_table(spark, sf_dir, table)
        per_key = (
            df.where(F.col(col).isNotNull())
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("c"))
        )
        row = per_key.agg(
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.max("c").cast("bigint").alias("max_key_rows"),
            F.round(
                F.max("c").cast("double")
                * F.count(F.lit(1))
                / F.sum("c"),
                6,
            ).alias("skew_factor"),
        ).select(
            F.lit(f"{table}.{col}").alias("key_name"),
            "n_rows",
            "n_keys",
            "max_key_rows",
            "skew_factor",
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# merkondb migration round-trip, driver-verified: synthesize a reference
# database file from the documents table (driver-side — the reference
# format is single-node by construction), read it back through the
# Python DataSource, aggregate.  The oracle computes the SAME output
# directly from documents — any byte the codec or source mangles
# (keys, metadata strings, entry counts, collection routing) breaks
# the hash.
# ---------------------------------------------------------------------------

_MERKONDB_RT_ORACLE = """
SELECT source AS collection,
       CAST(count(*) AS BIGINT) AS n_entries,
       min(CAST(doc_id AS VARCHAR)) AS min_key,
       max(CAST(doc_id AS VARCHAR)) AS max_key,
       CAST(sum(length('{"id": "' || CAST(doc_id AS VARCHAR) || '"}'))
            AS BIGINT) AS meta_chars,
       CAST(sum(length('[' || CAST(n_chars AS VARCHAR) || '.0]'))
            AS BIGINT) AS emb_chars
FROM documents GROUP BY source
""".strip()


@register("merkondb_roundtrip", _MERKONDB_RT_ORACLE)
def q_merkondb_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → reference-format MessagePack file → DataSource read →
    per-collection aggregate.  Exercises the full migration surface
    (spec-derived codec encode+decode, the `merkondb` Python DataSource,
    string fidelity) under the driver's own environment; the oracle is
    the no-round-trip formulation, so the hash match proves the file
    layer is lossless."""
    import shutil
    import tempfile

    from merkonvectordb_spark.sources.merkondb import read_merkondb
    from merkonvectordb_spark.sources.msgpackio import packb

    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    data: dict[str, list] = {}
    # driver-side build is the point: the reference file IS single-node
    for r in sorted(docs.collect(), key=lambda r: (r["source"], r["doc_id"])):
        data.setdefault(r["source"], []).append(
            [
                str(r["doc_id"]),
                '{"id": "' + str(r["doc_id"]) + '"}',
                "[" + str(r["n_chars"]) + ".0]",
                "2024-01-01 00:00:00Z",
            ]
        )
    root = tempfile.mkdtemp(prefix="merkondb_rt_")
    try:
        with open(f"{root}/rt.db", "wb") as fh:
            fh.write(packb([data]))
        back = read_merkondb(spark, f"{root}/rt.db")
        out = back.groupBy("collection").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_entries"),
            F.min("key").alias("min_key"),
            F.max("key").alias("max_key"),
            F.sum(F.length("metadata")).cast("bigint").alias("meta_chars"),
            F.sum(F.length("embedding_json")).cast("bigint").alias("emb_chars"),
        )
        # materialize before the temp file disappears
        return spark.createDataFrame(
            out.collect(),
            "collection STRING, n_entries LONG, min_key STRING,"
            " max_key STRING, meta_chars LONG, emb_chars LONG",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
