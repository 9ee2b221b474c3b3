"""Driver-facing query registry: every implemented operator from
SURVEY.md §2 (plus the LLM-pipeline extensions) as a (spark, sf_dir) →
DataFrame callable, with a DuckDB-equivalent oracle SQL string.

Parity rules that keep the driver's hash-compare honest:

* every computed column is aliased identically on both sides;
* floats are ``round()``-ed identically on both sides (scores 6dp, money
  2dp) — both engines compute in DOUBLE with the same left-to-right
  summation order, rounding only guards the last bits;
* timestamps are rendered to strings (the reference's own "u" format,
  MerkonMemoryStore.cs:207-210) so engine-side timezone/precision
  conventions can't leak into the hash;
* LIMIT/top-k queries carry deterministic tie-breaks (SURVEY §2.4:
  the reference's stable sort ⇒ our explicit ``ingest_seq``/key order).

The ``vectors`` corpus (the reference's data model: collection / key /
metadata JSON / embedding / timestamp / ingest_seq, MerkonDatabase.cs:243-254)
is derived deterministically from the driver's ``embeddings`` table with
the SAME expression in Spark and SQL, so both engines query identical data.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from merkonvectordb_spark.functions.vector import l2_norm
from merkonvectordb_spark.operators.search import knn, knn_batch
from merkonvectordb_spark.schema import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


# ---------------------------------------------------------------------------
# the derived `vectors` corpus (reference data model over driver fixtures)
# ---------------------------------------------------------------------------

# timestamp base mirrors FIXTURES.md §1 (base + seq seconds)
_TS_BASE = "2026-01-01 00:00:00"

# DuckDB rendering of the same derivation — MUST stay in lockstep with
# `vectors_df` below.
VECTORS_ORACLE_CTE = f"""
vectors AS (
  SELECT
    'coll_' || CAST(label % 5 AS VARCHAR)            AS collection,
    'k' || printf('%06d', vec_id)                    AS key,
    '{{"id":"k' || printf('%06d', vec_id)
        || '","source":"fixture","n":' || CAST(vec_id AS VARCHAR) || '}}'
                                                     AS metadata,
    embedding,
    TIMESTAMP '{_TS_BASE}' + INTERVAL (vec_id) SECOND AS ts,
    vec_id                                           AS ingest_seq
  FROM embeddings
)
""".strip()


def vectors_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's `DatabaseEntry` table, derived from `embeddings`."""
    emb = load_table(spark, sf_dir, "embeddings")
    key = F.concat(F.lit("k"), F.format_string("%06d", F.col("vec_id")))
    return emb.select(
        F.concat(F.lit("coll_"), (F.col("label") % 5).cast("string")).alias(
            "collection"
        ),
        key.alias("key"),
        F.concat(
            F.lit('{"id":"'),
            key,
            F.lit('","source":"fixture","n":'),
            F.col("vec_id").cast("string"),
            F.lit("}"),
        ).alias("metadata"),
        F.col("embedding"),
        (
            F.lit(_TS_BASE).cast("timestamp")
            + F.make_interval(secs=F.col("vec_id").cast("double"))
        ).alias("ts"),
        F.col("vec_id").alias("ingest_seq"),
    )


def _ts_str(col: F.Column) -> F.Column:
    """Reference "u"-format rendering (MerkonMemoryStore.cs:207-210)."""
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss'Z'")


_TS_STR_SQL = "strftime({c}, '%Y-%m-%d %H:%M:%S') || 'Z'"

# DuckDB cosine between two DOUBLE[] lists, deterministic fold — the RAW
# score (threshold + ordering act on this; rounding is output-only, exactly
# as in operators.search).  Mirrors functions.vector.cosine_similarity.
_COS_RAW_SQL = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


def _fetch_query_vec(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list:
    row = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") == vec_id)
        .select("embedding")
        .first()
    )
    return list(row[0])


# ---------------------------------------------------------------------------
# §2.4 the flagship: brute-force cosine top-k
# ---------------------------------------------------------------------------

_KNN_ORACLE = f"""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id, e.label,
         {_COS_RAW_SQL.format(a="CAST(e.embedding AS DOUBLE[])", b="q.qv")} AS raw
  FROM embeddings e CROSS JOIN q
  WHERE len(e.embedding) = len(q.qv)
    AND sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) > 0
    AND sqrt(list_dot_product(q.qv, q.qv)) > 0
)
SELECT vec_id, label, round(raw, 6) AS score FROM scored
WHERE raw >= 0.1
ORDER BY raw DESC, vec_id ASC
LIMIT 10
""".strip()


@register("knn_topk", _KNN_ORACLE)
def q_knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.4: scan → cosine → NaN-safe inclusive threshold → top-k
    (TakeOrderedAndProject; reference GetNearestMatchesAsync,
    MerkonMemoryStore.cs:117-150)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = _fetch_query_vec(spark, sf_dir, 0)
    return knn(emb, qvec, k=10, min_score=0.1, tie_break="vec_id").select(
        "vec_id", "label", "score"
    )


_KNN_BATCH_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, e.vec_id, e.label,
         {_COS_RAW_SQL.format(a="CAST(e.embedding AS DOUBLE[])", b="q.qv")} AS raw
  FROM embeddings e CROSS JOIN q
  WHERE len(e.embedding) = len(q.qv)
    AND sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) > 0
    AND sqrt(list_dot_product(q.qv, q.qv)) > 0
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY raw DESC, vec_id ASC) AS rn
  FROM scored WHERE raw >= 0.0
)
SELECT query_id, vec_id, label, round(raw, 6) AS score FROM ranked WHERE rn <= 3
""".strip()


@register("knn_batch", _KNN_BATCH_ORACLE)
def q_knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.4 batch form: broadcast query set × one corpus scan →
    window top-k per query."""
    emb = load_table(spark, sf_dir, "embeddings")
    qset = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = knn_batch(emb, qset, k=3, min_score=0.0, tie_break="vec_id")
    return out.select("query_id", "vec_id", "label", "score")


# ---------------------------------------------------------------------------
# §2.1 scans / §2.2 projections & predicates over the vectors corpus
# ---------------------------------------------------------------------------


@register(
    "collections_list",
    f"WITH {VECTORS_ORACLE_CTE} SELECT DISTINCT collection FROM vectors",
)
def q_collections_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.1 S4 (GetCollectionsAsync, MerkonDatabase.cs:197-204)."""
    return vectors_df(spark, sf_dir).select("collection").distinct()


@register(
    "scan_collection",
    f"""
WITH {VECTORS_ORACLE_CTE}
SELECT key, metadata,
       {_TS_STR_SQL.format(c="ts")} AS ts_str,
       ingest_seq,
       round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))), 6) AS emb_norm
FROM vectors WHERE collection = 'coll_1'
""".strip(),
)
def q_scan_collection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.1 S3 full-collection scan (ReadAllAsync,
    MerkonDatabase.cs:206-215) with P2 embedding projection replaced by a
    checksum column (norm) so the hash compares vector bytes without
    float32-array hashing ambiguity."""
    v = vectors_df(spark, sf_dir).where(F.col("collection") == "coll_1")
    return v.select(
        "key",
        "metadata",
        _ts_str(F.col("ts")).alias("ts_str"),
        "ingest_seq",
        F.round(l2_norm(F.col("embedding")), 6).alias("emb_norm"),
    )


@register(
    "point_lookup",
    f"""
WITH {VECTORS_ORACLE_CTE}
SELECT collection, key, metadata, ingest_seq
FROM vectors WHERE key = 'k000042'
""".strip(),
)
def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.2 P1 key-equality lookup (GetItem, MerkonDatabase.cs:26-32):
    predicate pushes to the parquet scan instead of the reference's O(N)
    linear probe."""
    return (
        vectors_df(spark, sf_dir)
        .where(F.col("key") == "k000042")
        .select("collection", "key", "metadata", "ingest_seq")
    )


@register(
    "metadata_parse",
    f"""
WITH {VECTORS_ORACLE_CTE}
SELECT key,
       json_extract_string(metadata, '$.id') AS meta_id,
       json_extract_string(metadata, '$.source') AS meta_source,
       CAST(json_extract_string(metadata, '$.n') AS BIGINT) AS meta_n
FROM vectors WHERE collection = 'coll_0'
""".strip(),
)
def q_metadata_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.6 F3 metadata JSON decode (MemoryRecord.FromJsonMetadata,
    MerkonMemoryStore.cs:232) — semi-structured access as virtual columns."""
    v = vectors_df(spark, sf_dir).where(F.col("collection") == "coll_0")
    return v.select(
        "key",
        F.get_json_object("metadata", "$.id").alias("meta_id"),
        F.get_json_object("metadata", "$.source").alias("meta_source"),
        F.get_json_object("metadata", "$.n").cast("bigint").alias("meta_n"),
    )


@register(
    "timestamp_roundtrip",
    f"""
WITH {VECTORS_ORACLE_CTE}
SELECT key, {_TS_STR_SQL.format(c="ts")} AS ts_u,
       CAST(epoch(ts) AS BIGINT) AS ts_epoch
FROM vectors WHERE ingest_seq < 100
""".strip(),
)
def q_timestamp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.6 F4: the reference's "u" timestamp format (UTC, second
    precision, MerkonMemoryStore.cs:207-221) rendered losslessly."""
    v = vectors_df(spark, sf_dir).where(F.col("ingest_seq") < 100)
    return v.select(
        "key",
        _ts_str(F.col("ts")).alias("ts_u"),
        F.unix_timestamp("ts").alias("ts_epoch"),
    )


# ---------------------------------------------------------------------------
# relational surface (free from Spark SQL — SURVEY §2.7; bench headliners)
# ---------------------------------------------------------------------------


@register(
    "tpch_q1",
    """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                       AS sum_qty,
       round(sum(l_extendedprice), 2)                                  AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)               AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6)                                       AS avg_qty,
       count(*)                                                        AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""".strip(),
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: partial (map-side) aggregation → tiny shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "tpch_q3",
    """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""".strip(),
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: broadcast ONLY the filtered dimension (customer) —
    orders is fact-sized, so the orders⋈lineitem strategy is left to
    Catalyst/AQE (shuffle join at scale; never forced onto the driver).
    Deterministic tie-break for the LIMIT."""
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner"),
            li.l_orderkey == orders.o_orderkey,
            "inner",
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
    )
