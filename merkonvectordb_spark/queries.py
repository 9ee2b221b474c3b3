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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from merkonvectordb_spark.functions.timeutil import utc_ts
from merkonvectordb_spark.functions.vector import l2_norm
from merkonvectordb_spark.operators import store as store_ops
from merkonvectordb_spark.operators.search import knn, knn_batch
from merkonvectordb_spark.schema import load_table
from merkonvectordb_spark.sources.ingest import (
    decode_embedding_json,
    encode_embedding_json,
)

from merkonvectordb_spark.registry import (  # noqa: F401  (re-export)
    QueryFn,
    oracle_sql,
    queries,
    register,
)


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
            utc_ts(_TS_BASE)
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


_UNIT_SQL = (
    "list_transform(CAST({e} AS DOUBLE[]), x -> x / "
    "sqrt(list_dot_product(CAST({e} AS DOUBLE[]), CAST({e} AS DOUBLE[]))))"
)

_KNN_BATCH_PRENORM_ORACLE = f"""
WITH eu AS (
  SELECT vec_id, label, {_UNIT_SQL.format(e="embedding")} AS ue
  FROM embeddings
  WHERE sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                              CAST(embedding AS DOUBLE[]))) > 0
),
q AS (
  SELECT vec_id AS query_id, {_UNIT_SQL.format(e="embedding")} AS uq
  FROM embeddings
  WHERE vec_id < 5
    AND sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                              CAST(embedding AS DOUBLE[]))) > 0
),
scored AS (
  SELECT q.query_id, e.vec_id, e.label, list_dot_product(e.ue, q.uq) AS raw
  FROM eu e CROSS JOIN q
  WHERE len(e.ue) = len(q.uq)
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY raw DESC, vec_id ASC) AS rn
  FROM scored WHERE raw >= 0.0
)
SELECT query_id, vec_id, label, round(raw, 6) AS score FROM ranked WHERE rn <= 3
""".strip()


@register("knn_batch_prenorm", _KNN_BATCH_PRENORM_ORACLE)
def q_knn_batch_prenorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.4 batch kNN over the PRE-NORMALIZED corpus layout
    (``VectorStore(pre_normalized=True)``; functions/vector.py:19-21):
    the corpus is unit-normalized ONCE (3 folds per row, the cost a real
    deployment pays at ingest), after which every (row × query) score is
    a single dot fold — vs cosine's three.  Same results as ``knn_batch``
    by construction (cosine(a,b) ≡ dot(â,b̂)); the oracle mirrors the
    normalize-then-dot operation order so raw scores stay bit-identical."""
    from merkonvectordb_spark.functions.vector import l2_normalize

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.withColumn("embedding", l2_normalize(F.col("embedding"))).where(
        F.col("embedding").isNotNull()
    )
    qset = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = knn_batch(
        corpus, qset, k=3, min_score=0.0, tie_break="vec_id",
        assume_normalized=True,
    )
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
       CAST(json_extract_string(metadata, '$.n') AS BIGINT) AS meta_n,
       json_extract_string(metadata, '$.id') AS meta_id_struct
FROM vectors WHERE collection = 'coll_0'
""".strip(),
)
def q_metadata_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.6 F3 metadata JSON decode (MemoryRecord.FromJsonMetadata,
    MerkonMemoryStore.cs:232) — semi-structured access as virtual columns.
    Two decode paths under one oracle: ad-hoc ``get_json_object`` fields
    AND the declared typed-struct view (``schema.parse_metadata`` →
    ``METADATA_STRUCT``); ``meta_id_struct`` must equal the path-extracted
    id, proving the one-parse struct design decodes identically."""
    from merkonvectordb_spark.schema import parse_metadata

    v = parse_metadata(
        vectors_df(spark, sf_dir).where(F.col("collection") == "coll_0")
    )
    return v.select(
        "key",
        F.get_json_object("metadata", "$.id").alias("meta_id"),
        F.get_json_object("metadata", "$.source").alias("meta_source"),
        F.get_json_object("metadata", "$.n").cast("bigint").alias("meta_n"),
        F.col("metadata_struct").getField("id").alias("meta_id_struct"),
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
    """SURVEY §2.6 F4, BOTH directions: render (MerkonMemoryStore.cs:207-210)
    and parse (AssumeUniversal, :212-221).  ``ts_u`` goes ts → "u" string →
    ``parse_u_timestamp`` → "u" string; the oracle renders the original ts
    once, so the hash match proves string→timestamp→string is identity —
    the parse path is oracle-verified, not just exposed."""
    from merkonvectordb_spark.sources.ingest import parse_u_timestamp

    v = vectors_df(spark, sf_dir).where(F.col("ingest_seq") < 100)
    return v.select(
        "key",
        _ts_str(parse_u_timestamp(_ts_str(F.col("ts")))).alias("ts_u"),
        F.unix_timestamp("ts").alias("ts_epoch"),
    )


# ---------------------------------------------------------------------------
# §2.3 the write surface (W1-W11) as pure state transitions, oracle-checked
# ---------------------------------------------------------------------------

# update batch: rewrite 20 existing keys + insert 10 new ones — derived from
# `embeddings` with fixed vec_id ranges so it's stable across scale factors.
_UPDATES_ORACLE_CTE = f"""
updates AS (
  SELECT 'coll_' || CAST(label % 5 AS VARCHAR)         AS collection,
         'k' || printf('%06d', vec_id)                 AS key,
         '{{"id":"k' || printf('%06d', vec_id) || '","source":"upsert"}}' AS metadata,
         embedding,
         TIMESTAMP '{_TS_BASE}' + INTERVAL (vec_id + 100000) SECOND AS ts
  FROM embeddings WHERE vec_id BETWEEN 10 AND 29
  UNION ALL
  SELECT 'coll_' || CAST(label % 5 AS VARCHAR),
         'n' || printf('%06d', vec_id),
         '{{"id":"n' || printf('%06d', vec_id) || '","source":"insert"}}',
         embedding,
         TIMESTAMP '{_TS_BASE}' + INTERVAL (vec_id + 100000) SECOND
  FROM embeddings WHERE vec_id BETWEEN 480 AND 489
)
""".strip()


def _updates_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ts = (
        utc_ts(_TS_BASE)
        + F.make_interval(secs=(F.col("vec_id") + 100000).cast("double"))
    ).alias("ts")
    coll = F.concat(F.lit("coll_"), (F.col("label") % 5).cast("string")).alias(
        "collection"
    )

    def batch(lo: int, hi: int, prefix: str, source: str) -> DataFrame:
        key = F.concat(F.lit(prefix), F.format_string("%06d", F.col("vec_id")))
        meta = F.concat(
            F.lit('{"id":"'), key, F.lit(f'","source":"{source}"}}')
        )
        return emb.where(F.col("vec_id").between(lo, hi)).select(
            coll, key.alias("key"), meta.alias("metadata"), "embedding", ts
        )

    return batch(10, 29, "k", "upsert").unionByName(
        batch(480, 489, "n", "insert")
    )


_NORM_SQL = (
    "round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), "
    "CAST(embedding AS DOUBLE[]))), 6)"
)


@register(
    "upsert_roundtrip",
    f"""
WITH {VECTORS_ORACLE_CTE},
{_UPDATES_ORACLE_CTE},
updated AS (
  SELECT v.collection, v.key, u.metadata, u.embedding, u.ts, v.ingest_seq
  FROM vectors v JOIN updates u USING (collection, key)
),
kept AS (
  SELECT v.* FROM vectors v ANTI JOIN updates u USING (collection, key)
),
mx AS (SELECT max(ingest_seq) AS m FROM vectors),
ins AS (
  SELECT u.collection, u.key, u.metadata, u.embedding, u.ts,
         mx.m + row_number() OVER (ORDER BY u.collection, u.key) AS ingest_seq
  FROM (SELECT u0.* FROM updates u0 ANTI JOIN vectors v USING (collection, key)) u
  CROSS JOIN mx
),
final AS (
  SELECT * FROM kept UNION ALL SELECT * FROM updated UNION ALL SELECT * FROM ins
)
SELECT collection, key,
       json_extract_string(metadata, '$.source') AS meta_source,
       ingest_seq,
       {_TS_STR_SQL.format(c="ts")} AS ts_str,
       {_NORM_SQL} AS emb_norm
FROM final
""".strip(),
)
def q_upsert_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.3 W1/W4 batched InsertOrUpdate as a pure state transition
    (MerkonDatabase.cs:89-104): 20 in-place updates keep their ingest_seq,
    10 inserts get fresh seqs after the max.  The full post-state is
    hash-compared, so update/keep/insert routing can't silently drift."""
    state = vectors_df(spark, sf_dir)
    out = store_ops.upsert(state, _updates_df(spark, sf_dir))
    return out.select(
        "collection",
        "key",
        F.get_json_object("metadata", "$.source").alias("meta_source"),
        "ingest_seq",
        _ts_str(F.col("ts")).alias("ts_str"),
        F.round(l2_norm(F.col("embedding")), 6).alias("emb_norm"),
    )


_DELETE_KEYS = [f"k{i:06d}" for i in range(20)]
_DELETE_KEYS_SQL = ", ".join(f"'{k}'" for k in _DELETE_KEYS)


@register(
    "delete_semantics",
    f"""
WITH {VECTORS_ORACLE_CTE},
dup AS (
  SELECT collection, key, metadata, embedding, ts, ingest_seq + 1000000 AS ingest_seq
  FROM vectors WHERE ingest_seq < 3
),
injected AS (
  SELECT 'coll_0' AS collection, '' AS key, '{{}}' AS metadata,
         CAST(NULL AS FLOAT[]) AS embedding, CAST(NULL AS TIMESTAMP) AS ts,
         CAST(2000001 AS BIGINT) AS ingest_seq
  UNION ALL
  SELECT 'coll_0', CAST(NULL AS VARCHAR), '{{}}',
         CAST(NULL AS FLOAT[]), CAST(NULL AS TIMESTAMP), 2000002
),
state AS (
  SELECT * FROM vectors UNION ALL SELECT * FROM dup UNION ALL SELECT * FROM injected
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY collection, key ORDER BY ingest_seq) AS rn
  FROM state
),
afterdel AS (
  SELECT * FROM ranked
  WHERE NOT (collection = 'coll_0'
             AND COALESCE(key IN ({_DELETE_KEYS_SQL}), FALSE)
             AND rn = 1)
),
afterempty AS (
  SELECT * FROM afterdel
  WHERE NOT (collection = 'coll_0' AND (key IS NULL OR key = ''))
),
final AS (SELECT * FROM afterempty WHERE collection <> 'coll_4')
SELECT collection, key, ingest_seq, {_NORM_SQL} AS emb_norm FROM final
""".strip(),
)
def q_delete_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.3 W5-W8 composed: first-match-only key deletes
    (MerkonDatabase.cs:58-70 — a later duplicate survives), empty-key purge
    (:72-88), then whole-collection drop (:49-56), on a state seeded with
    duplicate keys and empty/NULL-key rows to exercise each quirk."""
    v = vectors_df(spark, sf_dir)
    dup = v.where(F.col("ingest_seq") < 3).withColumn(
        "ingest_seq", F.col("ingest_seq") + 1000000
    )
    injected = spark.createDataFrame(
        [
            ("coll_0", "", "{}", None, None, 2000001),
            ("coll_0", None, "{}", None, None, 2000002),
        ],
        "collection STRING, key STRING, metadata STRING, "
        "embedding ARRAY<FLOAT>, ts TIMESTAMP, ingest_seq LONG",
    )
    state = v.unionByName(dup).unionByName(injected)
    out = store_ops.delete_keys(state, "coll_0", _DELETE_KEYS)
    out = store_ops.delete_empty_keys(out, "coll_0")
    out = store_ops.delete_collection(out, "coll_4")
    return out.select(
        "collection",
        "key",
        "ingest_seq",
        F.round(l2_norm(F.col("embedding")), 6).alias("emb_norm"),
    )


@register(
    "collection_ddl",
    f"""
WITH {VECTORS_ORACLE_CTE},
registry AS (SELECT 'coll_0' AS collection UNION ALL SELECT 'coll_empty'),
data_colls AS (SELECT DISTINCT collection FROM vectors),
cand AS (
  SELECT * FROM (VALUES ('coll_0'), ('coll_1'), ('coll_2'), ('coll_3'),
                        ('coll_4'), ('coll_empty'), ('coll_missing'),
                        ('bad name')) AS t(collection)
)
SELECT c.collection,
       (r.collection IS NOT NULL) AS in_registry,
       (d.collection IS NOT NULL) AS has_data,
       (r.collection IS NOT NULL OR d.collection IS NOT NULL) AS does_exist,
       COALESCE(regexp_matches(c.collection, '^[0-9A-Za-z_]+$'), FALSE) AS valid_name
FROM cand c
LEFT JOIN registry r ON c.collection = r.collection
LEFT JOIN data_colls d ON c.collection = d.collection
""".strip(),
)
def q_collection_ddl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.3 W9/W10/W11 + §2.6 F6: the registry design — a created
    (possibly empty) collection exists (MerkonDatabase.cs:18-24,44-47)
    alongside collections that exist only through data, plus SK name
    validation (Diagnostics/Verify.cs:39-61)."""
    registry = spark.createDataFrame(
        [("coll_0",), ("coll_empty",)], "collection STRING"
    )
    data_colls = vectors_df(spark, sf_dir).select("collection").distinct()
    cand = spark.createDataFrame(
        [
            ("coll_0",), ("coll_1",), ("coll_2",), ("coll_3",), ("coll_4",),
            ("coll_empty",), ("coll_missing",), ("bad name",),
        ],
        "collection STRING",
    )
    r = registry.withColumn("in_registry", F.lit(True))
    d = data_colls.withColumn("has_data", F.lit(True))
    return (
        cand.join(r, "collection", "left")
        .join(d, "collection", "left")
        .select(
            "collection",
            F.coalesce("in_registry", F.lit(False)).alias("in_registry"),
            F.coalesce("has_data", F.lit(False)).alias("has_data"),
            (
                F.coalesce("in_registry", F.lit(False))
                | F.coalesce("has_data", F.lit(False))
            ).alias("does_exist"),
            store_ops.is_valid_collection_name(F.col("collection")).alias(
                "valid_name"
            ),
        )
    )


# ---------------------------------------------------------------------------
# §2.5 R1 GetBatch — both modes
# ---------------------------------------------------------------------------

_GET_BATCH_REQ_CTE = """
cand AS (
  SELECT key, ingest_seq, metadata,
         row_number() OVER (ORDER BY ingest_seq) - 1 AS rk
  FROM vectors WHERE collection = 'coll_1'
),
req AS (
  SELECT rk AS req_ord, key FROM cand WHERE rk < 3
  UNION ALL SELECT 3, '__missing__'
  UNION ALL SELECT rk + 1, key FROM cand WHERE rk IN (3, 4)
)
""".strip()


def _get_batch_keys(spark: SparkSession, sf_dir: str) -> list[str]:
    cand = (
        vectors_df(spark, sf_dir)
        .where(F.col("collection") == "coll_1")
        .orderBy("ingest_seq")
        .select("key")
        .limit(5)
        .collect()
    )
    ks = [r.key for r in cand]
    return ks[:3] + ["__missing__"] + ks[3:5]


@register(
    "get_batch_prefix",
    f"""
WITH {VECTORS_ORACLE_CTE},
{_GET_BATCH_REQ_CTE},
joined AS (
  SELECT r.req_ord, r.key, v.metadata, v.ingest_seq
  FROM req r LEFT JOIN (SELECT * FROM vectors WHERE collection = 'coll_1') v
    ON r.key = v.key
),
miss AS (SELECT COALESCE(min(req_ord), 2147483647) AS m FROM joined WHERE ingest_seq IS NULL)
SELECT req_ord, key, metadata, ingest_seq
FROM joined CROSS JOIN miss WHERE req_ord < miss.m
""".strip(),
)
def q_get_batch_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.5 R1 faithful mode: yield requested keys in order, STOP at
    the first missing key (the reference's yield break,
    MerkonMemoryStore.cs:97-100) — prefix semantics, not a semi-join."""
    keys = _get_batch_keys(spark, sf_dir)
    out = store_ops.get_batch(
        vectors_df(spark, sf_dir), "coll_1", keys, mode="faithful"
    )
    return out.select("req_ord", "key", "metadata", "ingest_seq")


@register(
    "get_batch_join",
    f"""
WITH {VECTORS_ORACLE_CTE},
{_GET_BATCH_REQ_CTE}
SELECT r.req_ord, r.key, v.metadata, v.ingest_seq
FROM req r JOIN (SELECT * FROM vectors WHERE collection = 'coll_1') v
  ON r.key = v.key
""".strip(),
)
def q_get_batch_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.5 R1 sane mode: the semi-join shape — every present key,
    no early stop (the mode a distributed engine should default to)."""
    keys = _get_batch_keys(spark, sf_dir)
    out = store_ops.get_batch(
        vectors_df(spark, sf_dir), "coll_1", keys, mode="join"
    )
    return out.select("req_ord", "key", "metadata", "ingest_seq")


@register(
    "vector_json_roundtrip",
    f"""
WITH {VECTORS_ORACLE_CTE}
SELECT key, {_NORM_SQL} AS emb_norm_rt
FROM vectors WHERE collection = 'coll_2'
""".strip(),
)
def q_vector_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.6 F2: JSON encode → decode of the embedding is lossless
    (ReadOnlyMemoryConverter.cs:15-31) — the roundtripped norm must equal
    the oracle's norm of the ORIGINAL vector, so any codec loss breaks the
    hash."""
    v = vectors_df(spark, sf_dir).where(F.col("collection") == "coll_2")
    rt = decode_embedding_json(encode_embedding_json(F.col("embedding")))
    return v.select("key", F.round(l2_norm(rt), 6).alias("emb_norm_rt"))


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
        li.where(F.col("l_shipdate") <= utc_ts("1998-09-02 00:00:00"))
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
        F.col("o_orderdate") < utc_ts("1995-03-15 00:00:00")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > utc_ts("1995-03-15 00:00:00")
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


# ---------------------------------------------------------------------------
# extension query modules (registered on import; SURVEY §7.6 north star)
# ---------------------------------------------------------------------------

from merkonvectordb_spark import queries_text  # noqa: E402,F401
from merkonvectordb_spark import queries_events  # noqa: E402,F401
from merkonvectordb_spark import queries_dedup  # noqa: E402,F401
from merkonvectordb_spark import queries_ann  # noqa: E402,F401
from merkonvectordb_spark import queries_multimodal  # noqa: E402,F401
from merkonvectordb_spark import queries_misc  # noqa: E402,F401
from merkonvectordb_spark import queries_tpch  # noqa: E402,F401
from merkonvectordb_spark import queries_tpch2  # noqa: E402,F401
from merkonvectordb_spark import queries_temporal  # noqa: E402,F401
from merkonvectordb_spark import queries_streaming  # noqa: E402,F401
from merkonvectordb_spark import queries_sketch  # noqa: E402,F401
from merkonvectordb_spark import queries_pipeline  # noqa: E402,F401
from merkonvectordb_spark import queries_hybrid  # noqa: E402,F401
from merkonvectordb_spark import queries_spans  # noqa: E402,F401
from merkonvectordb_spark import queries_expectations  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Verification priority (rotation policy — VERDICT r6 next-round #1/#2).
# The external harness oracle-checks only the first 50 registry entries
# per round.  Rounds 1-6 hand-curated that block; it is now computed:
# never-driver-checked and latest-red queries front the block, then the
# least-recently-verified green rows, ties by registration order — so
# every registry entry is re-verified at a bounded staleness (~4 rounds
# at N=184) and a session-2-style late addition can never sit outside
# the block.  The rank data (``LAST_VERIFIED``) is generated from the
# committed CORRECTNESS_r*.json artifacts by
# tools/build_verification_map.py and pinned by tests/test_registry.py.
# ---------------------------------------------------------------------------

from merkonvectordb_spark import registry as _registry  # noqa: E402
from merkonvectordb_spark.registry import set_priority as _set_priority  # noqa: E402
from merkonvectordb_spark.verification import build_priority_block as _bpb  # noqa: E402

_set_priority(_bpb(list(_registry._QUERIES)))
