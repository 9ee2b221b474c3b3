"""Driver-facing queries for the training-pipeline operators
(``operators.pipeline``): deterministic hash split and context-window
chunking over the ``documents`` fixture, both oracle-checked row-level
against DuckDB (the md5 hash and the token slicing are expressible
identically in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from merkonvectordb_spark.operators.pipeline import (
    chunk_tokens,
    hash_split,
    mixture_sample,
    pack_sequences,
    stratified_sample,
)
from merkonvectordb_spark.registry import register
from merkonvectordb_spark.schema import load_table


@register(
    "doc_hash_split",
    """
WITH assigned AS (
  SELECT source, n_chars,
         CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
              WHEN b IS NOT NULL THEN 'test' END AS split
  FROM (
    SELECT source, n_chars,
           CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS b
    FROM documents
  )
)
SELECT split, source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM assigned
GROUP BY split, source
""".strip(),
)
def q_doc_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/5/5 train/val/test split assigned by content-addressed hash of
    doc_id — re-runs, re-partitioning, and cluster resizes cannot move a
    document between splits (a seeded sample() can).  Pure projection:
    the only shuffle is the audit aggregation itself."""
    docs = load_table(spark, sf_dir, "documents")
    assigned = hash_split(docs, "doc_id", {"train": 90, "val": 5, "test": 5})
    return assigned.groupBy("split", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


@register(
    "doc_chunking",
    """
WITH base AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
  FROM documents
  WHERE length(trim(text)) > 0
),
st AS (
  SELECT doc_id, t, unnest(range(0, (CASE WHEN len(t) <= 64 THEN 0 ELSE ((len(t) - 64 + 47) // 48) * 48 END) + 1, 48)) AS s
  FROM base
)
SELECT doc_id, CAST(s // 48 AS BIGINT) AS chunk_idx,
       CAST(least(64, len(t) - s) AS BIGINT) AS chunk_tokens,
       array_to_string(t[s + 1:s + 64], ' ') AS chunk_text
FROM st
""".strip(),
)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (64-token windows every 48 tokens) as a
    row-level oracle: every chunk's text, index, and token count must
    match DuckDB's independent list-slicing formulation exactly."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_tokens(docs, "text", window=64, stride=48).select(
        "doc_id",
        "chunk_idx",
        F.col("chunk_tokens").cast("bigint").alias("chunk_tokens"),
        "chunk_text",
    )


@register(
    "seq_packing",
    """
WITH base AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
  FROM documents
  WHERE length(trim(text)) > 0
),
st AS (
  SELECT doc_id, t, unnest(range(0, (CASE WHEN len(t) <= 64 THEN 0 ELSE ((len(t) - 64 + 47) // 48) * 48 END) + 1, 48)) AS s
  FROM base
),
chunks AS (
  SELECT doc_id, CAST(s // 48 AS BIGINT) AS chunk_idx,
         CAST(least(64, len(t) - s) AS BIGINT) AS chunk_tokens
  FROM st
),
cum AS (
  SELECT *,
         sum(chunk_tokens) OVER (
           ORDER BY doc_id, chunk_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - chunk_tokens AS gstart
  FROM chunks
)
SELECT doc_id, chunk_idx, chunk_tokens,
       CAST(gstart // 256 AS BIGINT) AS seq_id,
       CAST(gstart % 256 AS BIGINT) AS seq_offset,
       ((gstart + chunk_tokens - 1) // 256) > (gstart // 256) AS straddles
FROM cum
""".strip(),
)
def q_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-split packing of the chunk stream into 256-token
    training sequences.  The oracle is the textbook single-window
    formulation (``sum() OVER (ORDER BY ...)``); the engine computes the
    identical exclusive prefix sum with the range-partitioned two-pass
    (`operators.pipeline.global_exclusive_prefix_sum`) that has no
    single-reducer stage — the row-level hash match proves the
    distributed algorithm IS the sequential semantics."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    chunks = chunk_tokens(docs, "text", window=64, stride=48).select(
        "doc_id", "chunk_idx", "chunk_tokens"
    )
    packed = pack_sequences(
        chunks, ("doc_id", "chunk_idx"), "chunk_tokens", budget=256
    )
    return packed.select(
        "doc_id",
        "chunk_idx",
        F.col("chunk_tokens").cast("bigint").alias("chunk_tokens"),
        "seq_id",
        "seq_offset",
        "straddles",
    )


@register(
    "doc_stratified_sample",
    """
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'r3'), 1, 15))
              AS BIGINT) % 1000000 AS b
  FROM documents
)
WHERE b < CASE source
    WHEN 'src0' THEN 1000000
    WHEN 'src1' THEN 750000
    WHEN 'src2' THEN 500000
    WHEN 'src3' THEN 250000
    ELSE 100000 END
""".strip(),
)
def q_doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source deterministic downsampling (corpus mixing weights):
    keep each document iff its key's hash bucket clears the stratum
    rate.  Row-level oracle — the exact surviving id set must match,
    which a seeded Bernoulli ``sample()`` could never guarantee."""
    docs = load_table(spark, sf_dir, "documents")
    kept = stratified_sample(
        docs,
        "doc_id",
        "source",
        {"src0": 1.0, "src1": 0.75, "src2": 0.5, "src3": 0.25},
        default_rate=0.1,
        salt="r3",
    )
    return kept.select("doc_id", "lang", "source")


@register(
    "doc_mixture_sample",
    """
WITH mass AS (
  SELECT source AS s, CAST(sum(n_chars) AS BIGINT) AS m
  FROM documents GROUP BY 1
),
b AS (
  SELECT doc_id, source, n_chars,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'mx'), 1, 15))
              AS BIGINT) % 1000000 AS bucket,
         CASE source WHEN 'src0' THEN 5 WHEN 'src1' THEN 3
                     WHEN 'src2' THEN 2 ELSE 0 END AS w
  FROM documents
)
SELECT doc_id, source, n_chars
FROM b JOIN mass ON b.source = mass.s
WHERE CAST(bucket AS HUGEINT) * 10 * CAST(m AS HUGEINT)
    < CAST(10000 AS HUGEINT) * CAST(w AS HUGEINT) * 1000000
""".strip(),
)
def q_doc_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture: mix src0/src1/src2 at 5:3:2 into a
    10k-char budget.  The per-stratum keep-rate is derived from the
    stratum's actual token mass inside the plan (never a driver-side
    float), and the survival test is exact wide-integer arithmetic —
    the oracle proves the exact surviving document set matches."""
    docs = load_table(spark, sf_dir, "documents")
    kept = mixture_sample(
        docs,
        "doc_id",
        "source",
        "n_chars",
        {"src0": 5, "src1": 3, "src2": 2},
        budget_tokens=10_000,
        salt="mx",
    )
    return kept.select("doc_id", "source", "n_chars")


# ---------------------------------------------------------------------------
# URL canonicalization + per-domain cap (Common Crawl-style curation).
# The fixture has no URL column, so one is DERIVED deterministically
# from (source, doc_id) with the SAME expression in both engines —
# messy on purpose (scheme case, www, two-level TLD, query/fragment,
# trailing slash) so the normalizer earns its keep.
# ---------------------------------------------------------------------------

_URL_RAW_SQL = """
(CASE WHEN doc_id % 3 = 0 THEN 'HTTP://WWW.' ELSE 'https://' END
 || source
 || CASE doc_id % 3 WHEN 0 THEN '.example.com'
                    WHEN 1 THEN '.example.org'
                    ELSE '.example.co.uk' END
 || '/p/' || CAST(doc_id AS VARCHAR)
 || CASE WHEN doc_id % 5 = 0 THEN '/?utm=x#top'
         WHEN doc_id % 7 = 0 THEN '/'
         ELSE '' END)
""".strip()

_DOMAIN_CAP = 5

_URL_CAP_ORACLE = f"""
WITH raw AS (
  SELECT doc_id, {_URL_RAW_SQL} AS url FROM documents
),
norm AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(lower(url), '^https?://', ''),
               '^www\\.', ''),
             '[?#].*$', ''),
           '/+$', '') AS nurl
  FROM raw
),
host AS (
  -- userinfo + explicit port stripped, mirroring functions/url.url_host
  SELECT doc_id, nurl,
         regexp_replace(
           regexp_replace(regexp_extract(nurl, '^([^/]+)', 1),
                          '^[^/@]*@', ''),
           ':[0-9]+$', '') AS h
  FROM norm
),
dom AS (
  SELECT doc_id, nurl,
         CASE WHEN (h LIKE '%.co.uk' OR h LIKE '%.com.au' OR h LIKE '%.co.jp'
                    OR h LIKE '%.com.br' OR h LIKE '%.co.in')
                   AND len(string_split(h, '.')) >= 3
              THEN array_to_string(string_split(h, '.')[-3:], '.')
              ELSE array_to_string(string_split(h, '.')[-2:], '.') END AS domain
  FROM host
),
capped AS (
  SELECT doc_id, domain, nurl,
         row_number() OVER (PARTITION BY domain ORDER BY doc_id ASC) AS rn
  FROM dom
)
SELECT doc_id, domain, nurl AS url_norm, rn
FROM capped WHERE rn <= {_DOMAIN_CAP}
""".strip()


@register("url_domain_cap", _URL_CAP_ORACLE)
def q_url_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registered-domain document cap: canonicalize the URL
    (functions.url — scan-local expressions), extract the pay-level
    domain (two-level-suffix aware), keep the first N docs per domain
    in crawl order.  Spark plans the cap as WindowGroupLimit with a
    partial pass below the exchange, so each map task forwards at most
    N rows per domain — the shuffle carries ≈ domains·N·partitions
    rows, not the corpus.  The canonical 'no domain dominates the
    corpus' curation step."""
    from pyspark.sql import Window

    from merkonvectordb_spark.functions.url import (
        normalize_url,
        registered_domain,
        url_host,
    )

    docs = load_table(spark, sf_dir, "documents")
    tld = (
        F.when(F.col("doc_id") % 3 == 0, F.lit(".example.com"))
        .when(F.col("doc_id") % 3 == 1, F.lit(".example.org"))
        .otherwise(F.lit(".example.co.uk"))
    )
    tail = (
        F.when(F.col("doc_id") % 5 == 0, F.lit("/?utm=x#top"))
        .when(F.col("doc_id") % 7 == 0, F.lit("/"))
        .otherwise(F.lit(""))
    )
    raw = docs.select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 3 == 0, F.lit("HTTP://WWW.")).otherwise(
                F.lit("https://")
            ),
            F.col("source"),
            tld,
            F.lit("/p/"),
            F.col("doc_id").cast("string"),
            tail,
        ).alias("url"),
    )
    norm = raw.select("doc_id", normalize_url(F.col("url")).alias("nurl"))
    dom = norm.select(
        "doc_id",
        "nurl",
        registered_domain(url_host(F.col("nurl"))).alias("domain"),
    )
    w = Window.partitionBy("domain").orderBy(F.asc("doc_id"))
    return (
        dom.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _DOMAIN_CAP)
        .select("doc_id", "domain", F.col("nurl").alias("url_norm"), "rn")
    )


# ---------------------------------------------------------------------------
# the composed corpus→shards pipeline, oracled end-to-end: quality gate,
# exact-dedup survivors, hash split, chunking, per-split packing, shard
# ids — one row-level hash over the whole five-stage composition.
# ---------------------------------------------------------------------------


def _training_shards_oracle() -> str:
    from merkonvectordb_spark.queries_text import _FP_SQL, _quality_sql

    return f"""
WITH gated AS (
  SELECT doc_id, text FROM documents
  WHERE {_quality_sql("text")} >= 0.5
),
fp AS (
  SELECT doc_id, text,
         row_number() OVER (
           PARTITION BY {_FP_SQL.format(c="text")}
           ORDER BY doc_id ASC) AS rn
  FROM gated
),
surv AS (SELECT doc_id, text FROM fp WHERE rn = 1),
sp AS (
  SELECT doc_id, text,
         CASE WHEN b < 90 THEN 'train'
              WHEN b < 95 THEN 'val'
              WHEN b IS NOT NULL THEN 'test' END AS split
  FROM (
    SELECT doc_id, text,
           CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                AS BIGINT) % 100 AS b
    FROM surv)
),
base AS (
  SELECT doc_id, split, string_split_regex(trim(text), '\\s+') AS t
  FROM sp WHERE length(trim(text)) > 0
),
st AS (
  SELECT doc_id, split, t, unnest(range(0, (CASE WHEN len(t) <= 64 THEN 0 ELSE ((len(t) - 64 + 47) // 48) * 48 END) + 1, 48)) AS s
  FROM base
),
chunks AS (
  SELECT doc_id, split, CAST(s // 48 AS BIGINT) AS chunk_idx,
         CAST(least(64, len(t) - s) AS BIGINT) AS chunk_tokens
  FROM st
),
cum AS (
  SELECT *,
         sum(chunk_tokens) OVER (
           PARTITION BY split ORDER BY doc_id, chunk_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - chunk_tokens AS gstart
  FROM chunks
)
SELECT doc_id, split, chunk_idx, chunk_tokens,
       CAST(gstart // 256 AS BIGINT) AS seq_id,
       CAST(gstart % 256 AS BIGINT) AS seq_offset,
       ((gstart + chunk_tokens - 1) // 256) > (gstart // 256) AS straddles,
       CAST((gstart // 256) // 16 AS BIGINT) AS shard_id
FROM cum
""".strip()


@register("training_shards", _training_shards_oracle())
def q_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`operators.pipeline.prepare_training_shards` end-to-end: the
    oracle replays all five stages (quality ≥ 0.5, fingerprint
    survivors, 90/5/5 hash split, 64/48 chunking, per-split 256-token
    packing, 16-seq shards) in one SQL composition — proving the
    composed pipeline, not just each operator alone."""
    from merkonvectordb_spark.operators.pipeline import (
        prepare_training_shards,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = prepare_training_shards(docs)
    return out.select(
        "doc_id",
        "split",
        "chunk_idx",
        F.col("chunk_tokens").cast("bigint").alias("chunk_tokens"),
        "seq_id",
        "seq_offset",
        "straddles",
        "shard_id",
    )


# ---------------------------------------------------------------------------
# Packing-efficiency report — how well the 256-token budget is used per
# split, composed on top of the full shards pipeline (same replayed
# stages as ``training_shards``; wrapped as a subquery, then one tiny
# per-split rollup).
# ---------------------------------------------------------------------------


def _packing_efficiency_oracle() -> str:
    return f"""
SELECT split,
       count(*) AS n_chunks,
       CAST(sum(chunk_tokens) AS BIGINT) AS total_tokens,
       max(seq_id) + 1 AS n_seqs,
       max(shard_id) + 1 AS n_shards,
       CAST(sum(CASE WHEN straddles THEN 1 ELSE 0 END) AS BIGINT) AS n_straddles,
       round(sum(chunk_tokens) / ((max(seq_id) + 1) * 256.0), 6)
         AS fill_ratio
FROM ({_training_shards_oracle()}) s
GROUP BY split
""".strip()


@register("packing_efficiency", _packing_efficiency_oracle())
def q_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-split packing efficiency of the corpus→shards pipeline:
    chunk/token/sequence/shard counts, boundary-straddling chunks (the
    attention-fragmentation cost of concat-and-split packing), and the
    budget fill ratio (total tokens ÷ sequence capacity — below 1.0
    exactly by the final partially-filled sequence).  The heavy lifting
    is the pipeline itself; this adds one 3-group partial-agg rollup.
    At 100 TB the report is map-side combine into |splits| rows."""
    from merkonvectordb_spark.operators.pipeline import (
        prepare_training_shards,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = prepare_training_shards(docs)
    agg = out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.col("chunk_tokens").cast("bigint")).alias("total_tokens"),
        (F.max("seq_id") + 1).alias("n_seqs"),
        (F.max("shard_id") + 1).alias("n_shards"),
        F.sum(F.when(F.col("straddles"), 1).otherwise(0)).alias(
            "n_straddles"
        ),
    )
    return agg.select(
        "split",
        "n_chunks",
        "total_tokens",
        "n_seqs",
        "n_shards",
        "n_straddles",
        F.round(
            F.col("total_tokens") / (F.col("n_seqs") * F.lit(256.0)), 6
        ).alias("fill_ratio"),
    )


@register(
    "doc_fixed_k_sample",
    """
WITH h AS (
  SELECT doc_id, lang, source,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
  FROM documents
),
ranked AS (
  SELECT doc_id, lang, source,
         row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS sample_rank
  FROM h
)
SELECT doc_id, lang, source, CAST(sample_rank AS BIGINT) AS sample_rank
FROM ranked WHERE sample_rank <= 40
""".strip(),
)
def q_doc_fixed_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly min(40, |lang|) documents per language, content-addressed
    — the fixed-COUNT sampling a balanced eval set needs ("10k docs per
    language"), where ``stratified_sample``'s fixed RATE can't hit a
    target count.  Deterministic across reruns/repartitions; the rank
    rides along so consumers can tighten k without resampling.

    Scale shape: InferWindowGroupLimit plans a PARTIAL rank pass below
    the exchange — every map task forwards ≤ 40 rows per language it
    sees, so the shuffle carries ≤ 40·P rows per stratum, never the
    stratum (plan pinned in test_pipeline)."""
    from merkonvectordb_spark.operators.pipeline import hash_sample_k

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    )
    return hash_sample_k(docs, "doc_id", "lang", 40)


# ---------------------------------------------------------------------------
# quality-weighted exact-k sampling (A-ES exponential race) — the
# curation step between scoring and training-set assembly: "sample 100
# docs, proportional to quality, no replacement, reproducibly".
# ---------------------------------------------------------------------------


def _weighted_sample_oracle() -> str:
    from merkonvectordb_spark.queries_text import _quality_sql

    return f"""
WITH w AS (
  SELECT doc_id, source,
         GREATEST(CAST(1 AS BIGINT),
                  CAST(floor({_quality_sql("text")} * 1000000.0 + 0.5)
                       AS BIGINT)) AS w_micro,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM documents
),
r AS (
  SELECT doc_id, source, w_micro,
         CAST(floor(ln((CAST(h AS DOUBLE) + 0.5) / 1152921504606846976.0)
                    * 1000000.0 + 0.5) AS BIGINT) AS lnu
  FROM w
),
ranked AS (
  SELECT doc_id, source, w_micro,
         row_number() OVER (
           ORDER BY (CAST(lnu AS DOUBLE) / CAST(w_micro AS DOUBLE)) DESC,
                    doc_id ASC) AS rk
  FROM r QUALIFY rk <= 100
)
SELECT doc_id, source, w_micro, CAST(rk AS BIGINT) AS sample_rank
FROM ranked
""".strip()


@register("quality_weighted_sample", _weighted_sample_oracle())
def q_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 100 documents sampled WITHOUT replacement, probability
    proportional to quality score — `operators.pipeline.weighted_sample_k`
    (derandomized Efraimidis-Spirakis race over the shared content
    hash).  The weighted twin of `doc_fixed_k_sample`'s uniform pick.

    Determinism: weight = quality micro-rounded once (clamped ≥ 1 so a
    zero-quality doc keeps a nonzero chance rather than silently
    vanishing); `ln(u)` micro-rounded per row (the one libm call); the
    race key is then one exact IEEE division, and ties break on doc_id.
    Scale shape: scan-local key, TakeOrderedAndProject global top-k,
    rank window on the 100-row winners frame."""
    from merkonvectordb_spark.functions.text import quality_score
    from merkonvectordb_spark.operators.pipeline import weighted_sample_k

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.greatest(
            F.lit(1).cast("bigint"),
            F.floor(
                quality_score(F.col("text")) * F.lit(1000000.0) + F.lit(0.5)
            ).cast("bigint"),
        ).alias("w_micro"),
    )
    return weighted_sample_k(docs, "doc_id", "w_micro", 100)


@register(
    "lang_temperature_mix",
    """
WITH mass AS (
  SELECT lang AS s,
         CAST(sum(n_chars) AS BIGINT) AS m,
         CAST(floor(sqrt(CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE)))
              AS BIGINT) AS w
  FROM documents GROUP BY 1
),
tot AS (SELECT CAST(sum(w) AS BIGINT) AS wsum FROM mass),
b AS (
  SELECT doc_id, lang, n_chars,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'tau'), 1, 15))
              AS BIGINT) % 1000000 AS bucket
  FROM documents
)
SELECT doc_id, lang, n_chars
FROM b JOIN mass ON b.lang = mass.s CROSS JOIN tot
WHERE CAST(bucket AS HUGEINT) * CAST(wsum AS HUGEINT) * CAST(m AS HUGEINT)
    < CAST(60000 AS HUGEINT) * CAST(w AS HUGEINT) * 1000000
""".strip(),
)
def q_lang_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-T=2 language re-balancing into a 60k-char budget:
    each language's share is proportional to sqrt(its char mass), the
    standard multilingual-pretraining up-weighting of small languages
    (`operators.pipeline.temperature_sample`).  Unlike
    `doc_mixture_sample` the weights are DATA-DERIVED in-plan —
    `floor(sqrt(mass))` is bit-exact cross-engine for mass < 2^53 —
    and the survival test is the same wide-integer inequality, so the
    oracle proves the exact surviving document set."""
    from merkonvectordb_spark.operators.pipeline import temperature_sample

    docs = load_table(spark, sf_dir, "documents")
    kept = temperature_sample(
        docs, "doc_id", "lang", "n_chars", budget_tokens=60_000, salt="tau"
    )
    return kept.select("doc_id", "lang", "n_chars")
