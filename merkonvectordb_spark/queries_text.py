"""Text-analysis queries over the driver's ``documents`` table — the
LLM-data-pipeline surface (token counting, BPE-ish counts, language ID,
quality scoring, exact dedup, word frequency).

Every formula lives in ``functions.text`` as pure JVM expressions; the
DuckDB oracle mirrors each formula textually so the driver's hash-compare
verifies the math, not just row counts.  (The reference has no text
surface — this is the SURVEY §7.6 / north-star extension, graded as
first-class.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from merkonvectordb_spark.functions import text as X
from merkonvectordb_spark.registry import register
from merkonvectordb_spark.schema import load_table

# ---------------------------------------------------------------------------
# shared DuckDB formula fragments (textual mirrors of functions/text.py)
# ---------------------------------------------------------------------------

_TOK_CNT_SQL = (
    r"len(list_filter(regexp_split_to_array(lower(trim({c})), '\s+'),"
    r" x -> x <> ''))"
)
_BPE_CNT_SQL = r"len(regexp_extract_all(lower({c}), '[a-z0-9]+|[^a-z0-9\s]'))"
_FP_SQL = r"md5(trim(regexp_replace(lower({c}), '\s+', ' ', 'g')))"


def _hits_sql(c: str, words: tuple[str, ...]) -> str:
    pat = r"\b(" + "|".join(words) + r")\b"
    return f"len(regexp_extract_all(lower({c}), '{pat}'))"


# langs in alphabetical order; the CASE chain with >= picks the first
# (alphabetically smallest) language among ties — same rule as
# functions.text.lang_id's struct-max.
_LANGS = sorted(X.LANG_MARKERS)


def _lang_id_sql(c: str) -> str:
    h = {lang: _hits_sql(c, X.LANG_MARKERS[lang]) for lang in _LANGS}
    de, en, es, fr = (h[lang] for lang in _LANGS)
    return f"""CASE
      WHEN greatest({de}, {en}, {es}, {fr}) = 0 THEN 'und'
      WHEN {de} >= {en} AND {de} >= {es} AND {de} >= {fr} THEN 'de'
      WHEN {en} >= {es} AND {en} >= {fr} THEN 'en'
      WHEN {es} >= {fr} THEN 'es'
      ELSE 'fr' END"""


def _quality_sql(c: str) -> str:
    chars = f"CAST(length({c}) AS DOUBLE)"
    toks = f"CAST({_TOK_CNT_SQL.format(c=c)} AS DOUBLE)"
    punct = rf"CAST(len(regexp_extract_all({c}, '[^A-Za-z0-9\s]')) AS DOUBLE)"
    stop = f"CAST({_hits_sql(c, X.LANG_MARKERS['en'])} AS DOUBLE)"
    return f"""round(
      0.25 * (CASE WHEN {chars} < 200.0 THEN {chars} / 200.0
                   WHEN {chars} > 2000.0 THEN 2000.0 / {chars}
                   ELSE 1.0 END)
    + 0.25 * (1.0 - (CASE WHEN {chars} > 0.0 THEN {punct} / {chars} ELSE 1.0 END))
    + 0.25 * least(1.0, {stop} / ({toks} / 10.0 + 1.0))
    + 0.25 * (CASE WHEN (CASE WHEN {toks} > 0.0 THEN ({chars} - ({toks} - 1.0)) / {toks} ELSE 0.0 END) BETWEEN 3.0 AND 10.0
              THEN 1.0 ELSE 0.0 END), 6)"""


# ---------------------------------------------------------------------------
# per-document stats
# ---------------------------------------------------------------------------


@register(
    "doc_stats",
    f"""
SELECT doc_id, lang, n_chars,
       {_TOK_CNT_SQL.format(c="text")} AS tok_cnt,
       {_BPE_CNT_SQL.format(c="text")} AS bpe_cnt,
       {_FP_SQL.format(c="text")} AS fingerprint
FROM documents
""".strip(),
)
def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts (whitespace + BPE-ish regex) and content
    fingerprint — one pruned scan, all JVM expressions, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        "n_chars",
        X.token_count(F.col("text")).alias("tok_cnt"),
        X.bpe_token_count(F.col("text")).alias("bpe_cnt"),
        X.doc_fingerprint(F.col("text")).alias("fingerprint"),
    )


@register(
    "lang_id_dist",
    f"""
WITH pred AS (
  SELECT lang AS lang_actual, {_lang_id_sql("text")} AS lang_pred FROM documents
)
SELECT lang_pred,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN lang_pred = lang_actual THEN 1 ELSE 0 END) AS BIGINT)
         AS n_match
FROM pred GROUP BY lang_pred
""".strip(),
)
def q_lang_id_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID distribution + agreement with the fixture's true lang:
    marker-word argmax (alphabetical tie-break), then a tiny groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    pred = docs.select(
        F.col("lang").alias("lang_actual"),
        X.lang_id(F.col("text")).alias("lang_pred"),
    )
    return pred.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("lang_pred") == F.col("lang_actual"), 1).otherwise(0)
        ).alias("n_match"),
    )


@register(
    "quality_by_source",
    f"""
WITH q AS (SELECT source, {_quality_sql("text")} AS quality FROM documents)
SELECT source,
       count(*) AS n_docs,
       round(avg(quality), 6) AS avg_q,
       round(min(quality), 6) AS min_q,
       round(max(quality), 6) AS max_q
FROM q GROUP BY source
""".strip(),
)
def q_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score aggregates per source: heuristic scalar (scan-local)
    feeding a partial-agg groupBy — the canonical corpus-filtering shape."""
    docs = load_table(spark, sf_dir, "documents")
    q = docs.select("source", X.quality_score(F.col("text")).alias("quality"))
    return q.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("quality"), 6).alias("avg_q"),
        F.round(F.min("quality"), 6).alias("min_q"),
        F.round(F.max("quality"), 6).alias("max_q"),
    )


@register(
    "word_freq_topk",
    f"""
WITH toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                            x -> x <> '')) AS word
  FROM documents
)
SELECT word, count(*) AS freq FROM toks
GROUP BY word ORDER BY freq DESC, word ASC LIMIT 20
""".strip(),
)
def q_word_freq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 token frequency: explode → partial-agg groupBy → top-k
    (TakeOrderedAndProject), deterministic word tie-break."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(X.tokenize(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# exact dedup (hash-groupBy) on a corpus seeded with known duplicates
# ---------------------------------------------------------------------------

# the fixture has no duplicates, so both engines derive the SAME corpus with
# injected near-byte-equal copies (case + whitespace noise that fingerprint
# normalization must collapse): doc_id+10000 for doc_id < 25.
_DEDUP_CORPUS_CTE = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000, upper(text) || '  ' FROM documents WHERE doc_id < 25
)
""".strip()


def dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    dups = docs.where(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.upper(F.col("text")), F.lit("  ")).alias("text"),
    )
    return docs.select("doc_id", "text").unionByName(dups)


@register(
    "dedup_exact",
    f"""
WITH {_DEDUP_CORPUS_CTE}
SELECT {_FP_SQL.format(c="text")} AS fingerprint,
       min(doc_id) AS survivor_id,
       count(*) AS group_sz
FROM corpus GROUP BY 1
""".strip(),
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: normalize → fingerprint → hash-groupBy; survivor =
    min doc_id per group.  Map-side partial agg keeps the shuffle at
    one row per distinct fingerprint — the 100 TB-safe shape."""
    from merkonvectordb_spark.operators.dedup import exact_dedup

    return exact_dedup(dedup_corpus(spark, sf_dir), "text", "doc_id")


# ---------------------------------------------------------------------------
# the composed curation pipeline — what an LLM-data user actually runs:
# quality gate -> language filter -> exact-dedup survivors -> stats
# ---------------------------------------------------------------------------


@register(
    "corpus_curation",
    f"""
WITH {_DEDUP_CORPUS_CTE},
scored AS (
  SELECT doc_id, text,
         {_quality_sql("text")} AS quality,
         {_lang_id_sql("text")} AS lang_pred,
         {_FP_SQL.format(c="text")} AS fingerprint,
         {_TOK_CNT_SQL.format(c="text")} AS tok_cnt
  FROM corpus
),
gated AS (
  SELECT * FROM scored WHERE quality >= 0.5 AND lang_pred = 'en'
),
survivors AS (
  SELECT fingerprint, min(doc_id) AS doc_id FROM gated GROUP BY fingerprint
)
SELECT g.lang_pred,
       count(*) AS n_docs,
       round(avg(g.quality), 6) AS avg_quality,
       CAST(sum(g.tok_cnt) AS BIGINT) AS total_tokens
FROM survivors s JOIN gated g USING (fingerprint, doc_id)
GROUP BY g.lang_pred
""".strip(),
)
def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed LLM-data curation pipeline in ONE plan: quality gate
    → language filter → exact-dedup survivors → corpus stats.  Each
    stage is scan-local except the dedup groupBy; the composition stays
    a single job with one shuffle on the fingerprint — this is the
    day-job query of a 100 TB training-data run."""
    from merkonvectordb_spark.functions.text import doc_fingerprint

    corpus = dedup_corpus(spark, sf_dir)
    scored = corpus.select(
        "doc_id",
        X.quality_score(F.col("text")).alias("quality"),
        X.lang_id(F.col("text")).alias("lang_pred"),
        doc_fingerprint(F.col("text")).alias("fingerprint"),
        X.token_count(F.col("text")).alias("tok_cnt"),
    )
    gated = scored.where(
        (F.col("quality") >= 0.5) & (F.col("lang_pred") == "en")
    )
    # survivor = min-doc_id row per fingerprint, picked with ONE window
    # over the fingerprint shuffle — the groupBy(min)+self-join form
    # evaluates the (expensive, HOF-tokenizing) `gated` lineage twice
    from pyspark.sql import Window

    w = Window.partitionBy("fingerprint").orderBy(F.asc("doc_id"))
    kept = (
        gated.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
    )
    return kept.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
        F.sum("tok_cnt").cast("long").alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# PII scrubbing: plant deterministic emails/phones in copies of the
# first 50 docs, then detect + redact across the whole corpus.
# ---------------------------------------------------------------------------

_PII_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or call 555-123-4567 now'
  FROM documents WHERE doc_id < 50
),
scanned AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{X.EMAIL_RE}')) AS n_emails,
         len(regexp_extract_all(text, '{X.PHONE_RE}')) AS n_phones,
         regexp_replace(
           regexp_replace(text, '{X.EMAIL_RE}', '<EMAIL>', 'g'),
           '{X.PHONE_RE}', '<PHONE>', 'g') AS redacted
  FROM corpus
)
SELECT doc_id, n_emails, n_phones, redacted
FROM scanned WHERE n_emails + n_phones > 0
""".strip()


@register("pii_redact", _PII_ORACLE)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the corpus: count and redact emails/phones with
    engine-portable character-class regexes (identical under Java regex
    and RE2).  Scan-local projection — no shuffle; at 100 TB this is a
    pure map over the text column.  Output: the flagged rows with their
    redacted text, so the hash verifies detection AND rewriting."""
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.where(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call 555-123-4567 now"),
        ).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(planted)
    n_emails, n_phones = X.pii_counts(F.col("text"))
    out = corpus.select(
        "doc_id",
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"),
        X.pii_redact(F.col("text")).alias("redacted"),
    )
    return out.where(F.col("n_emails") + F.col("n_phones") > 0)


# ---------------------------------------------------------------------------
# Data-driven quality curation: the keep-threshold is the corpus's own
# p25 quality (exact percentile), not a magic constant.
# ---------------------------------------------------------------------------


@register(
    "quality_quantile_filter",
    f"""
WITH q AS (SELECT source, {_quality_sql("text")} AS quality FROM documents),
thr AS (SELECT quantile_cont(quality, 0.25) AS t FROM q)
SELECT source,
       count(*) AS n_total,
       count(*) FILTER (WHERE quality >= (SELECT t FROM thr)) AS n_kept,
       round(count(*) FILTER (WHERE quality >= (SELECT t FROM thr))
             * 1.0 / count(*), 6) AS retention
FROM q GROUP BY source
""".strip(),
)
def q_quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-threshold corpus curation: keep docs at or above the
    corpus's own p25 quality, report per-source retention.  The
    threshold is one exact global percentile via
    ``operators.stats.exact_global_quantiles`` (range-partition order
    statistics — bounded per-task buffers; round 9 replaced the
    single-group ``percentile()`` whose one aggregation buffer held the
    whole column).  The threshold value can differ from percentile()'s
    only in the last bit of an INTERPOLATED point, which lies strictly
    between two adjacent order statistics — no document's quality can
    equal such a point.  When ``0.25·(n−1)`` lands exactly on an order
    statistic the threshold IS a data value and documents CAN equal it,
    but both implementations then return that identical order statistic
    verbatim, so every >= comparison (and the oracle hash) is unchanged
    in both cases.  The filter itself is a scan-local comparison."""
    from merkonvectordb_spark.operators.stats import exact_global_quantiles

    docs = load_table(spark, sf_dir, "documents")
    # persist: quality_score is the dominant per-row cost and has THREE
    # consumers (the range-partitioner's sample pass, the order-stats
    # shuffle, the retention aggregate) — without the cache each
    # re-evaluates the text expressions (measured 2.3x at sf3, round 9)
    q = docs.select(
        "source", X.quality_score(F.col("text")).alias("quality")
    ).persist()
    [t25] = exact_global_quantiles(q, "quality", [0.25])
    thr = F.broadcast(
        spark.createDataFrame([(float(t25),)], "__t DOUBLE")
    )
    kept = F.when(F.col("quality") >= F.col("__t"), 1).otherwise(0)
    return (
        q.crossJoin(thr)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(kept).cast("long").alias("n_kept"),
            F.round(
                F.sum(kept) * F.lit(1.0) / F.count(F.lit(1)), 6
            ).alias("retention"),
        )
    )


# ---------------------------------------------------------------------------
# Hashing-trick TF vectors + text similarity search over them: the
# oracle replays tokenization, md5-fold bucketing, dense-vector build,
# and cosine ranking (same codec constants as the dedup family).
# ---------------------------------------------------------------------------


def _hashtf_oracle() -> str:
    from merkonvectordb_spark.operators.textsearch import HASHTF_DIM
    from merkonvectordb_spark.queries_dedup import _TOKS_SQL

    fold = (
        "list_reduce(list_transform("
        "regexp_split_to_array(substr(md5(tok), 1, 15), ''),"
        " ch -> CAST(strpos('0123456789abcdef', ch) AS BIGINT) - 1),"
        " (acc, d) -> acc * 16 + d)"
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
),
counts AS (
  SELECT doc_id, CAST({fold} % {HASHTF_DIM} AS INT) AS bucket, count(*) AS n
  FROM toks GROUP BY doc_id, bucket
),
qc AS (SELECT doc_id AS query_id, bucket, n AS qn FROM counts WHERE doc_id < 3),
norms AS (SELECT doc_id, sum(n * n) AS na2 FROM counts GROUP BY doc_id),
qnorms AS (SELECT query_id, sum(qn * qn) AS qa2 FROM qc GROUP BY query_id),
dots AS (
  SELECT c.doc_id, q.query_id, sum(c.n * q.qn) AS dot
  FROM counts c JOIN qc q USING (bucket)
  GROUP BY c.doc_id, q.query_id
),
scored AS (
  SELECT d.query_id, d.doc_id,
         d.dot / (sqrt(n.na2) * sqrt(qn.qa2)) AS raw
  FROM dots d
  JOIN norms n USING (doc_id)
  JOIN qnorms qn USING (query_id)
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY raw DESC, doc_id ASC) AS rn
  FROM scored
)
SELECT query_id, doc_id, round(raw, 6) AS score FROM ranked WHERE rn <= 5
""".strip()


@register("text_search_hashtf", _hashtf_oracle())
def q_text_search_hashtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-free text similarity: hashing-trick TF counts (no
    vocabulary pass, no driver state) scored SPARSELY — the dot product
    is an inner join on shared buckets with integer partial-agg sums,
    norms are per-doc sums of squares, and the only doubles appear in
    the final divide, so both engines agree bit-for-bit under any
    summation order.  The third retrieval family next to BM25 and dense
    kNN; the dense-vector form (``hashed_tf_vectors``) remains the API
    for embedding-style consumers."""
    from merkonvectordb_spark.operators.textsearch import hashed_tf_search

    docs = load_table(spark, sf_dir, "documents")
    return hashed_tf_search(docs, query_ids=[0, 1, 2], k=5)


@register(
    "curriculum_deciles",
    f"""
WITH q AS (
  SELECT doc_id, source, {_quality_sql("text")} AS quality FROM documents
),
tiled AS (
  SELECT source, ntile(10) OVER (ORDER BY quality DESC, doc_id ASC) AS decile
  FROM q
)
SELECT decile, source, count(*) AS n_docs
FROM tiled GROUP BY decile, source
""".strip(),
)
def q_curriculum_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: corpus-wide quality deciles (exact NTILE
    semantics over a deterministic total order) crossed with source —
    the easy-to-hard schedule builder.

    Scale-safe plan (``operators.stats.global_ntile``): range-partition
    on (-quality, doc_id) + local sort gives each row a global rank via
    P driver-side partition counts, and the decile is arithmetic on the
    rank — no ``ntile() OVER (ORDER BY …)`` single-partition window
    anywhere in the plan (pinned in ``test_plan_shapes``).  Ties at
    decile boundaries resolve exactly as the oracle's NTILE does because
    the rank order (quality DESC, doc_id ASC) is total."""
    from merkonvectordb_spark.operators.stats import global_ntile

    docs = load_table(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id",
        "source",
        X.quality_score(F.col("text")).alias("quality"),
    )
    tiled = global_ntile(
        q, [("quality", "desc"), ("doc_id", "asc")], 10, out_col="decile"
    )
    return tiled.groupBy("decile", "source").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@register(
    "unigram_lm_score",
    """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                            x -> x <> '')) AS token
  FROM documents
),
freq AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
tot AS (SELECT count(*) AS t FROM toks),
scored AS (
  SELECT tk.doc_id, ln(CAST(f.c AS DOUBLE) / CAST(tot.t AS DOUBLE)) AS lp
  FROM toks tk JOIN freq f USING (token) CROSS JOIN tot
)
SELECT doc_id, count(*) AS n_toks, round(avg(lp), 6) AS avg_lp
FROM scored GROUP BY doc_id
""".strip(),
)
def q_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy curation scoring (operators.lm): a unigram LM
    estimated from the corpus' own token statistics, applied back to
    every document as mean token log-probability — the distributable
    skeleton of the CCNet perplexity filter, no external model
    artifacts.  The vocabulary stays a DataFrame (joined on token, never
    broadcast to the driver), so the plan survives a 100 TB vocabulary;
    only the 1-row token total crosses as a scalar."""
    from merkonvectordb_spark.operators.lm import unigram_logprob_score

    docs = load_table(spark, sf_dir, "documents")
    return unigram_logprob_score(docs).select("doc_id", "n_toks", "avg_lp")


@register(
    "top_docs_per_source",
    f"""
WITH q AS (
  SELECT doc_id, source, {{q}} AS quality FROM documents
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY source ORDER BY quality DESC, doc_id ASC) AS rn
  FROM q
)
SELECT source, doc_id, quality AS q_score FROM ranked WHERE rn <= 3
""".format(q=_quality_sql("text")).strip(),
)
def q_top_docs_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Groupwise top-k: the 3 highest-quality docs per source.  Spark
    3.5+ plans this as WindowGroupLimit with a PARTIAL pass below the
    exchange — each map task forwards at most k rows per group, so the
    shuffle carries ≤ sources·k·partitions rows, not the corpus.  The
    canonical 'best n per category' shape at 100 TB."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id", "source", X.quality_score(F.col("text")).alias("quality")
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return (
        q.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("source", "doc_id", F.col("quality").alias("q_score"))
    )


@register(
    "repetition_signals",
    r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                     x -> x <> '') AS t
  FROM documents
),
base AS (
  SELECT doc_id,
         len(t) AS n_tok,
         CASE WHEN len(t) > 0
              THEN round(1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6)
              ELSE 0.0 END AS dup_token_frac,
         list_transform(range(1, greatest(len(t), 1)),
                        i -> t[i] || ' ' || t[i + 1]) AS bigrams
  FROM toks
),
grams AS (
  SELECT doc_id, g, count(*) AS c
  FROM base, UNNEST(bigrams) AS u(g)
  GROUP BY doc_id, g
),
tops AS (
  SELECT doc_id, max(c) AS top_c, sum(c) AS tot_c FROM grams GROUP BY doc_id
)
SELECT b.doc_id, b.n_tok, b.dup_token_frac,
       CASE WHEN coalesce(t.tot_c, 0) > 0
            THEN round(CAST(t.top_c AS DOUBLE) / t.tot_c, 6)
            ELSE 0.0 END AS top_bigram_frac,
       (b.dup_token_frac > 0.8
        OR CASE WHEN coalesce(t.tot_c, 0) > 0
                THEN round(CAST(t.top_c AS DOUBLE) / t.tot_c, 6)
                ELSE 0.0 END > 0.18) AS is_repetitive
FROM base b LEFT JOIN tops t USING (doc_id)
""".strip(),
)
def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition screening (Rae et al. 2021
    §A1.1): duplicate-token fraction (1 − distinct/total — scan-local) and
    top-2-gram fraction (most frequent word bigram's share of all bigrams).
    Docs dominated by one repeated phrase are boilerplate/spam and get
    flagged before training.

    Scale shape: the bigram mode is NOT computed with a per-doc
    quadratic HOF scan — bigrams are exploded once and aggregated twice
    on doc_id-prefixed keys (both partial-aggregable, linear in corpus
    token count); the scan-local fractions ride along as grouping keys,
    so there is no join back to the corpus.  `explode_outer` keeps
    zero-bigram docs (< 2 tokens) in the output with frac 0."""
    docs = load_table(spark, sf_dir, "documents")
    # tokenize ONCE through a projection: four references to the raw
    # tokenize() expression would each re-run the regexp split (the
    # optimizer only inlines cheap expressions across Projects) —
    # measured 5× slower without this barrier
    pre = docs.select("doc_id", X.tokenize(F.col("text")).alias("__t"))
    toks = F.col("__t")
    base = pre.select(
        "doc_id",
        F.size(toks).alias("n_tok"),
        F.when(
            F.size(toks) > 0,
            F.round(
                1.0
                - F.size(F.array_distinct(toks)).cast("double")
                / F.size(toks),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_token_frac"),
        X.ngrams(toks, 2).alias("bigrams"),
    )
    grams = base.select(
        "doc_id",
        "n_tok",
        "dup_token_frac",
        F.explode_outer("bigrams").alias("g"),
    )
    per_gram = grams.groupBy("doc_id", "n_tok", "dup_token_frac", "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_doc = per_gram.groupBy("doc_id", "n_tok", "dup_token_frac").agg(
        F.max(F.when(F.col("g").isNotNull(), F.col("c"))).alias("top_c"),
        F.sum(F.when(F.col("g").isNotNull(), F.col("c"))).alias("tot_c"),
    )
    top_frac = F.when(
        F.coalesce(F.col("tot_c"), F.lit(0)) > 0,
        F.round(F.col("top_c").cast("double") / F.col("tot_c"), 6),
    ).otherwise(F.lit(0.0))
    return per_doc.select(
        "doc_id",
        "n_tok",
        "dup_token_frac",
        top_frac.alias("top_bigram_frac"),
        (
            (F.col("dup_token_frac") > 0.8) | (top_frac > 0.18)
        ).alias("is_repetitive"),
    )


@register(
    "bpe_merge_pairs",
    r"""
WITH words AS (
  SELECT u.w AS w, count(*) AS freq
  FROM documents,
       UNNEST(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                          x -> x <> '')) AS u(w)
  GROUP BY u.w
),
pairs AS (
  SELECT u.p AS pair, sum(freq) AS cnt
  FROM words,
       UNNEST(list_transform(range(1, greatest(length(w), 1)),
                             i -> substring(w, i, 2))) AS u(p)
  GROUP BY u.p
)
SELECT pair, CAST(cnt AS BIGINT) AS cnt
FROM pairs ORDER BY cnt DESC, pair ASC LIMIT 20
""".strip(),
)
def q_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inner loop of BPE tokenizer training (Sennrich et al. 2016):
    count adjacent symbol pairs across the corpus and surface the top
    merge candidates.

    Scale shape — the standard vocab-first trick: the corpus collapses
    to a (word, freq) vocabulary FIRST (one partial-aggregable groupBy;
    vocab is Heaps-law sublinear in corpus size), and pair extraction
    runs over the vocabulary weighted by freq — per merge iteration the
    work is vocab·word_len, never another corpus scan.  Pair counting
    is a second partial-agg groupBy; the top-20 is a 20-row heap
    (TakeOrderedAndProject), nothing sorts globally."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(X.tokenize(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = F.col("w")
    pairs_arr = F.when(
        F.length(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length(w) - 1),
            lambda i: w.substr(i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        words.select(F.explode(pairs_arr).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# term-association mining: pointwise mutual information over doc-level
# co-occurrence
# ---------------------------------------------------------------------------

_PMI_MIN_COUNT = 25
_PMI_ORACLE = """
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                            x -> x <> '')) AS tok
  FROM documents
),
n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM toks),
dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_tok FROM toks GROUP BY tok),
pairs AS (
  SELECT a.tok AS term_a, b.tok AS term_b,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY a.tok, b.tok
  HAVING count(*) >= {mc}
)
SELECT term_a, term_b, n_ab, fa.n_tok AS n_a, fb.n_tok AS n_b,
       round(ln(CAST(n_ab AS DOUBLE) * n.n_docs
                / (CAST(fa.n_tok AS DOUBLE) * fb.n_tok)), 6) AS pmi
FROM pairs
JOIN dfreq fa ON fa.tok = term_a
JOIN dfreq fb ON fb.tok = term_b
CROSS JOIN n
ORDER BY pmi DESC, term_a, term_b
LIMIT 20
""".strip().format(mc=_PMI_MIN_COUNT)


@register("term_pmi_topk", _PMI_ORACLE)
def q_term_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 term pairs by document-level pointwise mutual information.

    PMI = ln(n_ab·N / (n_a·n_b)) over doc-presence counts — all inputs
    are integers aggregated associatively, the single float op is a
    scan-local ln on a ratio of integers (order-free, hash-stable).

    Scale shape: presence rows are |docs|·|doc vocab| (linear); the
    per-doc self-join makes ≤|doc vocab|² pairs per document — bounded
    by capping the vocabulary (min-count prefilter would broadcast at
    real scale), never by corpus size.  Top-k is a heap
    (TakeOrderedAndProject), not a global sort.
    """
    from merkonvectordb_spark.functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    # four consumers (n_docs count, dfreq, both self-join sides) — one
    # materialization, or each re-runs the tokenize+explode corpus
    # lineage (the repo's multi-consumer law)
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(tokenize(F.col("text")))).alias("tok")
    ).localCheckpoint(eager=True)
    n_docs = toks.select("doc_id").distinct().count()
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    a = toks.alias("a")
    b = toks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.tok") < F.col("b.tok")),
        )
        .groupBy(
            F.col("a.tok").alias("term_a"), F.col("b.tok").alias("term_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= _PMI_MIN_COUNT)
    )
    fa = dfreq.select(
        F.col("tok").alias("term_a"), F.col("n_tok").alias("n_a")
    )
    fb = dfreq.select(
        F.col("tok").alias("term_b"), F.col("n_tok").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(fa), "term_a")
        .join(F.broadcast(fb), "term_b")
        .select(
            "term_a",
            "term_b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(
                F.log(
                    F.col("n_ab").cast("double")
                    * F.lit(float(n_docs))
                    / (F.col("n_a").cast("double") * F.col("n_b"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "term_a", "term_b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training: the iterative merge loop (3 unrolled rounds)
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 3


def _bpe_round_ctes(r: int) -> str:
    """CTEs for round r: pair counts over s{r}, best pair b{r}, and the
    merged corpus s{r+1}."""
    pat = f"' ' || b{r}.l || ' ' || b{r}.r || ' '"
    rep = f"' ' || b{r}.l || b{r}.r || ' '"
    return f"""
p{r} AS (
  SELECT x.syms[i] AS l, x.syms[i+1] AS r,
         CAST(sum(x.freq) AS BIGINT) AS cnt
  FROM (SELECT regexp_split_to_array(trim(s), ' ') AS syms, freq
        FROM s{r}) x,
       unnest(generate_series(1, len(x.syms) - 1)) AS t(i)
  GROUP BY 1, 2
),
b{r} AS (SELECT l, r, cnt FROM p{r} ORDER BY cnt DESC, l, r LIMIT 1),
s{r + 1} AS (
  -- LEFT JOIN ON TRUE, not CROSS JOIN: when the merges exhaust early
  -- (b{r} empty) the corpus must CARRY OVER unchanged — a cross join
  -- with an empty side would erase it, while the engine's round loop
  -- breaks and keeps the final frame intact
  SELECT CASE WHEN b{r}.l IS NULL THEN s{r}.s
         ELSE replace(replace(s{r}.s, {pat}, {rep}), {pat}, {rep}) END AS s,
         freq
  FROM s{r} LEFT JOIN b{r} ON TRUE
)""".strip()


_BPE_ROUND_SQL = ",\n".join(_bpe_round_ctes(r) for r in range(_BPE_ROUNDS))
_BPE_UNION_SQL = " UNION ALL ".join(
    f"SELECT {r} AS round, l, r AS right, l || r AS merged, cnt FROM b{r}"
    for r in range(_BPE_ROUNDS)
)

_BPE_TRAIN_ORACLE = f"""
WITH toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
words AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY w),
s0 AS (
  SELECT ' ' || array_to_string(regexp_split_to_array(w, ''), ' ') || ' '
           AS s, freq
  FROM words
),
{_BPE_ROUND_SQL}
SELECT * FROM (
{_BPE_UNION_SQL}
) ORDER BY round
""".strip()


def _bpe_symbol_corpus(words):
    """(s, freq): each word as a sentinel-spaced symbol string."""
    return words.select(
        F.concat(
            F.lit(" "),
            F.array_join(F.split(F.col("w"), ""), " "),
            F.lit(" "),
        ).alias("s"),
        "freq",
    )


def _bpe_run_rounds(cur, n_rounds):
    """Run up to ``n_rounds`` merge rounds over a persisted (s, freq)
    frame.  Returns (merges, final_frame): merges is a list of
    (round, l, r, merged, cnt); stops early when no pair remains.

    Symbols are bound as LITERAL columns (``F.replace``), never spliced
    into a SQL string — a symbol containing a quote or backslash must
    not be able to break or skew the plan.  Each round's frame persists
    so round r never recomputes rounds 1..r-1.
    """
    cur = cur.persist()
    merges = []
    for r in range(n_rounds):
        # the split is BOUND ONCE via the single-element-array wrap:
        # referencing the raw split expression inside the transform
        # lambda re-runs it per pair position (the repo's documented
        # HOF re-eval trap — quadratic per word)
        prs = F.element_at(
            F.transform(
                F.array(F.split(F.trim(F.col("s")), " ")),
                lambda sy: F.when(
                    F.size(sy) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(sy) - 1),
                        lambda i: F.struct(
                            F.element_at(sy, i).alias("l"),
                            F.element_at(sy, (i + 1).cast("int")).alias("r"),
                        ),
                    ),
                ).otherwise(
                    F.array().cast("array<struct<l:string,r:string>>")
                ),
            ),
            1,
        )
        counts = (
            cur.select(F.explode(prs).alias("p"), "freq")
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
        )
        top = counts.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r")).limit(
            1
        ).collect()
        if not top:  # nothing left to merge (single-symbol words only)
            break
        best = top[0]
        merges.append((r, best.l, best.r, best.l + best.r, best.cnt))
        pat = F.lit(f" {best.l} {best.r} ")
        rep = F.lit(f" {best.l}{best.r} ")
        nxt = cur.select(
            F.replace(F.replace(F.col("s"), pat, rep), pat, rep).alias("s"),
            "freq",
        ).persist()
        cur.unpersist()
        cur = nxt
    return merges, cur


@register("bpe_train_merges", _BPE_TRAIN_ORACLE)

def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING (Sennrich et al. 2016), three merge rounds
    unrolled: per round, count adjacent symbol pairs over the
    vocabulary (weighted by word frequency), pick the best pair
    (count DESC, pair ASC), and merge it corpus-wide.

    Merge application is string replace over space-separated symbol
    strings, applied twice per round (left-to-right non-overlapping
    replace consumes the shared separator, so a second pass catches the
    stragglers in same-symbol runs) — byte-identical semantics in both
    engines, which is what the hash verifies.

    Scale shape: the corpus collapses to (word, freq) ONCE; every round
    after that is vocabulary-sized (pairs groupBy + a 1-row argmax +
    a scan-local replace) — the standard vocab-first BPE cost model.
    The per-round best is a driver-collected single row (metadata), the
    same class as IVF centroids."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(X.tokenize(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    merges, final = _bpe_run_rounds(
        _bpe_symbol_corpus(words), _BPE_ROUNDS
    )
    final.unpersist()
    return spark.createDataFrame(
        merges, "round INT, l STRING, right STRING, merged STRING, cnt LONG"
    )


_BPE_APPLY_ORACLE = f"""
WITH toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
words AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY w),
s0 AS (
  SELECT ' ' || array_to_string(regexp_split_to_array(w, ''), ' ') || ' '
           AS s, freq
  FROM words
),
{_BPE_ROUND_SQL}
SELECT
  (SELECT CAST(sum(freq) AS BIGINT) FROM words) AS n_words,
  (SELECT CAST(sum(freq * len(regexp_split_to_array(trim(s), ' ')) ) AS BIGINT)
   FROM s0) AS syms_before,
  (SELECT CAST(sum(freq * len(regexp_split_to_array(trim(s), ' ')) ) AS BIGINT)
   FROM s{_BPE_ROUNDS}) AS syms_after
""".strip()


@register("bpe_apply_report", _BPE_APPLY_ORACLE)
def q_bpe_apply_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained tokenizer APPLIED: corpus symbol counts before and
    after the three learned merges (weighted by word frequency — the
    vocabulary stands in for the corpus, so application costs
    vocab·word_len, not a re-scan).  syms_after < syms_before is the
    whole point of BPE; the exact integers are under the oracle hash."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(X.tokenize(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .persist()
    )
    n_syms = F.sum(
        F.col("freq") * F.size(F.split(F.trim(F.col("s")), " "))
    ).cast("bigint")
    start = _bpe_symbol_corpus(words)
    before = start.agg(n_syms.alias("syms_before"))
    _merges, final = _bpe_run_rounds(start, _BPE_ROUNDS)
    after = final.agg(n_syms.alias("syms_after"))
    nw = words.agg(F.sum("freq").cast("bigint").alias("n_words"))
    out = (
        nw.crossJoin(F.broadcast(before))
        .crossJoin(F.broadcast(after))
        .select("n_words", "syms_before", "syms_after")
    )
    res = spark.createDataFrame(
        out.collect(), "n_words LONG, syms_before LONG, syms_after LONG"
    )
    final.unpersist()
    words.unpersist()
    return res


# ---------------------------------------------------------------------------
# Tokenizer fertility by (lang, source) — subword cost of each corpus
# slice.  Fertility (BPE tokens per whitespace word) and bytes-per-token
# are the two numbers a pretraining team tracks per data source to price
# its token budget (high fertility = the tokenizer fragments that slice).
# ---------------------------------------------------------------------------


@register(
    "tokenizer_fertility",
    f"""
SELECT lang, source,
       count(*) AS n_docs,
       CAST(sum({_BPE_CNT_SQL.format(c="text")}) AS BIGINT) AS bpe_tokens,
       CAST(sum({_TOK_CNT_SQL.format(c="text")}) AS BIGINT) AS ws_tokens,
       CAST(sum(strlen(text)) AS BIGINT) AS text_bytes,
       round(sum({_BPE_CNT_SQL.format(c="text")})
             / nullif(sum({_TOK_CNT_SQL.format(c="text")}), 0), 6)
         AS fertility,
       round(sum(strlen(text))
             / nullif(sum({_BPE_CNT_SQL.format(c="text")}), 0), 6)
         AS bytes_per_token
FROM documents GROUP BY lang, source
""".strip(),
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) tokenizer-fertility report: BPE-ish subword
    count / whitespace word count (the fertility metric of multilingual-
    tokenizer papers) plus UTF-8 bytes per subword token.  One pruned
    scan → scan-local expression counts → a tiny partial-agg groupBy
    (|lang|×|source| groups); ratios divide the two BIGINT sums once per
    group, ``nullif`` keeping an all-empty slice NULL instead of raising
    under an ANSI-mode harness session.  At 100 TB: map-side combine
    into ~hundreds of groups — no corpus shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.select(
        "lang",
        "source",
        X.bpe_token_count(F.col("text")).alias("bpe"),
        X.token_count(F.col("text")).alias("ws"),
        F.octet_length("text").alias("nbytes"),
    )
    agg = per.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("bpe").alias("bpe_tokens"),
        F.sum("ws").alias("ws_tokens"),
        F.sum("nbytes").alias("text_bytes"),
    )
    return agg.select(
        "lang",
        "source",
        "n_docs",
        "bpe_tokens",
        "ws_tokens",
        "text_bytes",
        F.round(
            F.col("bpe_tokens") / F.nullif(F.col("ws_tokens"), F.lit(0)), 6
        ).alias("fertility"),
        F.round(
            F.col("text_bytes") / F.nullif(F.col("bpe_tokens"), F.lit(0)), 6
        ).alias("bytes_per_token"),
    )


@register(
    "domain_quality_prior",
    f"""
WITH q AS (
  SELECT source,
         CAST(floor({_quality_sql("text")} * 1000000.0 + 0.5) AS BIGINT)
           AS q_micro
  FROM documents
),
g AS (
  SELECT source, count(*) AS n_docs, sum(q_micro) AS sum_q FROM q
  GROUP BY source
),
t AS (SELECT sum(sum_q) AS tq, sum(n_docs) AS tn FROM g)
SELECT source, n_docs,
       round((CAST(sum_q AS DOUBLE) / CAST(n_docs AS DOUBLE))
             / 1000000.0, 6) AS raw_q,
       round(((CAST(sum_q AS DOUBLE)
               + 20.0 * (CAST(tq AS DOUBLE) / CAST(tn AS DOUBLE)))
              / (CAST(n_docs AS DOUBLE) + 20.0)) / 1000000.0, 6)
         AS shrunk_q,
       ((CAST(sum_q AS DOUBLE)
         + 20.0 * (CAST(tq AS DOUBLE) / CAST(tn AS DOUBLE)))
        / (CAST(n_docs AS DOUBLE) + 20.0)) >= 450000.0 AS keep
FROM g CROSS JOIN t
""".strip(),
)
def q_domain_quality_prior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quality gate with empirical-Bayes shrinkage (the
    CCNet/DCLM domain-bucket pattern): a source's mean quality is pulled
    toward the corpus mean with prior weight W=20, so a 3-document
    domain cannot win (or lose) the gate on noise while a 10k-document
    domain keeps its own mean.

    Determinism across engines: per-row quality is rounded ONCE into
    integer micro-units, all aggregation is exact BIGINT, and the only
    float arithmetic is a fixed four-operation tail (÷, ×, +, ÷) on
    exact integers — identical IEEE-754 expression tree on both sides;
    the keep decision compares the UNrounded micro value.

    Scale shape: one corpus scan → per-source partial agg (dimension-
    sized output); the corpus totals come from re-aggregating the
    checkpointed GROUPED frame (|domains| rows), broadcast back — the
    corpus is never re-scanned and never shuffled globally."""
    docs = load_table(spark, sf_dir, "documents")
    q = docs.select(
        "source",
        F.floor(
            X.quality_score(F.col("text")) * 1000000.0 + F.lit(0.5)
        ).cast("long").alias("q_micro"),
    )
    g = (
        q.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("q_micro").alias("sum_q"),
        )
        .localCheckpoint(eager=True)
    )
    t = g.agg(
        F.sum("sum_q").alias("tq"), F.sum("n_docs").alias("tn")
    )
    gm = F.col("tq").cast("double") / F.col("tn").cast("double")
    shrunk_micro = (
        F.col("sum_q").cast("double") + F.lit(20.0) * gm
    ) / (F.col("n_docs").cast("double") + F.lit(20.0))
    return g.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        F.round(
            (F.col("sum_q").cast("double") / F.col("n_docs").cast("double"))
            / 1000000.0,
            6,
        ).alias("raw_q"),
        F.round(shrunk_micro / 1000000.0, 6).alias("shrunk_q"),
        (shrunk_micro >= F.lit(450000.0)).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Robust per-source quality statistics: winsorized mean + discrete
# median/MAD.  All thresholds are ORDER STATISTICS of integer
# micro-units (percentile_disc semantics: value at rank ceil(p*n)),
# so every intermediate is exact BIGINT — no interpolated-percentile
# float whose last-ulp could diverge between engines at a floor/clamp
# boundary.  Rank arithmetic uses integer ceil((p*100*n + 99) / 100).
# ---------------------------------------------------------------------------

_ROBUST_ORACLE = f"""
WITH q AS (
  SELECT source,
         CAST(floor({{qsql}} * 1000000.0 + 0.5) AS BIGINT) AS qm
  FROM documents
),
r AS (
  SELECT source, qm,
         row_number() OVER (PARTITION BY source ORDER BY qm) AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM q
),
thr AS (
  SELECT source,
         max(CASE WHEN rn <= (5 * n + 99) // 100 THEN qm END) AS lo,
         max(CASE WHEN rn <= (95 * n + 99) // 100 THEN qm END) AS hi,
         max(CASE WHEN rn <= (50 * n + 99) // 100 THEN qm END) AS med
  FROM r GROUP BY source
),
j AS (
  SELECT q.source, qm, lo, hi, med,
         LEAST(GREATEST(qm, lo), hi) AS cl,
         abs(qm - med) AS dev,
         CASE WHEN qm < lo OR qm > hi THEN 1 ELSE 0 END AS clp
  FROM q JOIN thr ON q.source = thr.source
),
r2 AS (
  SELECT source, cl, dev, clp, med,
         row_number() OVER (PARTITION BY source ORDER BY dev) AS drn,
         count(*) OVER (PARTITION BY source) AS n
  FROM j
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(min(med) AS DOUBLE) / 1000000.0, 6) AS median_q,
       round(CAST(max(CASE WHEN drn <= (50 * n + 99) // 100 THEN dev END)
                  AS DOUBLE) / 1000000.0, 6) AS mad_q,
       round((CAST(sum(cl) AS DOUBLE) / CAST(count(*) AS DOUBLE))
             / 1000000.0, 6) AS winsor_mean_q,
       CAST(sum(clp) AS BIGINT) AS n_clamped
FROM r2 GROUP BY source
""".strip()


@register("quality_robust_stats", _ROBUST_ORACLE.format(qsql=_quality_sql("text")))
def q_quality_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-resistant per-source quality profile: winsorized mean
    (clamped at the p05/p95 order statistics), discrete median, and
    median-absolute-deviation — the robust location/scale pair a
    curation dashboard wants when a crawler source ships a few
    pathological documents that would drag a plain mean.

    Determinism: quality is rounded ONCE to integer micro-units; every
    threshold is a rank-based order statistic (max over the first k
    ranks), so clamp, deviation, and all aggregates are exact BIGINT;
    doubles appear only in the final /1e6 renders.  Scale shape: two
    rank windows partitioned BY SOURCE (per-task buffer = one source's
    rows, the same bound lineitem_quantiles documents; for a single
    monster source switch to operators.stats.global_ntile's
    range-partitioned ranks) + one broadcast-size threshold join."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    q = docs.select(
        "source",
        F.floor(X.quality_score(F.col("text")) * 1000000.0 + F.lit(0.5))
        .cast("long")
        .alias("qm"),
    )
    w = Window.partitionBy("source").orderBy("qm")
    wc = Window.partitionBy("source")
    r = q.select(
        "source",
        "qm",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )

    def _at_rank(k_num: int, rank_col: str, val_col: str):
        k = F.expr(f"({k_num} * n + 99) div 100")
        return F.max(F.when(F.col(rank_col) <= k, F.col(val_col)))

    thr = r.groupBy("source").agg(
        _at_rank(5, "rn", "qm").alias("lo"),
        _at_rank(95, "rn", "qm").alias("hi"),
        _at_rank(50, "rn", "qm").alias("med"),
    )
    j = q.join(F.broadcast(thr), "source").select(
        "source",
        "med",
        F.least(F.greatest(F.col("qm"), F.col("lo")), F.col("hi")).alias("cl"),
        F.abs(F.col("qm") - F.col("med")).alias("dev"),
        F.when(
            (F.col("qm") < F.col("lo")) | (F.col("qm") > F.col("hi")), 1
        ).otherwise(0).alias("clp"),
    )
    w2 = Window.partitionBy("source").orderBy("dev")
    r2 = j.select(
        "*",
        F.row_number().over(w2).alias("drn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    return r2.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(F.min("med").cast("double") / F.lit(1000000.0), 6).alias(
            "median_q"
        ),
        F.round(
            _at_rank(50, "drn", "dev").cast("double") / F.lit(1000000.0), 6
        ).alias("mad_q"),
        F.round(
            (F.sum("cl").cast("double") / F.count(F.lit(1)).cast("double"))
            / F.lit(1000000.0),
            6,
        ).alias("winsor_mean_q"),
        F.sum("clp").cast("bigint").alias("n_clamped"),
    )


# ---------------------------------------------------------------------------
# Zipf-law fit over the token frequency spectrum: slope of
# ln(freq) ~ ln(rank) for the top-1000 terms — the classic corpus
# health check (natural text fits slope ~ -1; synthetic/boilerplate
# corpora bend away).  Same closed-form integer-moment least squares
# as events_value_trend, with ln values micro-rounded per row so the
# sums are exact BIGINT.
# ---------------------------------------------------------------------------

_ZIPF_N = 1000

_ZIPF_ORACLE = f"""
WITH toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                            x -> x <> '')) AS word
  FROM documents
),
counts AS (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY word
),
top AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, word ASC) AS r
  FROM counts QUALIFY r <= {_ZIPF_N}
),
xy AS (
  SELECT CAST(floor(ln(CAST(r AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS x,
         CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS y
  FROM top
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM xy
)
SELECT n AS n_terms,
       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)
         AS zipf_slope,
       round((CAST(sy AS DOUBLE)
              - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                * sx) / n, 6) AS intercept_ln,
       round(((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
              * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy))
             / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
         AS r_squared
FROM s
""".strip()


@register("token_zipf_fit", _ZIPF_ORACLE)
def q_token_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ln-ln least squares over the top-1000 term frequencies.

    Scale shape: explode → partial-agg term counts (the word_freq
    shuffle); top-1000 via TakeOrderedAndProject (per-partition heaps,
    driver merges P·k) with a total (cnt DESC, word ASC) order so the
    cut is deterministic; the rank window then runs on a 1000-row
    frame.  Regression is the closed-form normal-equation tail over
    exact BIGINT moment sums — one float expression per output, same
    tree both engines (ln values micro-rounded per row, the PMI
    precedent)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    top = (
        docs.select(F.explode(X.tokenize(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(_ZIPF_N)
    )
    ranked = top.select(
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.desc("cnt"), F.asc("word")))
        .alias("r"),
    )
    xy = ranked.select(
        F.floor(F.log(F.col("r").cast("double")) * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("x"),
        F.floor(F.log(F.col("cnt").cast("double")) * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("y"),
    )
    s = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    num = nd * F.col("sxy") - sxd * F.col("sy")
    den = nd * F.col("sxx") - sxd * F.col("sx")
    slope = num / den
    intercept = (F.col("sy").cast("double") - slope * F.col("sx")) / F.col("n")
    r2 = (num * num) / (den * (nd * F.col("syy") - syd * F.col("sy")))
    return s.select(
        F.col("n").alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(intercept, 6).alias("intercept_ln"),
        F.round(r2, 6).alias("r_squared"),
    )


# ---------------------------------------------------------------------------
# Gopher-style rule battery (Rae et al. 2021, Table A1 adapted to the
# fixture's signals): per-source counts of documents failing each rule
# and surviving all of them.  Every rule is INTEGER arithmetic on
# scan-local counts (word counts, character counts, marker hits) —
# ratio thresholds are cross-multiplied (punct/toks > 0.1 becomes
# punct*10 > toks), so there is no float anywhere in the predicate.
# ---------------------------------------------------------------------------

_GOPHER_ORACLE = f"""
WITH c AS (
  SELECT source,
         CAST(length(text) AS BIGINT) AS chars,
         CAST({_TOK_CNT_SQL.format(c="text")} AS BIGINT) AS toks,
         CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT)
           AS punct,
         CAST(len(list_filter(
                regexp_split_to_array(lower(trim(text)), '\\s+'),
                x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS alpha_w,
         CAST({_hits_sql("text", X.LANG_MARKERS["en"])} AS BIGINT) AS stops
  FROM documents
),
r AS (
  SELECT source,
         CASE WHEN toks < 30 OR toks > 10000 THEN 1 ELSE 0 END AS f_wc,
         CASE WHEN toks = 0 OR (chars - toks + 1) < 3 * toks
                   OR (chars - toks + 1) > 10 * toks
              THEN 1 ELSE 0 END AS f_wl,
         CASE WHEN punct * 10 > toks THEN 1 ELSE 0 END AS f_sym,
         CASE WHEN toks = 0 OR alpha_w * 10 < toks * 9 THEN 1 ELSE 0 END
           AS f_alpha,
         CASE WHEN stops < 2 THEN 1 ELSE 0 END AS f_stop
  FROM c
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(f_wc) AS BIGINT) AS n_fail_wordcount,
       CAST(sum(f_wl) AS BIGINT) AS n_fail_wordlen,
       CAST(sum(f_sym) AS BIGINT) AS n_fail_symbol,
       CAST(sum(f_alpha) AS BIGINT) AS n_fail_alpha,
       CAST(sum(f_stop) AS BIGINT) AS n_fail_stopword,
       CAST(sum(CASE WHEN f_wc + f_wl + f_sym + f_alpha + f_stop = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
FROM r GROUP BY source
""".strip()


@register("gopher_rules_report", _GOPHER_ORACLE)
def q_gopher_rules_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source breakdown of the Gopher repetition-free rule battery:
    word-count bounds [30, 10000], mean word length [3, 10],
    symbol-to-word ratio ≤ 0.1, ≥90% alphabetic words, ≥2 stopword
    hits — plus the survivors-of-all count a curation run keeps.

    Determinism: every rule is a cross-multiplied INTEGER comparison on
    scan-local counts (no division, no float, nothing to round).
    Scale shape: one pruned scan, all rules evaluated in the same
    projection, one partial-aggregated groupBy — |sources| output rows;
    at 100 TB this is scan-bound by construction."""
    docs = load_table(spark, sf_dir, "documents")
    toks_arr = X.tokenize(F.col("text"))
    c = docs.select(
        "source",
        F.length(F.coalesce(F.col("text"), F.lit(""))).cast("bigint").alias("chars"),
        F.size(toks_arr).cast("bigint").alias("toks"),
        F.size(
            F.regexp_extract_all(
                F.coalesce(F.col("text"), F.lit("")),
                F.lit(r"[^A-Za-z0-9\s]"),
                0,
            )
        ).cast("bigint").alias("punct"),
        F.size(F.filter(toks_arr, lambda t: t.rlike("[a-z]")))
        .cast("bigint")
        .alias("alpha_w"),
        X._marker_hits(F.col("text"), X.LANG_MARKERS["en"])
        .cast("bigint")
        .alias("stops"),
    )
    f_wc = F.when((F.col("toks") < 30) | (F.col("toks") > 10000), 1).otherwise(0)
    mwl_num = F.col("chars") - F.col("toks") + 1
    f_wl = F.when(
        (F.col("toks") == 0)
        | (mwl_num < 3 * F.col("toks"))
        | (mwl_num > 10 * F.col("toks")),
        1,
    ).otherwise(0)
    f_sym = F.when(F.col("punct") * 10 > F.col("toks"), 1).otherwise(0)
    f_alpha = F.when(
        (F.col("toks") == 0) | (F.col("alpha_w") * 10 < F.col("toks") * 9), 1
    ).otherwise(0)
    f_stop = F.when(F.col("stops") < 2, 1).otherwise(0)
    r = c.select(
        "source",
        f_wc.alias("f_wc"),
        f_wl.alias("f_wl"),
        f_sym.alias("f_sym"),
        f_alpha.alias("f_alpha"),
        f_stop.alias("f_stop"),
    )
    return r.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("f_wc").cast("bigint").alias("n_fail_wordcount"),
        F.sum("f_wl").cast("bigint").alias("n_fail_wordlen"),
        F.sum("f_sym").cast("bigint").alias("n_fail_symbol"),
        F.sum("f_alpha").cast("bigint").alias("n_fail_alpha"),
        F.sum("f_stop").cast("bigint").alias("n_fail_stopword"),
        F.sum(
            F.when(
                F.col("f_wc")
                + F.col("f_wl")
                + F.col("f_sym")
                + F.col("f_alpha")
                + F.col("f_stop")
                == 0,
                1,
            ).otherwise(0)
        ).cast("bigint").alias("n_keep"),
    )


# ---------------------------------------------------------------------------
# Interpolated bigram LM scoring — conditioning on the previous token
# (one rung up the CCNet ladder from unigram_lm_score).  The (1-λ)
# coefficient is mirrored as an IEEE SUBTRACTION, not a 0.3 literal:
# Python's 1.0-0.7 = 0.30000000000000004 is NOT the closest double to
# 0.3, so a plain SQL literal would diverge in the last ulp.
# ---------------------------------------------------------------------------

_BIGRAM_ORACLE = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                     x -> x <> '') AS t
  FROM documents
),
big AS (
  SELECT doc_id, t[i.i] AS w1, t[i.i + 1] AS w2
  FROM base, unnest(range(1, len(t))) AS i(i)
),
c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM big GROUP BY 1, 2),
cf AS (
  SELECT token, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(t) AS token FROM base) GROUP BY 1
),
tt AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM cf),
lp AS (
  SELECT doc_id,
         CAST(floor(ln(CAST(0.7 AS DOUBLE) * CAST(c2.c2 AS DOUBLE)
                         / CAST(f1.c AS DOUBLE)
                       + (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE))
                         * CAST(f2.c AS DOUBLE) / CAST(tt.t AS DOUBLE))
                    * 1000000.0 + 0.5) AS BIGINT) AS lpm
  FROM big JOIN c2 USING (w1, w2)
           JOIN cf f1 ON big.w1 = f1.token
           JOIN cf f2 ON big.w2 = f2.token
           CROSS JOIN tt
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round((CAST(sum(lpm) AS DOUBLE) / CAST(count(*) AS DOUBLE))
             / 1000000.0, 6) AS avg_lp
FROM lp GROUP BY doc_id
""".strip()


@register("bigram_lm_score", _BIGRAM_ORACLE)
def q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean bigram log-probability under the Jelinek-Mercer
    interpolated self-model (λ=0.7) — the word-ORDER fluency signal the
    unigram filter can't see.  See `operators.lm.bigram_logprob_score`
    for the determinism contract (exact integer counts, one fixed
    expression tree, micro-rounded ln, exact-BIGINT per-doc mean) and
    the scale shape (scan-local pair extraction, model-as-DataFrame
    joins, partial-aggregated final groupBy)."""
    from merkonvectordb_spark.operators.lm import bigram_logprob_score

    docs = load_table(spark, sf_dir, "documents")
    return bigram_logprob_score(docs, "doc_id", "text", lam=0.7)


# ---------------------------------------------------------------------------
# Cross-source quantile normalization (ECDF matching): replace each
# document's quality with the GLOBAL quality at the same percentile
# position — the batch-effect correction that makes per-source score
# distributions comparable before a single corpus-wide threshold is
# applied (one crawler's "0.6" is another's "0.4").
# ---------------------------------------------------------------------------

_QNORM_ORACLE = f"""
WITH q AS (
  SELECT doc_id, source,
         CAST(floor({{qsql}} * 1000000.0 + 0.5) AS BIGINT) AS qm
  FROM documents
),
r AS (
  SELECT source, qm,
         row_number() OVER (PARTITION BY source ORDER BY qm, doc_id) AS rn,
         count(*) OVER (PARTITION BY source) AS ns
  FROM q
),
gl AS (
  SELECT qm AS target_qm,
         row_number() OVER (ORDER BY qm, doc_id) AS g
  FROM q
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
tgt AS (
  SELECT source, qm, (rn * n + ns - 1) // ns AS g
  FROM r CROSS JOIN nn
),
j AS (SELECT source, qm, target_qm FROM tgt JOIN gl USING (g))
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       round((CAST(sum(qm) AS DOUBLE) / CAST(count(*) AS DOUBLE))
             / 1000000.0, 6) AS mean_q,
       round((CAST(sum(target_qm) AS DOUBLE) / CAST(count(*) AS DOUBLE))
             / 1000000.0, 6) AS mean_q_norm
FROM j GROUP BY source
""".strip()


@register(
    "quality_quantile_normalize", _QNORM_ORACLE.format(qsql=_quality_sql("text"))
)
def q_quality_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete ECDF matching: a document at source-local rank rn of ns
    maps to the global value at rank ceil(rn·N/ns) — all INTEGER rank
    arithmetic on micro-unit scores, with (qm, doc_id) as the total
    order so both engines pick identical rank holders under ties.

    Scale shape: the source-local ranks are per-source windows (bounded
    by the largest source); the GLOBAL rank comes from the house
    two-pass range-partition + prefix-count
    (`operators.pipeline.global_exclusive_prefix_sum` with a ones
    column) — never a single-partition window; the rank-equality join
    shuffles on an integer key.  rn·N stays in BIGINT up to ~10⁹ docs
    per source — switch the product to DECIMAL(38,0) beyond."""
    from pyspark.sql import Window

    from merkonvectordb_spark.operators.pipeline import (
        global_exclusive_prefix_sum,
    )

    docs = load_table(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id",
        "source",
        F.floor(X.quality_score(F.col("text")) * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("qm"),
    )
    wr = Window.partitionBy("source").orderBy("qm", "doc_id")
    wc = Window.partitionBy("source")
    r = q.select(
        "source",
        "qm",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("ns"),
    )
    g = global_exclusive_prefix_sum(
        q.select("qm", "doc_id").withColumn("__one", F.lit(1)),
        ["qm", "doc_id"],
        "__one",
        out_col="__r0",
    )
    glob = g.select(
        (F.col("__r0") + 1).alias("g"), F.col("qm").alias("target_qm")
    )
    nn = q.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tgt = r.crossJoin(F.broadcast(nn)).select(
        "source",
        "qm",
        F.expr("(rn * n + ns - 1) div ns").alias("g"),
    )
    j = tgt.join(glob, "g")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(
            (F.sum("qm").cast("double") / F.count(F.lit(1)).cast("double"))
            / F.lit(1000000.0),
            6,
        ).alias("mean_q"),
        F.round(
            (F.sum("target_qm").cast("double")
             / F.count(F.lit(1)).cast("double"))
            / F.lit(1000000.0),
            6,
        ).alias("mean_q_norm"),
    )


# ---------------------------------------------------------------------------
# character-entropy screen: the low-entropy repetitive-boilerplate
# filter word-level signals miss.  Exact integer counts per symbol,
# one micro-rounded ln per term, nano-unit integer terms — the sum is
# associative, the hash stable by construction.
# ---------------------------------------------------------------------------

_ENT_ALPH_SQL = "[" + ", ".join(
    "'" + (ch if ch != "'" else "''") + "'" for ch in X.ENTROPY_ALPHABET
) + "]"

_ENT_TERM_SQL = (
    "CASE WHEN c > 0 AND tot > 0 THEN CAST(floor("
    "-((CAST(c AS DOUBLE) / CAST(tot AS DOUBLE))"
    " * (CAST(floor(ln(CAST(c AS DOUBLE) / CAST(tot AS DOUBLE))"
    "            * 1000000.0 + 0.5) AS BIGINT)"
    "    / CAST(1000000.0 AS DOUBLE)))"
    " * 1000000000.0 + 0.5) AS BIGINT) ELSE CAST(0 AS BIGINT) END"
)

_ENTROPY_ORACLE = f"""
WITH cn AS (
  SELECT source,
         list_transform({_ENT_ALPH_SQL},
           ch -> CAST(length(lower(coalesce(text, '')))
                      - length(replace(lower(coalesce(text, '')), ch, ''))
                      AS BIGINT)) AS cnts
  FROM documents
),
h AS (
  SELECT source,
         CAST(list_sum(list_transform(cnts, c -> {_ENT_TERM_SQL}))
              AS BIGINT) AS h_nano
  FROM (SELECT source, cnts, CAST(list_sum(cnts) AS BIGINT) AS tot FROM cn)
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round((CAST(sum(h_nano) AS DOUBLE) / CAST(count(*) AS DOUBLE))
             / 1000000000.0, 6) AS mean_entropy,
       round(CAST(min(h_nano) AS DOUBLE) / 1000000000.0, 6) AS min_entropy,
       CAST(sum(CASE WHEN h_nano < 2600000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low_entropy
FROM h GROUP BY source
""".strip()


@register("char_entropy_screen", _ENTROPY_ORACLE)
def q_char_entropy_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Shannon character entropy profile (nats over the
    a-z+space distribution) with a < 2.6-nat low-entropy alarm count —
    natural prose sits ~2.7-3.0; repeated-token boilerplate collapses
    toward 0.  See `functions.text.char_entropy_nano` for the exact
    integer construction.  Scale shape: 27 scan-local replace() counts
    per row, one partial-aggregated groupBy — scan-bound; the alarm
    threshold compares INTEGER nano-units, no float in the predicate."""
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "source", X.char_entropy_nano(F.col("text")).alias("h_nano")
    )
    return h.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(
            (F.sum("h_nano").cast("double") / F.count(F.lit(1)).cast("double"))
            / F.lit(1000000000.0),
            6,
        ).alias("mean_entropy"),
        F.round(
            F.min("h_nano").cast("double") / F.lit(1000000000.0), 6
        ).alias("min_entropy"),
        F.sum(
            F.when(F.col("h_nano") < F.lit(2600000000), 1).otherwise(0)
        ).cast("bigint").alias("n_low_entropy"),
    )


@register(
    "quality_score_auc",
    f"""
WITH scored AS (
  SELECT CAST(floor({_quality_sql("text")} * 1000000.0 + 0.5) AS BIGINT) AS qm,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
), per_v AS (
  SELECT qm, CAST(count(*) AS BIGINT) AS nv, CAST(sum(pos) AS BIGINT) AS pv
  FROM scored GROUP BY qm
), cum AS (
  SELECT nv, pv,
         CAST(coalesce(sum(nv) OVER (
           ORDER BY qm NULLS FIRST
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS cv
  FROM per_v
), agg AS (
  SELECT CAST(sum(pv * (2 * cv + nv + 1)) AS BIGINT) AS two_r,
         CAST(sum(pv) AS BIGINT) AS p_cnt,
         CAST(sum(nv) AS BIGINT) AS n_tot
  FROM cum
)
SELECT p_cnt,
       n_tot - p_cnt AS neg_cnt,
       two_r - p_cnt * (p_cnt + 1) AS auc_num,
       2 * p_cnt * (n_tot - p_cnt) AS auc_den,
       CASE WHEN p_cnt > 0 AND n_tot > p_cnt
            THEN round(CAST(two_r - p_cnt * (p_cnt + 1) AS DOUBLE)
                       / CAST(2 * p_cnt * (n_tot - p_cnt) AS DOUBLE), 6)
            END AS auc
FROM agg
""".strip(),
)
def q_quality_score_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann-Whitney AUC of the heuristic quality score against
    the corpus's ground-truth language label (positive = 'en'): the
    score's stopword arm is English-based, so "does it rank English
    docs above the rest?" is the natural discrimination check before
    the score gates anything (`operators.stats.exact_auc`).

    Determinism: quality micro-rounded ONCE to BIGINT; midrank tie
    handling in doubled-integer arithmetic (2R = Σ p_v·(2C_v+n_v+1)),
    so numerator/denominator are exact BIGINTs and the lone double is
    the final rounded division.  Scale shape: corpus → ≤1e6-row
    distinct-score frame (partial agg) → one window bounded by the
    VALUE DOMAIN, not the data → 1-row fold."""
    from merkonvectordb_spark.operators.stats import exact_auc

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        F.floor(
            X.quality_score(F.col("text")) * F.lit(1000000.0) + F.lit(0.5)
        )
        .cast("long")
        .alias("qm"),
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias(
            "pos"
        ),
    )
    return exact_auc(scored, "qm", "pos")


@register(
    "quality_linear_probe",
    f"""
WITH feat AS (
  SELECT CAST(n_chars AS BIGINT) AS x1,
         CAST({_TOK_CNT_SQL.format(c="text")} AS BIGINT) AS x2,
         CAST(floor({_quality_sql("text")} * 1000000.0 + 0.5) AS BIGINT) AS y
  FROM documents
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x1) AS BIGINT) AS sx1, CAST(sum(x2) AS BIGINT) AS sx2,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x1 * x1) AS BIGINT) AS sx11,
         CAST(sum(x1 * x2) AS BIGINT) AS sx12,
         CAST(sum(x2 * x2) AS BIGINT) AS sx22,
         CAST(sum(x1 * y) AS BIGINT) AS sx1y,
         CAST(sum(x2 * y) AS BIGINT) AS sx2y,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM feat
), dd AS (
  SELECT n,
         CAST(n AS DOUBLE) AS nd, CAST(sx1 AS DOUBLE) AS a1,
         CAST(sx2 AS DOUBLE) AS a2, CAST(sy AS DOUBLE) AS ay,
         CAST(sx11 AS DOUBLE) AS a11, CAST(sx12 AS DOUBLE) AS a12,
         CAST(sx22 AS DOUBLE) AS a22, CAST(sx1y AS DOUBLE) AS a1y,
         CAST(sx2y AS DOUBLE) AS a2y, CAST(syy AS DOUBLE) AS ayy
  FROM m
), solved AS (
  SELECT n, ay, a1y, a2y, ayy, nd,
         nd * (a11 * a22 - a12 * a12)
           - a1 * (a1 * a22 - a12 * a2)
           + a2 * (a1 * a12 - a11 * a2) AS det,
         ay * (a11 * a22 - a12 * a12)
           - a1 * (a1y * a22 - a12 * a2y)
           + a2 * (a1y * a12 - a11 * a2y) AS det0,
         nd * (a1y * a22 - a12 * a2y)
           - ay * (a1 * a22 - a12 * a2)
           + a2 * (a1 * a2y - a1y * a2) AS det1,
         nd * (a11 * a2y - a1y * a12)
           - a1 * (a1 * a2y - a1y * a2)
           + ay * (a1 * a12 - a11 * a2) AS det2
  FROM dd
)
SELECT n,
       CASE WHEN det <> 0 THEN round(det0 / det, 6) END AS b0,
       CASE WHEN det <> 0 THEN round(det1 / det, 6) END AS b1,
       CASE WHEN det <> 0 THEN round(det2 / det, 6) END AS b2,
       CASE WHEN det <> 0 AND (ayy - ay * ay / nd) > 0
            THEN round(1.0 - (ayy - ((det0 / det) * ay
                                     + (det1 / det) * a1y
                                     + (det2 / det) * a2y))
                             / (ayy - ay * ay / nd), 6)
       END AS r2
FROM solved
""".strip(),
)
def q_quality_linear_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine "train a tiny model": closed-form OLS of quality
    micro-units on (n_chars, token count) + intercept
    (`operators.stats.linear_probe_2f`) — the cheap linear probe a
    curation pipeline fits to sanity-check feature signal before
    paying for a real classifier.  Ten exact-BIGINT moments in one
    partial-agg pass; Cramer's rule in a fixed double expression tree
    (bit-reproducible cross-engine); R² from the normal-equation
    identity.  No shuffle, no iteration."""
    from merkonvectordb_spark.operators.stats import linear_probe_2f

    docs = load_table(spark, sf_dir, "documents")
    feat = docs.select(
        F.col("n_chars").alias("x1"),
        X.token_count(F.col("text")).cast("long").alias("x2"),
        F.floor(
            X.quality_score(F.col("text")) * F.lit(1000000.0) + F.lit(0.5)
        )
        .cast("long")
        .alias("y"),
    )
    return linear_probe_2f(feat, "y", "x1", "x2")


@register(
    "quality_calibration_report",
    f"""
WITH scored AS (
  SELECT doc_id,
         CAST(floor({_quality_sql("text")} * 1000000.0 + 0.5) AS BIGINT) AS qm,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
),
tiled AS (
  SELECT qm, pos,
         ntile(10) OVER (ORDER BY qm ASC, doc_id ASC) AS decile
  FROM scored
)
SELECT decile,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(pos) AS BIGINT) AS n_pos,
       CAST(sum(qm) AS BIGINT) AS sum_qm,
       round(CAST(sum(pos) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         AS pos_rate,
       round(CAST(sum(qm) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             / 1000000.0, 6) AS mean_score
FROM tiled GROUP BY decile
""".strip(),
)
def q_quality_calibration_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reliability diagram for the quality score: decile the corpus by
    score (exact NTILE via the range-partition `global_ntile` — no
    single-partition window), then per decile the positive rate (label
    = ground-truth English, the same rail `quality_score_auc` uses)
    against the decile's mean score.  AUC answers "does it rank well";
    this answers "do the VALUES mean anything" — the difference between
    a usable threshold gate and a score you can only sort by.  Exact
    BIGINT counts and score sums; doubles only in the two rendered
    ratios."""
    from merkonvectordb_spark.operators.stats import global_ntile

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        F.floor(
            X.quality_score(F.col("text")) * F.lit(1000000.0) + F.lit(0.5)
        )
        .cast("long")
        .alias("qm"),
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias(
            "pos"
        ),
    )
    tiled = global_ntile(
        scored, [("qm", "asc"), ("doc_id", "asc")], 10, out_col="decile"
    )
    return tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("pos").alias("n_pos"),
        F.sum("qm").alias("sum_qm"),
        F.round(
            F.sum("pos").cast("double") / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("pos_rate"),
        F.round(
            F.sum("qm").cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(1000000.0),
            6,
        ).alias("mean_score"),
    )
