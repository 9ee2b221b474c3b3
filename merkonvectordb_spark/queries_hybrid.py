"""Lexical (BM25) and hybrid (BM25 + vector, RRF-fused) retrieval over
the driver fixtures, with fully-mirrored DuckDB oracles.

The reference retrieves by cosine only; these queries add the other half
of a production retrieval stack.  As with ``queries_ann``, the oracle
replays the exact algorithm — same tokenizer, same BM25 constants, same
rounded-score ranking, same RRF constant — so the hash-compare proves
both engines compute identical postings, scores, ranks, and fusion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from merkonvectordb_spark.operators.search import knn
from merkonvectordb_spark.operators.textsearch import (
    bm25_topk,
    rank_by,
    rrf_fuse,
)
from merkonvectordb_spark.registry import register
from merkonvectordb_spark.schema import load_table

_QUERY_TERMS = ("fast", "scan", "vector")

# shared DuckDB CTE: tokenizer parity with functions.text.tokenize
# (lower → trim → split on \s+ → drop empties), postings, BM25 scores
# (k1=1.2, b=0.75, idf = ln(1 + (N - df + 0.5)/(df + 0.5))), ranking on
# the 6-dp-rounded score with doc_id tie-break.
_BM25_CTE = """
base AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                     x -> x <> '') AS tl
  FROM documents
),
stats AS (SELECT count(*) AS n_docs, avg(len(tl)) AS avgdl FROM base),
post AS (
  SELECT doc_id, dl, term, count(*) AS tf FROM (
    SELECT doc_id, len(tl) AS dl, unnest(tl) AS term FROM base
  ) WHERE term IN ('fast', 'scan', 'vector') GROUP BY 1, 2, 3
),
dfreq AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
kw AS (
  SELECT doc_id,
         round(sum(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                   * tf * 2.2
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / s.avgdl))),
               6) AS score
  FROM post p JOIN dfreq d USING (term) CROSS JOIN stats s
  GROUP BY 1
)
""".strip()


@register(
    "text_search_bm25",
    f"""
WITH {_BM25_CTE}
SELECT doc_id, score FROM kw ORDER BY score DESC, doc_id LIMIT 10
""".strip(),
)
def q_text_search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for a 3-term query.  Plan shape: the term filter
    pushes below the postings aggregation (only matched-term rows
    shuffle), dfreq and corpus stats broadcast, top-k is a heap
    (TakeOrderedAndProject), never a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, _QUERY_TERMS, k=10).select(
        F.col("doc").alias("doc_id"), "score"
    )


@register(
    "hybrid_search_rrf",
    f"""
WITH {_BM25_CTE},
kw_top AS (SELECT doc_id, score FROM kw ORDER BY score DESC, doc_id LIMIT 20),
kw_rank AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
  FROM kw_top
),
edim AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
  WHERE sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                              CAST(embedding AS DOUBLE[]))) > 0
),
q AS (SELECT emb AS qv FROM edim WHERE vec_id = 0),
vecscored AS (
  SELECT e.vec_id,
         list_dot_product(e.emb, q.qv)
         / (sqrt(list_dot_product(e.emb, e.emb))
            * sqrt(list_dot_product(q.qv, q.qv))) AS raw
  FROM edim e CROSS JOIN q WHERE len(e.emb) = len(q.qv)
),
vec_top AS (
  SELECT vec_id, round(raw, 6) AS score FROM vecscored
  WHERE raw >= -1.0 ORDER BY raw DESC, vec_id LIMIT 20
),
vec_rank AS (
  SELECT vec_id, row_number() OVER (ORDER BY score DESC, vec_id) AS r
  FROM vec_top
),
fused AS (
  SELECT id, sum(c) AS rrf FROM (
    SELECT doc_id AS id, 1.0 / (60 + r) AS c FROM kw_rank
    UNION ALL
    SELECT vec_id AS id, 1.0 / (60 + r) AS c FROM vec_rank
  ) GROUP BY id
)
SELECT id, rrf FROM fused ORDER BY rrf DESC, id LIMIT 10
""".strip(),
)
def q_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-20 and cosine-kNN top-20 (query =
    vector 0, the same id space as doc_id per FIXTURES.md) fused by
    reciprocal rank, top-10 out.  The two retrievals are independent
    corpus-scale jobs; fusion touches 40 rows.  The kNN half reuses the
    flagship operator unchanged (raw-score cutoff, rounded output);
    within each top-20 frame, rank is (rounded score DESC, id ASC) —
    exactly reproducible cross-engine."""
    docs = load_table(spark, sf_dir, "documents")
    kw_top = bm25_topk(docs, _QUERY_TERMS, k=20)
    kw_rank = rank_by(kw_top, "score", "doc")

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = list(
        emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    )
    vec_top = knn(emb, qvec, k=20, min_score=-1.0, tie_break="vec_id")
    vec_rank = rank_by(
        vec_top.select(F.col("vec_id").alias("doc"), "score"), "score", "doc"
    )
    return rrf_fuse([kw_rank, vec_rank], id_col="doc", k=10)


@register(
    "doc_keywords_tfidf",
    """
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                     x -> x <> '') AS tl
  FROM documents
),
n AS (SELECT count(*) AS n_docs FROM base),
post AS (
  SELECT doc_id, term, count(*) AS tf FROM (
    SELECT doc_id, unnest(tl) AS term FROM base
  ) GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
scored AS (
  SELECT p.doc_id, p.term, p.tf,
         round(p.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df), 6) AS tfidf
  FROM post p JOIN dfreq d USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rn
  FROM scored
)
SELECT doc_id, term, tf, tfidf FROM ranked WHERE rn <= 3 AND doc_id < 100
""".strip(),
)
def q_doc_keywords_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction: top-3 tf-idf terms per document.  The whole
    corpus flows through the postings aggregation once; the per-doc
    top-3 is a bounded window (WindowGroupLimit pushes the limit
    map-side, so the rank shuffle carries ≤ 3·P rows per doc, never a
    doc's full vocabulary).  The postings⋈dfreq join is left to AQE —
    at 100 TB the vocabulary is NOT broadcastable."""
    from merkonvectordb_spark.operators.textsearch import doc_postings
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    # df(term) via groupBy + join, NOT a count-over-term window: a
    # window partition holds a term's ENTIRE postings list in one task —
    # a stopword at corpus scale is a billion-row straggler AQE cannot
    # split (WindowExec is not skew-splittable; the join is, and dfreq
    # partial-aggregates map-side).  The two consumers of `post` are fed
    # by an eager localCheckpoint instead of a lineage recompute.
    post = doc_postings(docs).drop("dl").localCheckpoint(eager=True)
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    dfreq = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        post.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") <= 3) & (F.col("doc") < 100))
        .select(F.col("doc").alias("doc_id"), "term", "tf", "tfidf")
    )


# ---------------------------------------------------------------------------
# late-interaction retrieval (ColBERT-style MaxSim) over deterministic
# per-token vectors
# ---------------------------------------------------------------------------

_LI_DIM = 16
_LI_TERMS = ("fast", "scan", "vector")


def _li_vec_sql(tok_expr: str) -> str:
    """16 doubles from one md5: byte i → (hexpair − 127.5)/127.5."""
    comps = ", ".join(
        "(CAST(list_reduce(list_transform(regexp_split_to_array("
        f"substr(md5({tok_expr}), {2 * i + 1}, 2), ''),"
        " ch -> CAST(strpos('0123456789abcdef', ch) AS BIGINT) - 1),"
        " (acc, d) -> acc * 16 + d) AS DOUBLE) - 127.5) / 127.5"
        for i in range(_LI_DIM)
    )
    return f"[{comps}]"


_LI_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)

_LI_MAXES = ", ".join(
    f"max(CASE WHEN qt = '{t}' THEN cs END) AS m{i}"
    for i, t in enumerate(_LI_TERMS)
)
_LI_SCORE = " + ".join(f"m{i}" for i in range(len(_LI_TERMS)))

_LI_ORACLE = f"""
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                            x -> x <> '')) AS tok
  FROM documents
),
vocab AS (
  SELECT tok, {_li_vec_sql("tok")} AS tv FROM (SELECT DISTINCT tok FROM toks)
),
qterms AS (
  SELECT qt, {_li_vec_sql("qt")} AS qv
  FROM (SELECT unnest({list(_LI_TERMS)!r}) AS qt)
),
scored AS (
  SELECT t.doc_id, q.qt,
         {_LI_COS.format(a="v.tv", b="q.qv")} AS cs
  FROM toks t JOIN vocab v USING (tok) CROSS JOIN qterms q
),
per_doc AS (
  SELECT doc_id, {_LI_MAXES} FROM scored GROUP BY doc_id
),
ranked AS (
  SELECT doc_id, ({_LI_SCORE}) AS raw,
         row_number() OVER (ORDER BY ({_LI_SCORE}) DESC, doc_id ASC) AS rn
  FROM per_doc
)
SELECT doc_id, round(raw, 6) AS maxsim FROM ranked WHERE rn <= 10
""".strip()


@register("late_interaction_maxsim", _LI_ORACLE)
def q_late_interaction_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction retrieval (the ColBERT MaxSim scheme as a
    dataflow): score(doc) = Σ over query terms of the MAX cosine between
    the term's vector and any document token's vector.  Token vectors
    here are deterministic md5-byte stand-ins (one md5 per DISTINCT
    token — vocabulary-first, so the embedding cost is |vocab| not
    |corpus tokens|); swap in real token embeddings at the ``vocab``
    seam.  The per-term maxes land in separate columns of ONE
    aggregation and the final score is a fixed-order expression sum —
    no order-dependent float reduction anywhere.

    Scale: distinct (doc, token) presence rows × |query terms| is the
    widest stage — corpus-linear with a constant factor of the term
    count; the per-doc aggregation partial-aggregates map-side.
    """
    from merkonvectordb_spark.functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    # NOT spread before tokenize (round 11): the two 1-task tokenize
    # stages carry ~0.9 s of wall at sf0.1, but a raw-TEXT round-robin
    # exchange costs what the parallelized tokenize saves (interleaved
    # A/B medians 1.33 s spread vs 1.18 s unspread — same law the r10
    # corpus_curation revert recorded; text payloads don't pay the way
    # 0.1 MB embedding columns do)
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(tokenize(F.col("text")))).alias("tok")
    )

    def vec(col: str) -> F.Column:
        comps = ", ".join(
            f"(cast(conv(substring(md5({col}), {2 * i + 1}, 2), 16, 10)"
            " as double) - 127.5) / 127.5"
            for i in range(_LI_DIM)
        )
        return F.expr(f"array({comps})")

    vocab = toks.select("tok").distinct().select(
        "tok", vec("tok").alias("tv")
    )
    qterms = spark.createDataFrame(
        [(t,) for t in _LI_TERMS], "qt STRING"
    ).select("qt", vec("qt").alias("qv"))
    from merkonvectordb_spark.functions.vector import cosine_similarity

    # sims depend only on (vocab token, query term): compute them on the
    # VOCAB (|vocab|·|terms| rows), then join to the corpus presence rows
    # — the 16-dim fold never runs per token occurrence
    sims = (
        vocab.crossJoin(F.broadcast(qterms))
        .select(
            "tok",
            "qt",
            cosine_similarity(F.col("tv"), F.col("qv")).alias("cs"),
        )
    )
    # no broadcast HINT on sims: it is |vocab|·|terms| rows — this
    # tokenizer's vocabulary is unbounded, and the same file's tf-idf
    # query already records that a 100 TB vocabulary is NOT
    # broadcastable.  AQE broadcasts it anyway when it measures small.
    scored = toks.join(sims, "tok").select("doc_id", "qt", "cs")
    maxes = [
        F.max(F.when(F.col("qt") == t, F.col("cs"))).alias(f"m{i}")
        for i, t in enumerate(_LI_TERMS)
    ]
    per_doc = scored.groupBy("doc_id").agg(*maxes)
    raw = None
    for i in range(len(_LI_TERMS)):
        raw = F.col(f"m{i}") if raw is None else raw + F.col(f"m{i}")
    # top-10 as a TakeOrderedAndProject heap — no global-sort window
    return (
        per_doc.withColumn("__raw", raw)
        .orderBy(F.desc("__raw"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", F.round("__raw", 6).alias("maxsim"))
    )
