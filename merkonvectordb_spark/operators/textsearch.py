"""BM25 keyword search and keyword+vector hybrid retrieval (RRF).

The reference engine is vector-only (`MerkonMemoryStore.cs:117-150` —
cosine scan is the single retrieval path).  A production retrieval stack
pairs that with lexical search and fuses the two rankings; both halves
are classic dataflow, so they come to Spark as pure DataFrame plans:

- **postings** — tokenize → explode → (doc, term) count.  The shuffle
  carries one row per (doc, matched term), not the corpus: a filter on
  the term column is a filter on a grouping key, so Catalyst pushes it
  below the aggregation and only query-term postings ever move.
- **BM25** (Robertson/Sparck-Jones idf with the +1 floor) — document
  frequencies for the handful of query terms broadcast back, corpus
  stats (N, avgdl) are a one-row broadcast, the per-doc score is a
  map-side sum.  Top-k plans as `TakeOrderedAndProject` — no sort.
- **RRF fusion** — `1/(c + rank)` summed across rankers on a full-outer
  join of two k-row frames; all work after the two retrievals is
  driver-scale.

Cross-engine determinism: the BM25 sum adds per-term contributions in
engine-dependent order, so scores can differ in the last ulp — ranking
therefore uses the 6-dp-rounded score (ties broken by doc id), which is
exactly reproducible everywhere.  RRF sums are exact doubles (two terms,
each 1/(c+r)); no rounding ambiguity exists.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from merkonvectordb_spark.functions.hashing import md5_hash60

from merkonvectordb_spark.functions.text import tokenize

RRF_C = 60  # the constant from the original RRF paper (Cormack et al.)


def doc_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, dl, term, tf) posting rows — the inverted-index building
    block.  ``dl`` (document token length) rides along so BM25 needs no
    second join back to the corpus."""
    base = docs.select(
        F.col(id_col).alias("doc"), tokenize(F.col(text_col)).alias("__t")
    )
    return (
        base.select(
            "doc", F.size("__t").alias("dl"), F.explode("__t").alias("term")
        )
        .groupBy("doc", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents for a bag of query terms under BM25.

    Returns (doc, score) with score rounded to 6 dp; ordering is
    (score DESC, doc ASC).  Corpus stats come from a separate map-side
    aggregation over the raw table (a second scan of the text column —
    cheaper at scale than persisting the tokenized corpus for two
    consumers, and it never shuffles).
    """
    terms = sorted({t.lower() for t in query_terms if t})
    if not terms or k <= 0:
        # the empty frame's doc column must carry the ACTUAL id type, or
        # a caller unioning empty and non-empty rankings (rrf_fuse over
        # a query mix) hits a schema mismatch
        id_type = docs.schema[id_col].dataType
        from pyspark.sql.types import DoubleType, StructField, StructType

        return docs.sparkSession.createDataFrame(
            [],
            StructType(
                [
                    StructField("doc", id_type),
                    StructField("score", DoubleType()),
                ]
            ),
        )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(tokenize(F.col(text_col)))).alias("avgdl"),
    )
    post = doc_postings(docs, id_col, text_col).where(
        F.col("term").isin(list(terms))
    )
    dfreq = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (
        F.col("tf")
        * (k1 + 1.0)
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        post.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc")
        .agg(F.round(F.sum(idf * tf_part), 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc").asc()).limit(k)


def rank_by(df: DataFrame, score_col: str, id_col: str) -> DataFrame:
    """Attach a 1-based ``rank`` by (score DESC, id ASC).  Meant for an
    already-limited top-k frame — the empty-partition window is fine on
    k rows and never sees corpus-scale data."""
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    return df.withColumn("rank", F.row_number().over(w))


def rrf_fuse(
    rankings: Sequence[DataFrame],
    id_col: str = "doc",
    k: int = 10,
    c: int = RRF_C,
) -> DataFrame:
    """Reciprocal-rank fusion: score(d) = Σ_r 1/(c + rank_r(d)) over the
    given rankings (each a (id, rank) frame; a document absent from a
    ranking contributes 0).  Returns (id, rrf) top-``k``."""
    if not rankings:
        raise ValueError("need at least one ranking")
    parts = [
        r.select(
            F.col(id_col).alias("id"),
            (F.lit(1.0) / (c + F.col("rank"))).alias("__c"),
        )
        for r in rankings
    ]
    fused = parts[0]
    for p in parts[1:]:
        fused = fused.unionByName(p)
    out = fused.groupBy("id").agg(F.sum("__c").alias("rrf"))
    return out.orderBy(F.col("rrf").desc(), F.col("id").asc()).limit(k)


# ---------------------------------------------------------------------------
# Feature-hashing TF vectorizer (HashingTF re-expressed declaratively)
# ---------------------------------------------------------------------------

HASHTF_DIM = 128


def hashed_tf_vectors(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    d: int = HASHTF_DIM,
) -> DataFrame:
    """Dense d-dim term-frequency vectors via the hashing trick: each
    token buckets to ``md5-fold(token) % d`` (the same 60-bit md5 codec
    the dedup family uses, so the oracle replays it exactly) and the
    vector is the per-bucket token count.

    Train-free vectorization: no vocabulary build, no second pass, no
    driver state — the property that lets a 100 TB corpus vectorize in
    one scan-local-ish pass (explode → two partial-agg shuffles on
    (doc, bucket) then doc).  Docs with zero tokens produce no vector
    (nothing to hash, nothing to search).
    """
    from merkonvectordb_spark.functions.text import tokenize

    # tokenization + md5 bucketing is CPU-bound: spread across all cores
    # rather than inheriting the fixture's 1-2 scan splits
    par = docs.sparkSession.sparkContext.defaultParallelism
    toks = docs.repartition(par).select(
        F.col(id_col).alias("__id"),
        F.explode(tokenize(F.col(text_col))).alias("tok"),
    )
    bucket = (md5_hash60(F.col("tok")) % d).cast("int")
    counts = (
        toks.withColumn("bucket", bucket)
        .groupBy("__id", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    m = counts.groupBy("__id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("bucket", "n"))
        ).alias("__m")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(d - 1)),
        # try_element_at, NOT element_at: under ANSI mode (an external
        # harness session may pin it) element_at on a missing map key
        # THROWS, so the coalesce-to-0 would never run — and nearly
        # every document misses most of the d buckets
        lambda i: F.coalesce(
            F.try_element_at(F.col("__m"), i.cast("int")), F.lit(0)
        ).cast("double"),
    )
    return m.select(F.col("__id").alias(id_col), vec.alias("tf_vec"))


def hashed_tf_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    d: int = HASHTF_DIM,
) -> DataFrame:
    """Sparse hashed-TF representation: ``(id, bucket, n)`` rows — the
    inverted-index form of ``hashed_tf_vectors``, and the one to score
    with at scale (no dense materialization, no per-slot probing)."""
    from merkonvectordb_spark.functions.text import tokenize

    par = docs.sparkSession.sparkContext.defaultParallelism
    toks = docs.repartition(par).select(
        F.col(id_col).alias("__id"),
        F.explode(tokenize(F.col(text_col))).alias("tok"),
    )
    bucket = (md5_hash60(F.col("tok")) % d).cast("int")
    return (
        toks.withColumn("bucket", bucket)
        .groupBy("__id", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumnRenamed("__id", id_col)
    )


def hashed_tf_search(
    docs: DataFrame,
    query_ids,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    d: int = HASHTF_DIM,
) -> DataFrame:
    """Cosine top-k over hashed-TF vectors computed SPARSELY: the dot
    product is Σ n_a·n_b over shared buckets (inner join on bucket,
    partial-agg sum), norms are per-doc Σ n² — all integer arithmetic
    until the final divide, so the result is bit-identical under ANY
    summation order and both engines agree without sequential folds.

    Scale shape: query-side counts broadcast; the corpus count stream is
    probed map-side and only (doc, query) partials shuffle — the
    inverted-index plan, same family as BM25.  Docs sharing zero buckets
    with a query score 0 and are absent (they can never reach a top-k
    that any sharing doc reaches).
    """
    # two consumers (norms + the dot-product stream) — materialize once,
    # or each re-runs the corpus tokenize+hash+partial-agg lineage
    # (graph.py's measured multi-consumer law).  localCheckpoint, not
    # persist: the returned frame is lazy, so a persist here could never
    # be unpersisted by this function.
    counts = hashed_tf_counts(docs, id_col, text_col, d).localCheckpoint(
        eager=True
    )
    norms = counts.groupBy(id_col).agg(
        F.sum(F.col("n") * F.col("n")).alias("__na2")
    )
    # the query docs' counts are a FILTER of the materialized corpus
    # counts — re-tokenizing the source docs for them would be a third
    # corpus pass
    qcounts = F.broadcast(
        counts.where(F.col(id_col).isin(list(query_ids))).select(
            F.col(id_col).alias("__qid"),
            "bucket",
            F.col("n").alias("__qn"),
        )
    )
    qnorms = F.broadcast(
        qcounts.groupBy("__qid").agg(
            F.sum(F.col("__qn") * F.col("__qn")).alias("__qa2")
        )
    )
    dots = (
        counts.join(qcounts, "bucket")
        .groupBy(id_col, "__qid")
        .agg(F.sum(F.col("n") * F.col("__qn")).alias("__dot"))
    )
    scored = (
        dots.join(norms, id_col)
        .join(qnorms, "__qid")
        .withColumn(
            "__raw",
            F.col("__dot")
            / (F.sqrt(F.col("__na2")) * F.sqrt(F.col("__qa2"))),
        )
    )
    w = Window.partitionBy("__qid").orderBy(F.desc("__raw"), F.asc(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(
            F.col("__qid").alias("query_id"),
            id_col,
            F.round("__raw", 6).alias("score"),
        )
    )
