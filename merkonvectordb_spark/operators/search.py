"""Brute-force k-NN search — the reference's one real query
(GetNearestMatchesAsync, MerkonMemoryStore.cs:117-150) re-expressed as a
Catalyst plan: scan → score → NaN-safe threshold → TakeOrderedAndProject.

Plan shape at scale (verified via .explain):

* the collection filter partition-prunes the scan (S3);
* dropping the embedding column prunes the dominant bytes at the parquet
  scan when ``with_embeddings=False`` — column pruning happens BEFORE the
  scan, unlike the reference which always materializes embeddings
  (MerkonMemoryStore.cs:133 vs :140, SURVEY §4.1);
* ``orderBy(desc).limit(k)`` plans as TakeOrderedAndProject: per-partition
  heap top-k + driver merge — O(N log k), no full shuffle/sort.  At 1000
  executors this is a single reduce of 1000·k rows, not a 100 TB sort;
* batch form broadcasts the query set and computes per-query top-k with a
  window — one corpus scan for Q queries instead of Q scans.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from merkonvectordb_spark.functions.vector import (
    cosine_similarity,
    cosine_similarity_pandas,
    vector_literal,
)


def _nan_safe_at_least(score: Column, threshold: float) -> Column:
    """Inclusive threshold with explicit NaN exclusion.

    The reference's ``similarity >= minRelevanceScore`` in C# is false for
    NaN (MerkonMemoryStore.cs:138).  Spark ORDERS NaN as largest and its
    ``>=`` can admit NaN, so parity needs the explicit guard (SURVEY §2.2 P3).
    """
    return (~F.isnan(score)) & (score >= F.lit(float(threshold)))


def knn(
    vectors: DataFrame,
    query: Sequence[float],
    k: int,
    min_score: float = 0.0,
    collection: str | None = None,
    with_embeddings: bool = False,
    embedding_col: str = "embedding",
    tie_break: str | None = "ingest_seq",
    use_pandas: bool = False,
) -> DataFrame:
    """Top-k rows by cosine similarity to ``query``.

    Parity quirks pinned (SURVEY §5.2.3): limit ≤ 0 ⇒ empty
    (MerkonMemoryStore.cs:125-128); threshold inclusive; zero-vector NaN
    excluded; empty/NULL keys excluded (the reference purges them before
    every search, MerkonDatabase.cs:72-88 — we filter instead of mutating);
    ties break by ingest order (stable sort, MerkonMemoryStore.cs:146);
    ``with_embeddings=False`` drops the embedding column entirely (the
    relational rendering of the reference's empty-vector projection,
    MerkonMemoryStore.cs:286).
    """
    if k <= 0:
        empty = vectors.limit(0).withColumn("score", F.lit(0.0))
        return empty if with_embeddings else empty.drop(embedding_col)

    df = vectors
    if collection is not None:
        df = df.where(F.col("collection") == collection)
    if "key" in df.columns:
        df = df.where(F.col("key").isNotNull() & (F.col("key") != ""))
    # rows whose embedding can't be scored (dimension mismatch / empty) are
    # excluded — the reference would throw; a distributed engine must not.
    df = df.where(F.size(F.col(embedding_col)) == len(query))

    if use_pandas:
        score = cosine_similarity_pandas(query)(F.col(embedding_col))
    else:
        score = cosine_similarity(F.col(embedding_col), vector_literal(query))
    df = df.withColumn("score", F.round(score, 6))
    df = df.where(_nan_safe_at_least(F.col("score"), min_score))
    order = [F.desc("score")]
    if tie_break and tie_break in df.columns:
        order.append(F.asc(tie_break))
    df = df.orderBy(*order).limit(k)
    if not with_embeddings:
        df = df.drop(embedding_col)
    return df


def knn_batch(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    min_score: float = 0.0,
    embedding_col: str = "embedding",
    query_embedding_col: str = "embedding",
    query_id_col: str = "query_id",
    tie_break: str | None = "ingest_seq",
) -> DataFrame:
    """Per-query top-k for a whole query SET in one corpus scan.

    Not in the reference (its API is one query at a time) but required at
    Spark scale (SURVEY §2.4 batch form): broadcast the (small) query set,
    cross-join against the corpus — Catalyst plans BroadcastNestedLoopJoin,
    so the 100 TB side streams once — then window top-k per query.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("__qid"),
            F.col(query_embedding_col).alias("__qvec"),
        )
    )
    corpus = vectors
    if "key" in corpus.columns:
        corpus = corpus.where(F.col("key").isNotNull() & (F.col("key") != ""))
    scored = (
        corpus.crossJoin(q)
        .where(F.size(F.col(embedding_col)) == F.size(F.col("__qvec")))
        .withColumn(
            "score",
            F.round(cosine_similarity(F.col(embedding_col), F.col("__qvec")), 6),
        )
        .where(_nan_safe_at_least(F.col("score"), min_score))
    )
    order = [F.desc("score")]
    if tie_break and tie_break in vectors.columns:
        order.append(F.asc(tie_break))
    w = Window.partitionBy("__qid").orderBy(*order)
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn", "__qvec", embedding_col)
        .withColumnRenamed("__qid", query_id_col)
    )
