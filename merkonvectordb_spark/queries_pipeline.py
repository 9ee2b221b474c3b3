"""Driver-facing queries for the training-pipeline operators
(``operators.pipeline``): deterministic hash split and context-window
chunking over the ``documents`` fixture, both oracle-checked row-level
against DuckDB (the md5 hash and the token slicing are expressible
identically in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from merkonvectordb_spark.operators.pipeline import chunk_tokens, hash_split
from merkonvectordb_spark.registry import register
from merkonvectordb_spark.schema import load_table


@register(
    "doc_hash_split",
    """
WITH assigned AS (
  SELECT source, n_chars,
         CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split
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
  SELECT doc_id, t, unnest(range(0, greatest(len(t), 1), 48)) AS s
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
