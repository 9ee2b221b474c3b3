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
