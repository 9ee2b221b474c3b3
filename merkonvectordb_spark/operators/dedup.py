"""Deduplication operators for the LLM-data-pipeline surface.

Exact dedup is a fingerprint hash-groupBy (map-side partial agg → one
shuffled row per distinct fingerprint).  Near-dup (MinHash/LSH, SimHash)
lives here too — every stage is bucketed: no all-pairs comparison ever
materializes, which is the property that keeps 100 TB feasible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from merkonvectordb_spark.functions.text import doc_fingerprint


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact (normalized-content) dedup groups.

    Returns one row per distinct fingerprint: ``fingerprint, survivor_id
    (min id — deterministic), group_sz``.  Keep survivors by joining this
    back on ``(fingerprint, id)``; at scale the join is a broadcast of
    nothing — ``survivors`` is derivable from a window instead if the
    full row payload must be carried through.
    """
    return (
        df.select(
            doc_fingerprint(F.col(text_col)).alias("fingerprint"),
            F.col(id_col).alias("__id"),
        )
        .groupBy("fingerprint")
        .agg(
            F.min("__id").alias("survivor_id"),
            F.count(F.lit(1)).alias("group_sz"),
        )
    )


def keep_survivors(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Drop all but the min-id row of each exact-dup group — the
    materializing form of :func:`exact_dedup`.  One window over the
    fingerprint hash-partitioning (no second scan, no join)."""
    from pyspark.sql import Window

    w = Window.partitionBy(doc_fingerprint(F.col(text_col))).orderBy(
        F.asc(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
