"""Embedding-space diagnostics: per-group centroids and outlier mining.

Training-data curation over an embedded corpus routinely asks two
questions the relational surface can answer without any index:

* what does each class/label/source look like on average? — the
  per-group centroid (element-wise mean vector), the building block of
  class prototypes, drift monitoring, and duplicate-cluster summaries;
* which examples sit FURTHEST from their own group's centroid? — the
  classic mislabeled/noisy-example screen (a "cat" embedding far from
  the cat centroid is a label to audit).

Plan shapes (both 100 TB-safe):

* centroid: posexplode → (group, pos) partial-agg mean → collect the
  dim-length array per group.  Shuffle volume is |corpus|·dim value
  rows with map-side combine; the result is groups × dim — tiny.
  Components round to a fixed dp (same argument as
  ``operators.ann.kmeans_refine``: cross-engine mean-order parity, and
  prototypes don't need 52 mantissa bits).
* outliers: broadcast the (tiny) centroid table back, score each row's
  cosine against its OWN group centroid scan-locally, bottom-k per
  group via a per-group window (WindowGroupLimit — ≤ groups·k rows
  shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from merkonvectordb_spark.functions.vector import cosine_similarity


def grouped_centroids(
    df: DataFrame,
    group_col: str,
    emb_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """``(group_col, centroid)`` — element-wise mean vector per group."""
    means = (
        df.select(
            F.col(group_col),
            F.posexplode(F.col(emb_col)).alias("pos", "val"),
        )
        .groupBy(group_col, "pos")
        .agg(F.round(F.avg(F.col("val").cast("double")), round_dp).alias("v"))
    )
    return means.groupBy(group_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "v"))),
            lambda x: x["v"],
        ).alias("centroid")
    )


def centroid_outliers(
    df: DataFrame,
    group_col: str,
    id_col: str,
    emb_col: str = "embedding",
    k: int = 5,
    round_dp: int = 6,
) -> DataFrame:
    """Bottom-``k`` rows per group by cosine to their own group's
    centroid: ``(group_col, id_col, cos_to_centroid)``, deterministic
    tie-break on ``id_col``.  NaN/zero-norm rows are excluded (they have
    no direction to compare)."""
    cents = grouped_centroids(df, group_col, emb_col, round_dp)
    scored = (
        df.select(group_col, id_col, emb_col)
        .join(F.broadcast(cents), group_col)
        .withColumn(
            "__cos", cosine_similarity(F.col(emb_col), F.col("centroid"))
        )
        .where(F.col("__cos").isNotNull() & (~F.isnan("__cos")))
    )
    w = Window.partitionBy(group_col).orderBy(
        F.asc("__cos"), F.asc(id_col)
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(
            group_col,
            id_col,
            F.round("__cos", round_dp).alias("cos_to_centroid"),
        )
    )
