"""Multimodal-column queries: typed-metadata + byte-level features over
the opaque BINARY content column, all JVM-side (the decode path is
Python/mapInPandas and pytest-covered; SQL can't express it — SURVEY
notes the driver records a weaker check for such ops, so the oracle here
covers exactly the expression-computable surface)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from merkonvectordb_spark.operators.multimodal import (
    derive_multimodal,
    frame_sample_plan,
)
from merkonvectordb_spark.registry import register
from merkonvectordb_spark.schema import load_table


@register(
    "multimodal_features",
    """
WITH mm AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS modality,
         encode(text) AS content,
         text,
         n_chars
  FROM documents
)
SELECT doc_id, modality,
       CAST(octet_length(content) AS BIGINT) AS n_bytes,
       hex(encode(substr(text, 1, 8))) AS header_hex,
       CASE WHEN modality = 'video'
            THEN CAST((greatest(n_chars * 10 - 1, 0) // 1000) + 1 AS BIGINT)
            ELSE 0 END AS n_frames
FROM mm
""".strip(),
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level features of opaque media content (length, header magic)
    plus the frame-sampling plan size for video rows — everything the
    engine computes WITHOUT decoding, i.e. the scan-local prefilter stage
    of a real media pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    mm = derive_multimodal(docs)
    planned = frame_sample_plan(mm, fps=1.0)
    # header is first-8-CHARS → UTF-8 bytes → hex (not a byte slice: the
    # oracle engine can't slice BLOBs; for real media, slice content bytes)
    return planned.join(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id",
        "modality",
        F.octet_length("content").cast("long").alias("n_bytes"),
        F.hex(F.substring(F.col("text"), 1, 8).cast("binary")).alias("header_hex"),
        F.size("frame_ms").cast("long").alias("n_frames"),
    )


# ---------------------------------------------------------------------------
# multimodal similarity search: feature extraction (the encoder slot,
# md5-fold stand-in) → modality-pruned cosine top-k.  The full composed
# flow of a media retrieval pipeline, oracle-mirrored end to end.
# ---------------------------------------------------------------------------

_FOLD60 = (
    "list_reduce(list_transform(regexp_split_to_array(substr(md5({x}), 1, 15), ''),"
    " ch -> CAST(strpos('0123456789abcdef', ch) AS BIGINT) - 1),"
    " (acc, d) -> acc * 16 + d)"
)

_FEAT_SQL = (
    "list_transform(generate_series(0, 7), i -> "
    "CAST((("
    + _FOLD60.format(x="text || ':' || CAST(i AS VARCHAR)")
    + " % 2001) - 1000) AS DOUBLE) / 1000.0)"
)

_MM_KNN_ORACLE = f"""
WITH media AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
         text
  FROM documents
),
feats AS (
  SELECT doc_id, modality, {_FEAT_SQL} AS f FROM media
),
q AS (SELECT f AS qv FROM feats WHERE doc_id = 0),
scored AS (
  SELECT feats.doc_id,
         list_dot_product(f, qv)
           / (sqrt(list_dot_product(f, f)) * sqrt(list_dot_product(qv, qv))) AS raw
  FROM feats CROSS JOIN q
  WHERE modality = 'image'
    AND sqrt(list_dot_product(f, f)) > 0
    AND sqrt(list_dot_product(qv, qv)) > 0
)
SELECT doc_id, round(raw, 6) AS score
FROM scored
ORDER BY raw DESC, doc_id ASC
LIMIT 5
""".strip()


@register("multimodal_knn", _MM_KNN_ORACLE)
def q_multimodal_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media similarity search end to end: binary content → feature
    vector (mapInPandas encoder slot; deterministic md5-fold stand-in) →
    modality filter (at scale: partition pruning on the modality column)
    → exact cosine top-5 as TakeOrderedAndProject.  The oracle mirrors
    the extraction AND the search."""
    from merkonvectordb_spark.functions.vector import cosine_similarity, l2_norm
    from merkonvectordb_spark.operators.multimodal import extract_features

    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(derive_multimodal(docs)).persist()
    qv = feats.where(F.col("doc_id") == 0).select("feature").first()[0]
    qlit = F.array(*[F.lit(float(v)) for v in qv])
    images = feats.where(
        (F.col("modality") == "image") & (l2_norm(F.col("feature")) > 0)
    )
    scored = images.withColumn(
        "raw", cosine_similarity(F.col("feature"), qlit)
    ).where(F.col("raw").isNotNull() & (~F.isnan("raw")))
    return (
        scored.orderBy(F.desc("raw"), F.asc("doc_id"))
        .limit(5)
        .select("doc_id", F.round("raw", 6).alias("score"))
    )
