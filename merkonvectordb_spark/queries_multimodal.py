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
