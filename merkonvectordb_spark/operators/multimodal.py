"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

The Spark-side plumbing — schema, partitioning, Arrow batch shape,
mapInPandas signatures — is real and tested; the actual media decode is
STUBBED (this container ships no image/audio libraries): ``decode_content``
takes any per-row decoder callable, ``default_decoder`` raises
``NotImplementedError`` with the library it would use, and
``fake_decoder`` is a deterministic byte-level stand-in the tests pin.

Scale design:

* content stays an opaque ``BINARY`` column in parquet — Spark never
  interprets it JVM-side; column pruning skips the (dominant) bytes for
  metadata-only queries;
* decode runs in ``mapInPandas`` — Arrow moves each partition's batches
  to Python once; the decoder sees ``bytes`` objects, no per-row Python
  UDF dispatch;
* rows are heavy (MBs per image/video): at 100 TB, repartition so a
  batch of rows fits executor memory (``spark.sql.files.maxPartitionBytes``
  governs scan splits; ``maxRecordsPerBatch`` bounds the Arrow hop);
* frame sampling is a pure expression (``sequence``) producing the frame
  timestamp plan BEFORE any decode — the decoder then extracts only the
  planned frames per row.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from merkonvectordb_spark.functions.hashing import py_md5_hash60

MULTIMODAL_DDL = (
    "doc_id LONG, modality STRING, content BINARY, "
    "meta STRUCT<mime: STRING, width: INT, height: INT, "
    "duration_ms: INT, sample_rate: INT>"
)

DECODED_DDL = "doc_id LONG, modality STRING, n_bytes LONG, checksum LONG"

_MODALITIES = ["image", "audio", "video"]
_MIMES = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}


def modality_of(doc_id: Column) -> Column:
    return (
        F.when(doc_id % 3 == 0, "image")
        .when(doc_id % 3 == 1, "audio")
        .otherwise("video")
    )


def derive_multimodal(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from the ``documents`` fixture:
    content = the UTF-8 text bytes, modality by doc_id, typed metadata
    derived from n_chars.  Stands in for a real ingest of media files —
    every downstream operator treats content as opaque bytes either way."""
    mod = modality_of(F.col("doc_id"))
    return docs.select(
        "doc_id",
        mod.alias("modality"),
        F.col("text").cast("binary").alias("content"),
        F.struct(
            F.when(mod == "image", _MIMES["image"])
            .when(mod == "audio", _MIMES["audio"])
            .otherwise(_MIMES["video"])
            .alias("mime"),
            (16 + F.col("n_chars") % 640).cast("int").alias("width"),
            (16 + F.col("n_chars") % 480).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
            F.lit(16000).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def frame_sample_plan(df: DataFrame, fps: float = 1.0) -> DataFrame:
    """Frame timestamps (ms) to extract per video row — a pure expression
    computed BEFORE any decode, so the decoder touches only planned
    frames.  Non-video rows get an empty plan."""
    if not (0 < fps <= 1000):
        # fps > 1000 floors the ms step to 0 (sequence() rejects a zero
        # step at runtime); fps <= 0 divides by zero at plan time
        raise ValueError(f"fps must be in (0, 1000], got {fps}")
    step = int(1000 / fps)
    return df.withColumn(
        "frame_ms",
        F.when(
            (F.col("modality") == "video")
            & F.col("meta.duration_ms").isNotNull()
            # a zero-length video has no frame to sample: without this
            # guard greatest(duration-1, 0) turns the empty range into
            # sequence(0,0)=[0] and the decoder is asked for frame t=0
            & (F.col("meta.duration_ms") > 0),
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms").cast("long") - 1, F.lit(0)),
                F.lit(step),
            ),
        ).otherwise(F.array().cast("array<long>")),
    )


def default_decoder(modality: str, content: bytes) -> dict[str, Any]:
    """The real decoder slot.  Decoding needs PIL (image), soundfile/wave
    (audio), or pyav/ffmpeg (video) — none are shipped in this
    environment, so the default is an explicit stub."""
    raise NotImplementedError(
        f"media decode for {modality!r} requires an image/audio library "
        "(PIL / soundfile / pyav); inject a decoder callable instead"
    )


def fake_decoder(modality: str, content: bytes) -> dict[str, Any]:
    """Deterministic stand-in decode: byte stats only."""
    return {
        "n_bytes": len(content),
        "checksum": sum(content[:64]) if content else 0,
    }


FEATURE_DIM = 8


def extract_features(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature extraction stub with REAL plumbing: content bytes →
    ``ARRAY<DOUBLE>`` feature vector via ``mapInPandas`` (the slot where
    a CLIP/wav2vec encoder would run; here a deterministic md5-fold so
    the DuckDB oracle can mirror it bit-for-bit).  Component i =
    ((fold60(md5(content || ':' || i)) mod 2001) - 1000) / 1000 ∈ [-1, 1].
    """
    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for c in pdf["content"]:
                b = bytes(c) if c is not None else b""
                feats.append(
                    [
                        (
                            (
                                py_md5_hash60(b + b":" + str(i).encode())
                                % 2001
                            )
                            - 1000
                        )
                        / 1000.0
                        for i in range(dim)
                    ]
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "feature": feats,
                }
            )

    return df.mapInPandas(
        _feat, "doc_id LONG, modality STRING, feature ARRAY<DOUBLE>"
    )


def decode_content(
    df: DataFrame,
    decoder: Callable[[str, bytes], dict[str, Any]] = default_decoder,
) -> DataFrame:
    """Run ``decoder`` over every row's content via ``mapInPandas`` —
    Arrow-batched, one Python worker pass per partition."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                decoder(m, bytes(c) if c is not None else b"")
                for m, c in zip(pdf["modality"], pdf["content"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [d["n_bytes"] for d in decoded],
                    "checksum": [d["checksum"] for d in decoded],
                }
            )

    return df.mapInPandas(_decode, DECODED_DDL)
