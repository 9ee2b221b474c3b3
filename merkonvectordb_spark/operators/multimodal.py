"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

The Spark-side plumbing — schema, partitioning, Arrow batch shape,
mapInPandas signatures — is real and tested, and so is the decode:
``default_decoder`` runs spec-derived pure-stdlib/numpy codecs
(``operators.media_codec`` — PNG pixel decode, WAV PCM decode, MP4
container-metadata parse; no third-party wheel).  ``decode_content``
still takes any per-row decoder callable (the production slot for
PIL/soundfile/pyav), and ``fake_decoder`` remains the deterministic
byte-level stand-in for opaque-bytes parity pipelines — the fixture
tables carry text bytes, not media, so the REGISTERED queries keep the
mirrorable stand-in while the real path is pinned by tests on real
PNG/WAV/MP4 fixtures.

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
    """The REAL decoder: spec-derived pure-stdlib/numpy codecs
    (``operators.media_codec``) — PNG pixel decode, WAV PCM decode, MP4
    container-metadata parse.  The returned ``checksum`` is computed
    from DECODED values (pixel sum / scaled sample magnitude / duration
    fold), so a corrupt payload that merely *looks* like media cannot
    produce a plausible row.  Raises ``ValueError`` on bytes that are
    not the expected format — ``decode_content(on_error="quarantine")``
    turns that raise into a per-row error column instead of a stage
    failure.  Inject ``fake_decoder`` for opaque-bytes pipelines (the
    oracle parity path) or a library-backed callable
    (PIL/soundfile/pyav) for formats beyond PNG/WAV/MP4-metadata."""
    import numpy as np

    from merkonvectordb_spark.operators import media_codec as mc

    if modality == "image":
        px = mc.decode_png(content)
        return {
            "n_bytes": len(content),
            "checksum": int(px.astype(np.int64).sum()),
        }
    if modality == "audio":
        samples, rate = mc.decode_wav(content)
        # integer-scaled total magnitude: deterministic, dtype-stable
        return {
            "n_bytes": len(content),
            "checksum": int(round(float(np.abs(samples).sum()) * 1000)),
        }
    if modality == "video":
        meta = mc.parse_mp4(content)
        return {
            "n_bytes": len(content),
            "checksum": int(meta.get("duration_ms", 0)) * 1000
            + int(meta.get("n_tracks", 0)),
        }
    raise ValueError(f"unknown modality {modality!r}")


def fake_decoder(modality: str, content: bytes) -> dict[str, Any]:
    """Deterministic stand-in decode: byte stats only."""
    return {
        "n_bytes": len(content),
        "checksum": sum(content[:64]) if content else 0,
    }


FEATURE_DIM = 8


def _hash_features(b: bytes, dim: int) -> list[float]:
    """Deterministic md5-fold stand-in encoder (the oracle parity path):
    component i = ((fold60(md5(content || ':' || i)) mod 2001) - 1000)
    / 1000 ∈ [-1, 1] — mirrorable bit-for-bit in DuckDB SQL."""
    return [
        ((py_md5_hash60(b + b":" + str(i).encode()) % 2001) - 1000) / 1000.0
        for i in range(dim)
    ]


def _media_features(modality: str, b: bytes, dim: int) -> list[float]:
    """The REAL encoder path: decode first (media_codec), then the
    classic pre-neural descriptor per modality — luminance patch grid
    for images, log-mel band energies for audio, container-metadata
    vector for video (frame decode needs a codec library; the metadata
    half is real).  Undecodable bytes raise — never embed garbage
    silently; route corrupt rows through
    ``decode_content(on_error="quarantine")`` first when the input is
    untrusted."""
    import numpy as np

    from merkonvectordb_spark.operators import media_codec as mc

    if modality == "image":
        return mc.image_patch_features(mc.decode_png(b), dim)
    if modality == "audio":
        samples, rate = mc.decode_wav(b)
        return mc.mel_features(samples, rate, dim)
    if modality == "video":
        meta = mc.parse_mp4(b)
        handlers = set(meta.get("handlers", []))
        v = [
            min(1.0, meta.get("duration_ms", 0) / 3_600_000.0),
            min(1.0, meta.get("n_tracks", 0) / 8.0),
            1.0 if "vide" in handlers else 0.0,
            1.0 if "soun" in handlers else 0.0,
            min(1.0, len(b) / 2**30),
        ]
        return (v + [0.0] * dim)[:dim]
    raise ValueError(f"unknown modality {modality!r}")


def extract_features(
    df: DataFrame, dim: int = FEATURE_DIM, encoder: str = "hash"
) -> DataFrame:
    """Content bytes → ``ARRAY<DOUBLE>`` feature vector via
    ``mapInPandas`` (the slot where a CLIP/wav2vec encoder would run).

    ``encoder="hash"`` (default): the deterministic md5-fold stand-in —
    the DuckDB oracle mirrors it bit-for-bit, so it stays the parity
    path.  ``encoder="media"``: the REAL decode-then-featurize path
    (PNG patch grid / WAV log-mel / MP4 metadata vector) for rows whose
    content is actual media bytes.  Same schema, same Arrow batch
    shape, same downstream search — swapping the callable is the whole
    difference, which is the design contract of the slot.
    """
    if encoder not in ("hash", "media"):
        raise ValueError(f"unknown encoder {encoder!r}")
    featfn = _hash_features if encoder == "hash" else _media_features

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for m, c in zip(pdf["modality"], pdf["content"]):
                b = bytes(c) if c is not None else b""
                feats.append(
                    featfn(b, dim)
                    if encoder == "hash"
                    else featfn(m, b, dim)
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
    on_error: str = "raise",
) -> DataFrame:
    """Run ``decoder`` over every row's content via ``mapInPandas`` —
    Arrow-batched, one Python worker pass per partition.

    ``on_error`` (ADVICE r6): ``"raise"`` (default) fails the stage
    fast on the first corrupt payload — right for fixture pipelines
    where a decode error IS the bug.  ``"quarantine"`` keeps the row
    with NULL ``n_bytes``/``checksum`` and the exception text in an
    extra ``error`` STRING column — the web-scale posture, where a few
    corrupt blobs per billion must not kill a 100 TB decode pass;
    filter ``error IS NOT NULL`` into a quarantine sink and keep going.
    """
    if on_error not in ("raise", "quarantine"):
        raise ValueError(f"on_error must be 'raise' or 'quarantine', got {on_error!r}")
    quarantine = on_error == "quarantine"

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes: list = []
            checksum: list = []
            errs: list = []
            for m, c in zip(pdf["modality"], pdf["content"]):
                try:
                    d = decoder(m, bytes(c) if c is not None else b"")
                    n_bytes.append(d["n_bytes"])
                    checksum.append(d["checksum"])
                    errs.append(None)
                except Exception as e:
                    if not quarantine:
                        raise
                    n_bytes.append(None)
                    checksum.append(None)
                    errs.append(f"{type(e).__name__}: {e}"[:200])
            data = {
                "doc_id": pdf["doc_id"],
                "modality": pdf["modality"],
                # nullable Int64: plain lists with None would land as
                # float64+NaN and fail the Arrow cast back to LONG
                "n_bytes": pd.array(n_bytes, dtype="Int64"),
                "checksum": pd.array(checksum, dtype="Int64"),
            }
            if quarantine:
                data["error"] = errs
            yield pd.DataFrame(data)

    ddl = DECODED_DDL + (", error STRING" if quarantine else "")
    return df.mapInPandas(_decode, ddl)
