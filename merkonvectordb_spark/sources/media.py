"""Binary media-file source: directories of images/audio/video files →
the package's multimodal table (``operators.multimodal.MULTIMODAL_DDL``).

Built on Spark's ``binaryFile`` format, which is the right primitive at
scale:

* each file is one row ``(path, modificationTime, length, content)`` —
  executors read files in parallel straight from the store, nothing
  routes through the driver;
* ``pathGlobFilter`` prunes by extension BEFORE reading bytes, and
  ``recursiveFileLookup`` walks nested layouts;
* metadata-only queries (count, size histograms, modality breakdown)
  prune the ``content`` column — with the parquet round-trip
  (`to_multimodal` then write) the bytes column is skipped on scan;
* ``spark.sql.files.maxPartitionBytes`` governs how many files pack
  into one task; media rows are MB-heavy, so leave bin-packing to the
  scan rather than repartitioning rows after the fact.

MIME/modality is inferred from the extension — a pure column
expression, no UDF.  Actual decode stays behind
``operators.multimodal.decode_content`` (stubbed in this container).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: extension → (modality, mime); lowercase keys
EXT_MAP: dict[str, tuple[str, str]] = {
    "png": ("image", "image/png"),
    "jpg": ("image", "image/jpeg"),
    "jpeg": ("image", "image/jpeg"),
    "gif": ("image", "image/gif"),
    "wav": ("audio", "audio/wav"),
    "mp3": ("audio", "audio/mpeg"),
    "flac": ("audio", "audio/flac"),
    "mp4": ("video", "video/mp4"),
    "mkv": ("video", "video/x-matroska"),
    "webm": ("video", "video/webm"),
}


def _ext(path: Column) -> Column:
    return F.lower(F.regexp_extract(path, r"\.([A-Za-z0-9]+)$", 1))


def modality_from_path(path: Column) -> Column:
    e = _ext(path)
    out = F.lit(None).cast("string")
    expr = None
    for ext, (mod, _) in EXT_MAP.items():
        expr = (
            F.when(e == ext, mod) if expr is None else expr.when(e == ext, mod)
        )
    return expr.otherwise(out)


def mime_from_path(path: Column) -> Column:
    e = _ext(path)
    expr = None
    for ext, (_, mime) in EXT_MAP.items():
        expr = (
            F.when(e == ext, mime)
            if expr is None
            else expr.when(e == ext, mime)
        )
    return expr.otherwise(F.lit("application/octet-stream"))


def read_media_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Read a directory of media files as one row per file.

    ``glob`` (e.g. ``*.png``) prunes candidates before any bytes are
    read.  Returns the raw binaryFile shape plus derived ``modality``
    and ``mime`` columns; files with unrecognized extensions carry
    ``modality = NULL`` — filter or quarantine, don't guess."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    if recursive:
        r = r.option("recursiveFileLookup", "true")
    df = r.load(path)
    return df.select(
        "path",
        "length",
        "content",
        modality_from_path(F.col("path")).alias("modality"),
        mime_from_path(F.col("path")).alias("mime"),
    )


def to_multimodal(files: DataFrame) -> DataFrame:
    """Map the file rows into ``MULTIMODAL_DDL`` shape: a stable
    PATH-addressed ``doc_id`` (first 60 bits of xxhash64 over the path
    — deterministic across re-ingests, no driver-side counter, no
    single-partition window), the opaque bytes, and the typed meta
    struct with decode-dependent fields NULL until a decoder fills
    them.  Path-addressed, NOT content-addressed, by design: the id
    stays stable when a file's bytes are updated in place (the
    re-ingest REPLACES the doc); content-keyed dedup is the dedup
    family's job downstream."""
    return files.where(F.col("modality").isNotNull()).select(
        # top 60 bits of the hash: matches the documented 60-bit codec
        # and is non-negative by construction (abs(Long.MIN_VALUE) stays
        # negative in the JVM, and abs folds x and -x together)
        F.expr("shiftrightunsigned(xxhash64(path), 4)").alias("doc_id"),
        "modality",
        "content",
        F.struct(
            F.col("mime").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def write_media_parquet(df: DataFrame, path: str) -> None:
    """Persist the multimodal table partitioned by modality: downstream
    image-only / audio-only jobs partition-prune, and metadata queries
    column-prune past the heavy ``content`` bytes.

    The overwrite mode is pinned STATIC per-write: ``VectorStore``
    flips the session-global ``partitionOverwriteMode`` to dynamic, and
    a dynamic overwrite here would keep any modality partition the new
    frame happens not to contain — stale rows resurfacing on re-ingest."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("modality")
        .parquet(path)
    )


def demo_media_dir(root: str) -> str:
    """Write a tiny deterministic media tree (fake bytes, real
    extensions) for tests/demos; returns the directory path."""
    d = os.path.join(root, "media")
    os.makedirs(os.path.join(d, "nested"), exist_ok=True)
    files = {
        "a.png": b"\x89PNG-fake-" + b"a" * 64,
        "b.wav": b"RIFF-fake-" + b"b" * 128,
        "nested/c.mp4": b"mp4-fake-" + b"c" * 256,
        "notes.txt": b"not media",
    }
    for name, payload in files.items():
        with open(os.path.join(d, name), "wb") as f:
            f.write(payload)
    return d
