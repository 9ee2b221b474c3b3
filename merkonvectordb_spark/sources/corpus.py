"""JSONL corpus source/sink — the interchange format of LLM training
corpora (one JSON document per line: The Pile, RedPajama, Dolma all ship
this way).

Scale rules baked into the API:

* **Schema is explicit, never inferred.**  Inference is a full extra
  pass over the data before the real job starts — at 100 TB that is the
  difference between one scan and two.  ``DOCUMENT_SCHEMA`` matches the
  driver's ``documents`` table so JSONL corpora drop straight into every
  text/dedup/curation operator in this package.
* **Line-delimited means splittable.**  Each worker seeks to a newline
  and parses independently — a single 1 TB ``.jsonl`` still fans out
  across the cluster.  (Gzip breaks this: one ``.jsonl.gz`` = one task.
  Prefer zstd/bzip2 or many medium files; this is a data-layout fact the
  reader can't fix.)
* **Malformed lines are data, not exceptions.**  PERMISSIVE mode routes
  unparseable lines to a corrupt-record column instead of failing the
  job N hours in; ``split_corrupt`` separates them for quarantine.
  FAILFAST is the wrong default for web-scale corpora where some
  fraction of lines is always broken.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

#: the driver fixture's ``documents`` shape — the package-wide corpus schema
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
    capture_corrupt: bool = True,
) -> DataFrame:
    """Read line-delimited JSON with an explicit schema.

    With ``capture_corrupt`` (the default), unparseable lines surface as
    rows whose ``_corrupt_record`` column holds the raw line and whose
    data columns are NULL — the reader never throws mid-scan.  The
    corrupt column is appended to ``schema``; pass the result through
    ``split_corrupt`` to quarantine.

    Column pruning still applies: Spark's JSON parser materializes only
    the fields the query needs, so ``select('doc_id')`` does not pay for
    parsing ``text``.
    """
    if capture_corrupt:
        full = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
        )
        return (
            spark.read.schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path)
        )
    return spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Separate clean rows from quarantined raw lines.

    Returns ``(clean, corrupt)``: clean rows without the corrupt column,
    and corrupt rows as ``(raw_line)`` for repair/audit.

    Spark refuses a query that filters ONLY on the corrupt column of an
    un-materialized JSON scan (the parser would have to re-run per
    filter — SPARK-21610); caching the parsed frame first is the
    documented contract and also what you want operationally: one parse
    feeds both branches.  The cache frees via GC + ContextCleaner once
    the caller drops both returned frames; callers splitting many
    corpora in one session can `clean.unpersist()` the shared cache
    through either handle when done.
    """
    if CORRUPT_COL not in df.columns:
        raise ValueError(f"dataframe has no {CORRUPT_COL} column")
    df = df.cache()
    clean = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = df.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, corrupt


def write_jsonl(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    compression: str | None = None,
) -> None:
    """Write a corpus back out as line-delimited JSON.

    OVERWRITES whatever already exists at ``path`` (mode='overwrite' —
    not Spark's error-if-exists default; callers protecting existing
    data must check the path first).  ``partition_by`` gives hive-style
    directory partitioning (e.g. by ``source`` or ``lang``) so
    downstream readers partition-prune; ``compression`` accepts any
    Spark codec name — prefer a splittable one (``bzip2``) or none;
    ``gzip`` output is read back single-task per file."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
