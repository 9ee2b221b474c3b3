"""Schemas + fixture loaders.

Data model (SURVEY.md §1.3): the reference's one-file database of
``Dictionary<string, List<DatabaseEntry>>`` (MerkonDatabase.cs:12-16)
becomes a single ``vectors`` table partitioned by ``collection``; the
four-field ``DatabaseEntry`` (MerkonDatabase.cs:243-254) becomes a typed
row with the embedding parsed ONCE at ingest into ``ARRAY<FLOAT>``
(the reference JSON-decodes it per row per query,
MerkonMemoryStore.cs:230 — §4.1 anti-optimization we leave behind).
``ingest_seq`` provides the stable-sort tie-break the reference gets from
.NET's stable OrderByDescending (MerkonMemoryStore.cs:146).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# --- the vector-store table (reference: DatabaseEntry, MerkonDatabase.cs:243-254)
VECTORS_SCHEMA = T.StructType(
    [
        T.StructField("collection", T.StringType(), False),
        T.StructField("key", T.StringType(), True),
        T.StructField("metadata", T.StringType(), True),  # raw JSON, fidelity column
        T.StructField("embedding", T.ArrayType(T.FloatType(), False), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("ingest_seq", T.LongType(), False),
    ]
)

# DDL form for createDataFrame([], ...) / read.schema(...)
VECTORS_SCHEMA_DDL = (
    "collection STRING, key STRING, metadata STRING, "
    "embedding ARRAY<FLOAT>, ts TIMESTAMP, ingest_seq LONG"
)

# SK MemoryRecordMetadata fields (public Semantic Kernel 1.0.0-beta1 API;
# produced at MerkonMemoryStore.cs:247, parsed at :232)
METADATA_STRUCT = T.StructType(
    [
        T.StructField("is_reference", T.BooleanType(), True),
        T.StructField("external_source_name", T.StringType(), True),
        T.StructField("id", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("additional_metadata", T.StringType(), True),
    ]
)

# collections registry (SURVEY §2.3 W9): preserves exists/list semantics for
# empty collections, which a partition-column design alone can't represent.
COLLECTIONS_SCHEMA = T.StructType(
    [
        T.StructField("collection", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

# driver-provided testdata tables (TESTDATA.md)
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# (session-id, sf_dir, table) -> (session-ref, resolved DataFrame); the
# session ref keeps the keyed object alive so id() keys are never
# recycled — see load_table
_TABLE_CACHE: dict[tuple[int, str, str], tuple[SparkSession, DataFrame]] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver parquet table. Parquet scan → pushdown + pruning free.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; with ``spark.sql.legacy.parquet.nanosAsLong``
    it surfaces as LONG nanos — normalize to a microsecond TIMESTAMP
    (floor division, matching DuckDB's TIMESTAMP_NS → TIMESTAMP cast) so
    downstream plans see a real timestamp column.

    The conf is set HERE, not only in ``session.get_spark``: external
    harnesses (the driver's correctness runner) hand us their own
    SparkSession, and the conf is runtime-settable — relying on session
    bootstrap made every events-table query fail under such sessions.
    """
    from merkonvectordb_spark import probe

    # environment fingerprint BEFORE any conf pinning, so the harness's
    # own session values are captured (VERDICT r4 next-round #2)
    probe.record_env_once(spark, sf_dir)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # UTC must hold in EXTERNAL harness sessions too: the NTZ→TIMESTAMP
    # normalization below and all timestamp rendering assume it, and a
    # non-UTC session would shift every events instant by the zone offset
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Per-session TABLE-HANDLE cache (metadata only — never data): a
    # fresh spark.read.parquet costs ~0.3-0.4 s of driver work (file
    # listing, footer read, relation analysis) EVERY call, which
    # dominates sub-second analytic queries when each one re-resolves
    # its inputs.  A catalog-backed deployment gets this for free from
    # the metastore's relation cache; this dict is the same idea for
    # path tables.  Keyed by the live session OBJECT (the cached frame
    # pins it, so ids can't be recycled); testdata is immutable, so a
    # cached plan can never go stale.  A new/replacement session misses
    # and re-resolves under its own confs.
    key = (id(spark), os.path.normpath(sf_dir), name)
    hit = _TABLE_CACHE.get(key)
    if hit is not None:
        return hit[1]
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for f in df.schema.fields:
        if f.name == "ts" and isinstance(f.dataType, T.LongType):
            # integral `div`, NOT `/1000` + floor: the double round-trip
            # loses precision above 2^53 ns and lands ±1 µs off
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(f.dataType, T.TimestampNTZType):
            # Readers with NTZ inference surface parquet
            # TIMESTAMP(isAdjustedToUTC=false) as TIMESTAMP_NTZ.  Session
            # TZ is pinned UTC just above, so NTZ→TIMESTAMP maps wall-clock
            # to the same UTC instant a non-inferring reader produces —
            # downstream unix_micros()/window()/literal comparisons see one
            # canonical TIMESTAMP either way.  Applied to EVERY timestamp
            # column (l_shipdate, o_orderdate, ts), not just events.ts:
            # r4's tpch_q12 driver hash-fail is in the
            # environment-sensitivity class this removes.
            df = df.withColumn(f.name, F.col(f.name).cast(T.TimestampType()))
    _TABLE_CACHE[key] = (spark, df)
    return df


def parse_metadata(
    df: DataFrame, src_col: str = "metadata", out_col: str = "metadata_struct"
) -> DataFrame:
    """F3 as the DECLARED design (SURVEY §1.3): decode the metadata JSON
    once into a typed ``METADATA_STRUCT`` column, after which every field
    access is a struct projection (column-pruned, codegen) instead of a
    per-access ``get_json_object`` re-parse.  Unknown JSON fields are
    dropped, missing ones are NULL — SK's lenient contract
    (MerkonMemoryStore.cs:232)."""
    from pyspark.sql import functions as F

    return df.withColumn(out_col, F.from_json(F.col(src_col), METADATA_STRUCT))


def register_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; returns the DataFrames."""
    out: dict[str, DataFrame] = {}
    for name in TESTDATA_TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
