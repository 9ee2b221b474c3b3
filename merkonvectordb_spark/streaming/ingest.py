"""Streaming ingest (SURVEY §7.6: Structured Streaming `foreachBatch` →
MERGE, watermark on event time).

The reference has no streaming surface (SURVEY §2.7); this is the
north-star extension: the SAME logical aggregations as the batch
``queries_events`` module, run incrementally.  Batch ≡ streaming is
asserted by ``tests/test_streaming.py``.

Scale notes:

* the file source lists + reads incrementally — on a cluster this is a
  cloud-storage listing per trigger; ``maxFilesPerTrigger`` bounds batch
  size so state and shuffle stay sized to the micro-batch, not the
  backlog;
* the watermark bounds window state: late rows beyond it are dropped and
  their window's state evicted — without it, a 100 TB stream's window
  state grows without bound;
* ``foreach_batch_upsert`` reuses the exact batch upsert transform
  (operators.store.upsert via VectorStore) per micro-batch — the
  recommended pattern for sinks without native streaming MERGE.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_RAW_DDL = (
    "event_id LONG, ts LONG, user_id LONG, event_type STRING, "
    "value DOUBLE, props STRING"
)


def stream_events(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over driver-shaped events parquet.

    ``ts`` arrives as LONG via the user-supplied schema, but the UNIT
    depends on the reader build: older readers hand back the raw
    TIMESTAMP(NANOS) int64 (nanos), newer ones pre-truncate to micros.
    Normalize by magnitude: epoch-µs for any date before year ~2260 is
    < 9.2e15, while epoch-ns for any date after 1973 is > 1e17 — the two
    regimes are 10× apart, so the 1e17 cut is unambiguous.
    """
    # same defensive conf load_table applies: an external harness's
    # session may carry a non-UTC zone, shifting every rendered instant
    # (these queries never touch load_table, so pin it here too)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    reader = spark.readStream.schema(EVENTS_RAW_DDL)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(source_dir)
    return raw.withColumn(
        "ts",
        F.timestamp_micros(
            F.when(F.abs(F.col("ts")) > F.lit(10**17), F.expr("ts div 1000"))
            .otherwise(F.col("ts"))
        ),
    )


def windowed_counts(
    events: DataFrame, watermark: str = "2 hours", window: str = "1 hour"
) -> DataFrame:
    """Watermarked tumbling-window aggregation — the streaming twin of
    ``queries_events.q_events_window_agg`` (same grouping, same aggregates
    minus countDistinct, which streaming state cannot hold exactly;
    approx_count_distinct is the streaming-native substitute).

    The grouping key is the WINDOW STRUCT, with ``window_start``
    projected AFTER the aggregation: grouping by
    ``window(...).getField("start")`` strips the event-time watermark
    metadata from the key, so append mode throws
    (STREAMING_OUTPUT_MODE.UNSUPPORTED_OPERATION) and update-mode window
    state is NEVER evicted — unbounded state growth on a long-running
    stream, the exact failure the watermark exists to prevent."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("__w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("__w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def foreach_batch_upsert(
    records: DataFrame,
    upsert_fn: Callable[[DataFrame], None],
    checkpoint_dir: str,
):
    """``writeStream.foreachBatch`` → the batch upsert transform, one
    transactional MERGE per micro-batch (idempotent on replay because
    upsert is idempotent per key).  Returns the started query; callers
    ``awaitTermination`` (the availableNow trigger stops at backlog end).
    """

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        upsert_fn(batch_df)

    return (
        records.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
