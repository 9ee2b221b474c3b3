"""Structured Streaming surface: file-source ingest, watermarked window
aggregation, and foreachBatch → upsert into the vector store."""

from merkonvectordb_spark.streaming.ingest import (
    foreach_batch_upsert,
    stream_events,
    windowed_counts,
)

__all__ = ["stream_events", "windowed_counts", "foreach_batch_upsert"]
