"""Structured Streaming surface: file-source ingest, watermarked window
aggregation, foreachBatch → upsert into the vector store, and a custom
stateful sessionizer (applyInPandasWithState)."""

from merkonvectordb_spark.streaming.ingest import (
    foreach_batch_upsert,
    stream_events,
    windowed_counts,
)
from merkonvectordb_spark.streaming.stateful import sessionize_stream

__all__ = [
    "stream_events",
    "windowed_counts",
    "foreach_batch_upsert",
    "sessionize_stream",
]
