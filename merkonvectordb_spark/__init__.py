"""merkonvectordb_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of Gravicode/MerkonVectorDB.

The reference (/root/reference, C#) is a tiny in-memory vector store:
collections of (key, metadata JSON, float32 embedding, timestamp) rows with
upsert/delete CRUD and a brute-force cosine top-k search
(MerkonMemoryStore.cs:117-150). This engine re-expresses that surface —
plus the LLM-data-pipeline operators a 100 TB training-data pipeline needs
(dedup, similarity search, text analysis, multimodal columns, streaming
ingest) — as idiomatic Spark DataFrame / SQL plans so Catalyst + Tungsten
pick the physical strategy.

Layout:
    session    — tuned SparkSession builder
    schema     — table schemas + fixture loaders
    functions/ — scalar/vector/text functions (JVM-side first, pandas_udf
                 only where built-ins can't express the semantics)
    operators/ — search, store (CRUD), dedup (exact/MinHash/SimHash),
                 ann (LSH similarity), multimodal, linq (R2 reads)
    sources/   — parquet-backed VectorStore + ingest codecs
    streaming/ — Structured Streaming ingest, watermarked windows,
                 foreachBatch upsert, stateful sessionization
    plans/     — physical-plan inspection (the 100 TB design gate)
"""

from merkonvectordb_spark.session import free_persisted_blocks, get_spark

__all__ = ["free_persisted_blocks", "get_spark"]
__version__ = "0.1.0"
