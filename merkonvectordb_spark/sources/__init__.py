"""Sources & sinks: the parquet-backed vector store (SURVEY §2.1 S1/S2)
and ingest codecs (§2.6 F2, §2.1 S5)."""

from merkonvectordb_spark.sources.vector_store import VectorStore
from merkonvectordb_spark.sources.ingest import (
    decode_embedding_json,
    encode_embedding_json,
    deterministic_embedding,
    records_from_texts,
)

__all__ = [
    "VectorStore",
    "decode_embedding_json",
    "encode_embedding_json",
    "deterministic_embedding",
    "records_from_texts",
]
