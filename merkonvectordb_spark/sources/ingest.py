"""Ingest codecs + the demo-replay source (SURVEY §2.6 F2, §2.1 S5).

The reference stores embeddings as JSON text and re-parses them per row
per query (MerkonMemoryStore.cs:230,248, ReadOnlyMemoryConverter.cs:15-31
— §4.1 anti-optimization).  Here JSON encode/decode happens exactly once,
at the ingest/egress boundary; storage is native ``ARRAY<FLOAT>``.

``deterministic_embedding`` replaces the demo's OpenAI ada-002 call
(Program.cs:31-41) with a hash-seeded pseudo-embedding so the E2E replay
(SURVEY §5.2.2) is CI-able: pure JVM expressions (xxhash64 per dimension),
no network, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMBEDDING_JSON_TYPE = "array<float>"


def encode_embedding_json(embedding: Column) -> Column:
    """F2 encode: ARRAY<FLOAT> → JSON text (egress only;
    ReadOnlyMemoryConverter.cs:22-31 write path)."""
    return F.to_json(embedding)


def decode_embedding_json(embedding_json: Column) -> Column:
    """F2 decode: JSON text → ARRAY<FLOAT> (ingest only;
    MerkonMemoryStore.cs:230 read path).  Malformed JSON ⇒ NULL (the
    lenient-parse analogue: a distributed engine must not throw per row)."""
    return F.from_json(embedding_json, EMBEDDING_JSON_TYPE)


def parse_u_timestamp(s: Column) -> Column:
    """F4 parse direction: a "u"-format (universal sortable,
    ``yyyy-MM-dd HH:mm:ss'Z'``) string → TIMESTAMP at second precision.

    The reference parses with ``DateTimeStyles.AssumeUniversal``
    (MerkonMemoryStore.cs:212-221) — the string IS a UTC instant; the
    session timezone is pinned UTC (schema.load_table / session.get_spark),
    so the parse lands on the same instant.  Unparseable strings ⇒
    NULL (lenient, per-row throws don't distribute) — via
    ``try_to_timestamp``, because plain ``to_timestamp`` THROWS under
    ANSI mode (which this repo's own sessions enable): one malformed
    string would abort the whole ingest job."""
    return F.try_to_timestamp(s, F.lit("yyyy-MM-dd HH:mm:ss'Z'"))


def deterministic_embedding(seed: Column, dim: int = 64) -> Column:
    """S5: hash-seeded pseudo-embedding in [-1, 1]^dim (float32).

    Deterministic in ``seed`` (usually the document key or text), pure
    built-in expressions — one ``xxhash64(seed, i)`` per dimension, JVM
    codegen, no Python hop.  Never zero-norm for non-null seeds (dimension
    hashes can't all be zero in practice), so cosine stays scoreable.
    """
    comps = [
        (F.xxhash64(seed, F.lit(i)) / F.lit(float(2**63))).cast("float")
        for i in range(dim)
    ]
    return F.array(*comps)


def records_from_texts(
    texts: DataFrame,
    collection: str,
    dim: int = 64,
    id_col: str = "id",
    text_col: str = "text",
    description_col: str | None = None,
) -> DataFrame:
    """Program.cs-shaped ingest (Program.cs:14-54): (id, text[, description])
    rows → upsert-ready records with SK-shaped metadata JSON
    (MerkonMemoryStore.cs:247) and a deterministic embedding of the text.

    ``metadata.id`` is set to the row id — the upsert path then copies it
    into ``key`` (W3, MerkonMemoryStore.cs:240), closing the E2E loop.
    """
    desc = F.col(description_col) if description_col else F.lit("")
    meta = F.to_json(
        F.struct(
            F.lit(False).alias("is_reference"),
            F.lit("fixture").alias("external_source_name"),
            F.col(id_col).cast("string").alias("id"),
            desc.alias("description"),
            F.col(text_col).alias("text"),
            F.lit("").alias("additional_metadata"),
        ),
        # keep NULL fields in the JSON shape: the default drops them,
        # so a NULL description row would emit a metadata object with
        # the key MISSING — a different shape than the reference writer
        {"ignoreNullFields": "false"},
    )
    return texts.select(
        F.lit(collection).alias("collection"),
        F.col(id_col).cast("string").alias("key"),
        meta.alias("metadata"),
        deterministic_embedding(F.col(text_col), dim).alias("embedding"),
        F.date_trunc("second", F.current_timestamp()).alias("ts"),
    )


def embed_query_text(text: str, dim: int = 64) -> list[float]:
    """Driver-side embedding of a single query string — same function the
    corpus used, computed via a 1-row local plan (a query parameter, not
    data through the driver)."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        from merkonvectordb_spark import get_spark

        spark = get_spark("embed_query")
    row = (
        spark.range(1)
        .select(deterministic_embedding(F.lit(text), dim).alias("e"))
        .first()
    )
    return list(row["e"])


__all__ = [
    "encode_embedding_json",
    "decode_embedding_json",
    "parse_u_timestamp",
    "deterministic_embedding",
    "records_from_texts",
    "embed_query_text",
]
