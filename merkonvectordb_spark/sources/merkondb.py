"""Migration reader for the reference engine's NATIVE database file —
a Spark 4 Python DataSource (``spark.read.format("merkondb")``).

The reference persists one MessagePack document per database
(`MerkonDatabase.cs:128-162`): with MessagePack-CSharp's int-keyed
``[MessagePackObject]`` layout the file decodes to

    [ { collection: [ [key, metadata_json, embedding_json, ts_u], … ] } ]

(`VectorDatabase` Key(0) = the Dictionary, `DatabaseEntry` Keys 0-3,
`MerkonDatabase.cs:12-16,243-254`).  This source surfaces those RAW
fields one row per entry; ``migrate_merkondb`` then maps them through
the SAME parse expressions the engine's own ingest path uses
(`decode_embedding_json`, `parse_u_timestamp`) and lands them in a
``VectorStore`` — so "switch engines, keep your data" is one call:

    from merkonvectordb_spark.sources.merkondb import migrate_merkondb
    migrate_merkondb(spark, "/data/old.db", store)

Scale note: a reference database is BY CONSTRUCTION single-node sized
(the reference holds the whole file in memory and docs allow one
process at a time), so the reader exposes one input partition per
file; parallelism at 100 TB comes from migrating many databases —
pass a directory and each ``.db`` file becomes its own partition.
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING, Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from merkonvectordb_spark.sources.msgpackio import unpackb

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

RAW_DDL = (
    "collection STRING, key STRING, metadata STRING, "
    "embedding_json STRING, ts_u STRING"
)


def _db_files(path: str) -> list[str]:
    if os.path.isdir(path):
        # regular files only: a subdirectory or checkpoint artifact in a
        # many-databases directory must not become a doomed partition
        return sorted(
            p
            for f in os.listdir(path)
            if not f.startswith(".") and not f.startswith("_")
            and os.path.isfile(p := os.path.join(path, f))
        )
    return [path]


def iter_entries(db_path: str) -> Iterator[tuple]:
    """Decode one reference database file into raw-field rows."""
    with open(db_path, "rb") as fh:
        doc = unpackb(fh.read())
    # int-keyed [MessagePackObject] → array; Key(0) is the dict
    if not isinstance(doc, list) or not doc or not isinstance(doc[0], dict):
        raise ValueError(
            f"{db_path}: not a reference VectorDatabase document "
            f"(expected [map], got {type(doc).__name__})"
        )
    for collection, entries in doc[0].items():
        for e in entries or []:
            # DatabaseEntry Keys 0-3; tolerate a shorter array the way
            # MessagePack-CSharp does for trailing optional members
            vals = list(e) + [None] * (4 - len(e))
            yield (collection, vals[0], vals[1], vals[2], vals[3])


def list_collections(path: str) -> list[str]:
    """Every collection NAME in the file(s) — including empty ones,
    which have no entry rows and therefore never appear in the
    row-shaped reader output."""
    names: set[str] = set()
    for f in _db_files(path):
        with open(f, "rb") as fh:
            doc = unpackb(fh.read())
        if isinstance(doc, list) and doc and isinstance(doc[0], dict):
            names.update(doc[0].keys())
    return sorted(names)


class MerkonDBReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("merkondb: .load(path) is required")
        self._files = _db_files(path)

    def partitions(self) -> list[InputPartition]:
        # one single-node-sized database file per partition
        return [InputPartition(i) for i in range(len(self._files))]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        yield from iter_entries(self._files[partition.value])


class MerkonDBDataSource(DataSource):
    """``spark.dataSource.register(MerkonDBDataSource)`` then
    ``spark.read.format("merkondb").load(path)``."""

    @classmethod
    def name(cls) -> str:
        return "merkondb"

    def schema(self) -> str:
        return RAW_DDL

    def reader(self, schema) -> MerkonDBReader:
        return MerkonDBReader(self.options)


def read_merkondb(spark: "SparkSession", path: str) -> "DataFrame":
    """Raw-field frame from a reference database file (or a directory
    of them), registering the data source if needed."""
    try:
        spark.dataSource.register(MerkonDBDataSource)
    except Exception as e:  # re-registration is fine; anything else isn't
        if "exist" not in str(e).lower():
            raise
    return spark.read.format("merkondb").load(path)


def migrate_merkondb(spark: "SparkSession", path: str, store) -> int:
    """Load a reference database file into a ``VectorStore`` through the
    engine's own ingest expressions — returns the number of migrated
    rows.  Collections are created (registry) before data lands, so
    empty reference collections survive the migration too."""
    from pyspark.sql import functions as F

    from merkonvectordb_spark.sources.ingest import (
        decode_embedding_json,
        parse_u_timestamp,
    )

    raw = read_merkondb(spark, path).localCheckpoint(eager=True)
    # from the FILE's map keys, not the row output — an empty reference
    # collection has no entry rows but must survive the migration
    for coll in list_collections(path):
        store.create_collection(coll)
    rows = raw.select(
        "collection",
        "key",
        F.col("metadata"),
        decode_embedding_json(F.col("embedding_json")).alias("embedding"),
        parse_u_timestamp(F.col("ts_u")).alias("ts"),
    )
    # keys are the reference's stored keys — don't re-derive from
    # metadata.id (they already went through that mapping at write time)
    store.upsert(rows, key_from_metadata=False)
    return raw.count()


def write_merkondb(store, path: str, collections: list[str] | None = None) -> int:
    """Export a ``VectorStore`` back to a reference-compatible database
    file — the other half of interop: run this engine at scale, hand a
    single-node reference deployment its native format back.

    Layout written is exactly what ``iter_entries`` reads (int-keyed
    [MessagePackObject] → array, Dictionary → map); embeddings render
    through the engine's F2 egress codec and timestamps through the
    "u" format (`date_format(ts, "yyyy-MM-dd HH:mm:ss'Z'")`,
    MerkonDatabase.cs:252-254's DateTimeOffset "u" round-trip).

    The reference file is single-node BY CONSTRUCTION, so this
    ``collect()`` is the point of the operation, not an anti-pattern —
    guard rails: refuses above 1M rows (a reference deployment could
    not load that file anyway).  Returns the number of exported rows.
    """
    from pyspark.sql import functions as F

    from merkonvectordb_spark.sources.ingest import encode_embedding_json

    # `is not None`: an explicitly EMPTY list means "export nothing",
    # not "export everything"
    colls = (
        collections
        if collections is not None
        else sorted(
            r["collection"] for r in store.list_collections().collect()
        )
    )
    frames = store.vectors().where(F.col("collection").isin(list(colls)))
    n = frames.count()
    if n > 1_000_000:
        raise ValueError(
            f"{n} rows — a reference deployment loads the whole file "
            "into one process; export per collection instead"
        )
    rows = frames.select(
        "collection",
        "key",
        "metadata",
        encode_embedding_json(F.col("embedding")).alias("embedding_json"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss'Z'").alias("ts_u"),
        "ingest_seq",
    ).collect()
    data: dict[str, list] = {c: [] for c in colls}
    # reference lists are append-ordered; ingest_seq reproduces it
    for r in sorted(rows, key=lambda r: (r["collection"], r["ingest_seq"])):
        data[r["collection"]].append(
            [r["key"], r["metadata"], r["embedding_json"], r["ts_u"]]
        )
    from merkonvectordb_spark.sources.msgpackio import packb

    with open(path, "wb") as fh:
        fh.write(packb([data]))
    return n
