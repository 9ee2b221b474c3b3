"""Versioned table format: time travel, partition-scoped rewrites,
vacuum semantics."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from merkonvectordb_spark.operators.store import upsert
from merkonvectordb_spark.sources.versioned import (
    VersionedTable,
    versioned_vector_store,
)

DDL = "collection STRING, key STRING, v LONG"


@pytest.fixture()
def table(spark, tmp_path):
    return VersionedTable(
        spark, str(tmp_path / "t"), DDL, part_col="collection"
    )


def _rows(df):
    return {(r.collection, r.key, r.v) for r in df.collect()}


def test_time_travel_reads_old_state(spark, table):
    v1 = table.append(
        spark.createDataFrame([("a", "k1", 1), ("b", "k2", 2)], DDL)
    )
    v2 = table.replace_partitions(
        spark.createDataFrame([("a", "k1", 10), ("a", "k3", 3)], DDL)
    )
    assert (v1, v2) == (1, 2)
    assert _rows(table.read(v1)) == {("a", "k1", 1), ("b", "k2", 2)}
    # partition b carried over untouched; partition a fully rewritten
    assert _rows(table.read()) == {
        ("a", "k1", 10),
        ("a", "k3", 3),
        ("b", "k2", 2),
    }


def test_replace_partitions_rewrites_only_touched_files(spark, table):
    table.append(spark.createDataFrame([("a", "k1", 1), ("b", "k2", 2)], DDL))
    before = {f for f, p in table._live_files(1) if p == "b"}
    table.replace_partitions(spark.createDataFrame([("a", "k1", 9)], DDL))
    after = {f for f, p in table._live_files(2) if p == "b"}
    assert before == after  # b's physical files are byte-identical carryover


def test_empty_table_reads_empty(spark, table):
    assert table.read().count() == 0
    assert table.current_version() == 0


def test_vacuum_drops_expired_versions_only(spark, table):
    table.append(spark.createDataFrame([("a", "k1", 1)], DDL))
    table.replace(spark.createDataFrame([("a", "k1", 2)], DDL))
    deleted = table.vacuum(retain_last=1)
    assert deleted > 0
    assert _rows(table.read()) == {("a", "k1", 2)}
    with pytest.raises(ValueError, match="vacuumed"):
        table.read(1)


def test_versioned_upsert_roundtrip(spark, tmp_path):
    """The logical upsert operator composed with the versioned sink:
    every pre-upsert state stays readable."""
    vt = versioned_vector_store(spark, str(tmp_path / "vs"))
    base = spark.createDataFrame(
        [("c", "k1", "{}", [1.0, 0.0], None, 1)],
        vt.schema_ddl,
    )
    vt.append(base)
    updates = spark.createDataFrame(
        [("c", "k1", '{"x":1}', [0.0, 1.0], None),
         ("c", "k2", "{}", [1.0, 1.0], None)],
        "collection STRING, key STRING, metadata STRING, "
        "embedding ARRAY<FLOAT>, ts TIMESTAMP",
    )
    new_state = upsert(vt.read(), updates)
    v2 = vt.replace_partitions(new_state)
    got = {r.key: r.metadata for r in vt.read(v2).collect()}
    assert got == {"k1": '{"x":1}', "k2": "{}"}
    # time travel: the pre-upsert state is intact
    assert {r.key for r in vt.read(1).collect()} == {"k1"}
