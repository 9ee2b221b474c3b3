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


def test_compact_rewrites_crowded_partitions_only(spark, table):
    """Three appends → 3 files in partition a; compact(1) rewrites a
    into one file, carries b's single file over BY REFERENCE, preserves
    the row set, and keeps the pre-compaction version time-travelable."""
    for i in range(3):
        table.append(spark.createDataFrame([("a", f"k{i}", i)], DDL))
    table.append(spark.createDataFrame([("b", "kb", 9)], DDL))
    before = _rows(table.read())
    b_files_before = {f for f, p in table._live_files(4) if p == "b"}
    v = table.compact(max_files_per_partition=1)
    assert v == 5
    assert _rows(table.read()) == before
    files = table._live_files(v)
    assert len([f for f, p in files if p == "a"]) == 1
    assert {f for f, p in files if p == "b"} == b_files_before
    # old version still reads the pre-compaction layout
    assert _rows(table.read(4)) == before
    # nothing crowded anymore → compact is a no-op, same version
    assert table.compact(max_files_per_partition=1) == 5


def test_duplicate_version_publish_fails_loudly(spark, table):
    """A lost-update race (two writers committing the same version) must
    be an ERROR, not silent manifest corruption (shutil.move would have
    nested the second tmp dir inside the first manifest)."""
    table.append(spark.createDataFrame([("a", "k1", 1)], DDL))
    with pytest.raises(FileExistsError):
        table._publish(1, [])
    # the committed manifest is still intact and readable
    assert _rows(table.read(1)) == {("a", "k1", 1)}


def test_crashed_staging_leaves_no_phantom_version(spark, table):
    """Staging dirs live outside _manifest/ — a crash between manifest
    write and rename must not read back as a committed version."""
    table.append(spark.createDataFrame([("a", "k1", 1)], DDL))
    # simulate the pre-rename crash state: a staged-but-unpublished manifest
    stage = os.path.join(table.root, ".tmp-manifest-crashed")
    spark.createDataFrame(
        [("nope", None)], "file STRING, part STRING"
    ).coalesce(1).write.parquet(stage)
    assert table._versions() == [1]
    assert table.current_version() == 1


def test_vacuum_drops_expired_versions_only(spark, table):
    table.append(spark.createDataFrame([("a", "k1", 1)], DDL))
    table.replace(spark.createDataFrame([("a", "k1", 2)], DDL))
    # the grace window protects in-flight commits: a default vacuum
    # right after the writes retires the expired MANIFEST but must not
    # delete the young data files (a racing writer may be about to
    # publish a version referencing equally-young files)...
    assert table.vacuum(retain_last=1) == 0
    with pytest.raises(ValueError, match="vacuumed"):
        table.read(1)
    # ...while grace 0 (offline maintenance) collects them
    deleted = table.vacuum(retain_last=1, grace_seconds=0)
    assert deleted > 0
    assert _rows(table.read()) == {("a", "k1", 2)}


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


def test_streaming_foreachbatch_into_versioned_table(spark, tmp_path):
    """CDC-style ingest: each micro-batch commits one version via
    foreachBatch, so the table's history IS the stream's batch history —
    any intermediate ingest state stays queryable."""
    import os

    from merkonvectordb_spark.streaming import stream_events

    src = tmp_path / "src"
    src.mkdir()

    def write(path, rows):
        spark.createDataFrame(
            rows,
            "event_id LONG, ts LONG, user_id LONG, event_type STRING, "
            "value DOUBLE, props STRING",
        ).coalesce(1).write.parquet(path)

    t0 = 1_700_000_000 * 1_000_000_000  # ns
    write(str(src / "f1"), [(1, t0, 1, "a", 1.0, "{}"),
                            (2, t0, 2, "b", 2.0, "{}")])
    import time

    time.sleep(1.1)
    write(str(src / "f2"), [(3, t0, 3, "a", 3.0, "{}")])

    vt = VersionedTable(
        spark,
        str(tmp_path / "sink"),
        "event_id LONG, user_id LONG, event_type STRING, value DOUBLE",
        part_col="event_type",
    )

    def commit_batch(bdf, bid):
        vt.append(bdf.select("event_id", "user_id", "event_type", "value"))

    q = (
        stream_events(spark, str(src) + "/*", max_files_per_trigger=1)
        .writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    assert vt.current_version() == 2
    assert {r.event_id for r in vt.read().collect()} == {1, 2, 3}
    assert {r.event_id for r in vt.read(1).collect()} == {1, 2}


def test_table_diff_kinds(spark, tmp_path):
    from merkonvectordb_spark.sources.versioned import (
        VersionedTable,
        table_diff,
    )

    t = VersionedTable(
        spark, str(tmp_path / "vt_diff"), "k LONG, v STRING"
    )
    v1 = t.replace(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k LONG, v STRING"
        )
    )
    v2 = t.replace(
        spark.createDataFrame(
            [(2, "B"), (3, "c"), (4, "d")], "k LONG, v STRING"
        )
    )
    got = {
        r.k: (r._change_type, r.old, r.new)
        for r in table_diff(t, ["k"], v1, v2).collect()
    }
    assert set(got) == {1, 2, 4}  # 3 unchanged → absent
    assert got[1][0] == "delete" and got[1][2] is None
    assert got[2][0] == "update" and got[2][1].v == "b" and got[2][2].v == "B"
    assert got[4][0] == "insert" and got[4][1] is None


def test_table_diff_default_to_latest_and_null_safety(spark, tmp_path):
    from merkonvectordb_spark.sources.versioned import (
        VersionedTable,
        table_diff,
    )

    t = VersionedTable(spark, str(tmp_path / "vt_diff2"), "k LONG, v STRING")
    v1 = t.replace(
        spark.createDataFrame([(1, None), (2, "x")], "k LONG, v STRING")
    )
    t.replace(
        spark.createDataFrame([(1, None), (2, None)], "k LONG, v STRING")
    )
    got = {r.k: r._change_type for r in table_diff(t, ["k"], v1).collect()}
    # k=1: NULL == NULL under null-safe compare → unchanged, absent
    assert got == {2: "update"}


def test_table_diff_applies_back_to_the_new_snapshot(spark, tmp_path):
    """Invariant: old + diff = new (apply deletes/updates/inserts to the
    old snapshot reproduces the new one) — the CDC consumer contract."""
    from pyspark.sql import functions as F

    from merkonvectordb_spark.sources.versioned import (
        VersionedTable,
        table_diff,
    )

    t = VersionedTable(spark, str(tmp_path / "vt_diff3"), "k LONG, v STRING")
    v1 = t.replace(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(20)], "k LONG, v STRING"
        )
    )
    v2 = t.replace(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(5, 15)]      # 0-4 deleted
            + [(i, f"V{i}") for i in range(15, 20)]   # 15-19 updated
            + [(i, f"v{i}") for i in range(30, 33)],  # inserted
            "k LONG, v STRING",
        )
    )
    d = table_diff(t, ["k"], v1, v2)
    old = t.read(v1)
    touched = d.select("k")
    survivors = old.join(touched, "k", "left_anti")
    incoming = (
        d.where(F.col("_change_type").isin("insert", "update"))
        .select("k", F.col("new.v").alias("v"))
    )
    applied = sorted(
        map(tuple, survivors.unionByName(incoming).collect())
    )
    want = sorted(map(tuple, t.read(v2).collect()))
    assert applied == want


def test_append_exactly_once_skips_replays(spark, tmp_path):
    from merkonvectordb_spark.sources.versioned import VersionedTable

    t = VersionedTable(spark, str(tmp_path / "vt_eo"), "k LONG")
    b0 = spark.createDataFrame([(1,), (2,)], "k LONG")
    b1 = spark.createDataFrame([(3,)], "k LONG")
    v1 = t.append_exactly_once(b0, "appA", 0)
    # exact replay of batch 0 (foreachBatch redelivery) → no-op
    v_replay = t.append_exactly_once(b0, "appA", 0)
    assert v_replay == v1
    v2 = t.append_exactly_once(b1, "appA", 1)
    assert v2 == v1 + 1
    # stale batch id after progress → still a no-op
    assert t.append_exactly_once(b0, "appA", 0) == v2
    rows = sorted(r.k for r in t.read().collect())
    assert rows == [1, 2, 3]
    assert t.last_committed_batch("appA") == 1
    assert t.last_committed_batch("other") is None


def test_append_exactly_once_tracks_apps_independently(spark, tmp_path):
    from merkonvectordb_spark.sources.versioned import VersionedTable

    t = VersionedTable(spark, str(tmp_path / "vt_eo2"), "k LONG")
    t.append_exactly_once(
        spark.createDataFrame([(1,)], "k LONG"), "appA", 5
    )
    # a different app's batch 0 must NOT be considered a replay
    t.append_exactly_once(
        spark.createDataFrame([(2,)], "k LONG"), "appB", 0
    )
    assert sorted(r.k for r in t.read().collect()) == [1, 2]
    assert t.last_committed_batch("appA") == 5
    assert t.last_committed_batch("appB") == 0


def test_streaming_foreach_batch_exactly_once_end_to_end(spark, tmp_path):
    """availableNow stream → foreachBatch append_exactly_once: the table
    equals the full source even when a batch function is invoked twice
    (simulated redelivery)."""
    import os

    from pyspark.sql import functions as F

    from merkonvectordb_spark.sources.versioned import VersionedTable

    src = str(tmp_path / "src")
    spark.range(0, 40).select(F.col("id")).coalesce(4).write.json(src)
    t = VersionedTable(spark, str(tmp_path / "vt_eo3"), "id LONG")

    def sink(batch_df, batch_id):
        t.append_exactly_once(batch_df, "stream1", batch_id)
        # simulate at-least-once redelivery of every batch
        t.append_exactly_once(batch_df, "stream1", batch_id)

    q = (
        spark.readStream.schema("id LONG")
        .json(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert sorted(r.id for r in t.read().collect()) == list(range(40))


def test_additive_schema_evolution(spark, tmp_path):
    """A later commit may add a column; earlier rows read back NULL in
    it, and time travel still returns each version's own schema."""
    from merkonvectordb_spark.sources.versioned import VersionedTable

    t = VersionedTable(spark, str(tmp_path / "vt_evo"), "k LONG, v STRING")
    v1 = t.append(
        spark.createDataFrame([(1, "a")], "k LONG, v STRING")
    )
    t.append(
        spark.createDataFrame(
            [(2, "b", "en")], "k LONG, v STRING, lang STRING"
        )
    )
    cur = {r.k: (r.v, r.lang) for r in t.read().collect()}
    assert cur == {1: ("a", None), 2: ("b", "en")}
    old_cols = set(t.read(v1).columns)
    assert old_cols == {"k", "v"}


def test_compact_with_zorder_layout(spark, tmp_path):
    """Compaction doubles as layout maintenance: the rewritten files are
    z-order-sorted so min/max pruning works on every listed column."""
    from merkonvectordb_spark.sources.versioned import VersionedTable

    t = VersionedTable(spark, str(tmp_path / "vt_zc"), "a LONG, b LONG")
    for lo in (0, 1, 2, 3):  # 4 append commits → 4+ files
        t.append(
            spark.range(lo * 1000, (lo + 1) * 1000).select(
                (F.col("id") % 50).alias("a"),
                F.floor(F.col("id") / 50).alias("b"),
            )
        )
    before = sorted(map(tuple, t.read().collect()))
    v = t.compact(max_files_per_partition=1, zorder_cols=["a", "b"])
    assert v == t.current_version()
    after = sorted(map(tuple, t.read().collect()))
    assert after == before  # identity preserved
    # layout check: within the compacted file, rows follow the z-curve —
    # consecutive-row Morton keys are non-decreasing
    from merkonvectordb_spark.operators.layout import zorder_key

    zk = [
        r.z
        for r in t.read()
        .select(zorder_key([F.col("a"), F.col("b")], bits=16).alias("z"))
        .collect()
    ]
    assert zk == sorted(zk)


def test_compact_preserves_evolved_columns(spark, tmp_path):
    """Review finding: compacting files with heterogeneous (additively
    evolved) schemas must mergeSchema — a single-footer read silently
    dropped the evolved column and its data."""
    from merkonvectordb_spark.sources.versioned import VersionedTable

    t = VersionedTable(spark, str(tmp_path / "vt_ce"), "k LONG, a LONG")
    t.append(spark.createDataFrame([(1, 10)], "k LONG, a LONG"))
    t.append(
        spark.createDataFrame([(2, 20, 99)], "k LONG, a LONG, c LONG")
    )
    for _ in range(6):  # the loss was nondeterministic via file order
        t.compact(max_files_per_partition=1)
        rows = {r.k: (r.a, r.c) for r in t.read().collect()}
        assert rows == {1: (10, None), 2: (20, 99)}


def test_compact_respects_file_count_on_partitioned_table(spark, tmp_path):
    """Review finding: _write_data's pre-write hash repartition collapsed
    compaction output to one file per partition regardless of
    max_files_per_partition."""
    import os

    from merkonvectordb_spark.sources.versioned import VersionedTable

    t = VersionedTable(
        spark, str(tmp_path / "vt_cf"), "cid STRING, v LONG", part_col="cid"
    )
    for i in range(6):
        t.append(
            spark.createDataFrame([("a", i)], "cid STRING, v LONG")
        )
    t.compact(max_files_per_partition=2)
    files = [f for f, p in t._live_files(t.current_version()) if p == "a"]
    assert 1 <= len(files) <= 2
    # identity preserved
    assert sorted(r.v for r in t.read().collect()) == list(range(6))


def test_exactly_once_watermark_survives_vacuum(spark, tmp_path):
    """Review finding: the txn watermark must propagate through every
    commit so vacuuming the manifest it rode in on cannot resurrect a
    replayed batch."""
    from merkonvectordb_spark.sources.versioned import VersionedTable

    t = VersionedTable(spark, str(tmp_path / "vt_wv"), "k LONG")
    t.append_exactly_once(
        spark.createDataFrame([(1,)], "k LONG"), "app", 1
    )
    t.replace(t.read())  # non-txn commit on top
    t.vacuum(retain_last=1)  # drops the manifest that carried the txn
    v = t.current_version()
    assert t.last_committed_batch("app") == 1
    assert (
        t.append_exactly_once(
            spark.createDataFrame([(1,)], "k LONG"), "app", 1
        )
        == v
    )  # replay: no-op
    assert [r.k for r in t.read().collect()] == [1]


def test_table_diff_sees_evolved_column_changes(spark, tmp_path):
    """Review finding: a change confined to a schema-evolved column must
    surface as an update (value structs take the UNION of columns)."""
    from merkonvectordb_spark.sources.versioned import (
        VersionedTable,
        table_diff,
    )

    t = VersionedTable(spark, str(tmp_path / "vt_de"), "k LONG, a LONG")
    v1 = t.replace(
        spark.createDataFrame([(1, 10), (2, 20)], "k LONG, a LONG")
    )
    v2 = t.replace(
        spark.createDataFrame(
            [(1, 10, 5), (2, 20, None)], "k LONG, a LONG, c LONG"
        )
    )
    got = {
        r.k: (r._change_type, r.old.c, r.new.c)
        for r in table_diff(t, ["k"], v1, v2).collect()
    }
    # k=1: only the evolved column changed (NULL→5) → update
    assert got == {1: ("update", None, 5)}


def test_escaped_partition_values_roundtrip(spark, table):
    """Partition values Spark escapes in directory names (':' → %3A)
    must be tracked by their LOGICAL value: replace_partitions must
    retire them and compact must not re-materialize the encoded form."""
    table.append(
        spark.createDataFrame([("a:b", "k1", 1), ("plain", "k2", 2)], DDL)
    )
    # the directory is encoded, the manifest logical
    parts = {p for _f, p in table._live_files(table.current_version())}
    assert parts == {"a:b", "plain"}
    table.replace_partitions(
        spark.createDataFrame([("a:b", "k1", 10)], DDL)
    )
    assert _rows(table.read()) == {("a:b", "k1", 10), ("plain", "k2", 2)}
    # two appends → compact the crowded partition; value survives intact
    table.append(spark.createDataFrame([("a:b", "k3", 3)], DDL))
    table.compact(max_files_per_partition=1)
    assert _rows(table.read()) == {
        ("a:b", "k1", 10),
        ("a:b", "k3", 3),
        ("plain", "k2", 2),
    }


def test_numeric_string_partition_keeps_leading_zero(spark, table):
    """Partition type inference must not rewrite '0123' into 123: the
    read path pins the DECLARED partition type."""
    table.append(spark.createDataFrame([("0123", "k1", 1)], DDL))
    out = table.read()
    assert dict(out.dtypes)["collection"] == "string"
    assert _rows(out) == {("0123", "k1", 1)}


def test_table_diff_null_key_not_phantom_churn(spark, tmp_path):
    """An unchanged row with a NULL key must not appear in the diff;
    a changed one must be ONE update, not a delete + insert."""
    from merkonvectordb_spark.sources.versioned import table_diff

    t = VersionedTable(spark, str(tmp_path / "nk"), "k STRING, v LONG")
    t.append(spark.createDataFrame([(None, 1), ("a", 1)], "k STRING, v LONG"))
    t.replace(spark.createDataFrame([(None, 1), ("a", 2)], "k STRING, v LONG"))
    d1 = table_diff(t, ["k"], 1, 2).collect()
    assert {(r["k"], r["_change_type"]) for r in d1} == {("a", "update")}
    t.replace(spark.createDataFrame([(None, 9), ("a", 2)], "k STRING, v LONG"))
    d2 = table_diff(t, ["k"], 2, 3).collect()
    assert {(r["k"], r["_change_type"]) for r in d2} == {(None, "update")}
