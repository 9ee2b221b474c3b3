"""Versioned parquet table: immutable data files + a manifest log —
snapshot reads, time travel, and partition-scoped rewrites without a
whole-table overwrite.

The plain-parquet ``VectorStore`` inherits the reference's single-writer,
no-isolation model (MerkonMemoryStore.cs:19-21); its module docstring
promises that "a table format with a transaction log lifts that without
touching this API".  This is that table format, reduced to the two ideas
that matter at 100 TB:

* **data files are immutable** — every write creates new files under
  ``data/``; nothing is modified or deleted by a commit, so readers of
  any version never race a writer;
* **a version is a file list** — ``_manifest/v=N.parquet`` enumerates
  the files live at version N (with their partition value).  Commit =
  write the new files, then write one small manifest file; the manifest
  write is the atomic publish point.  Reading version N plans a scan
  over exactly its files; partition-scoped rewrites retire only the
  touched partition's files from the live set.

That is the Iceberg/Delta skeleton: O(changed-partitions) write
amplification instead of the reference's O(database) (SURVEY §4.1), plus
time travel for free.  ``vacuum`` deletes files unreferenced by the
retained versions — the only destructive operation, and the only one a
time-travel read can observe.

Scale notes: the manifest is rows = live files, written as one parquet
file per version — at 100 TB with ~10⁵ files it is a few MB of metadata,
and the read path turns it into a file-list scan plan with no directory
listing of ``data/`` at all (listing is the cloud-storage killer).
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST_DDL = "file STRING, part STRING"

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _decode_part(enc: str) -> str | None:
    """Directory segment → logical partition value: Spark escapes
    special characters as %XX (Hive path escaping) and writes NULL as
    the Hive sentinel directory."""
    if enc == _HIVE_NULL:
        return None
    from urllib.parse import unquote

    return unquote(enc)


class VersionedTable:
    """Append-only parquet table with manifest-log versioning.

    ``part_col``: optional single partition column; files are tracked
    per partition value so ``replace_partitions`` can retire exactly the
    rewritten partitions.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        schema_ddl: str,
        part_col: str | None = None,
    ):
        self.spark = spark
        self.root = root
        self.schema_ddl = schema_ddl
        self.part_col = part_col
        self.data_path = os.path.join(root, "data")
        self.manifest_path = os.path.join(root, "_manifest")

    # -- manifest ---------------------------------------------------------
    def _versions(self) -> list[int]:
        if not os.path.isdir(self.manifest_path):
            return []
        out = []
        for name in os.listdir(self.manifest_path):
            if name.startswith("v="):
                out.append(int(name[2:].split(".")[0]))
        return sorted(out)

    def current_version(self) -> int:
        """0 = empty table (no commits yet)."""
        vs = self._versions()
        return vs[-1] if vs else 0

    def _manifest_file(self, version: int) -> str:
        return os.path.join(self.manifest_path, f"v={version}.parquet")

    def _live_files(self, version: int) -> list[tuple[str, str | None]]:
        if version == 0:
            return []
        if version not in self._versions():
            raise ValueError(
                f"version {version} does not exist (or was vacuumed); "
                f"available: {self._versions() or '[]'}"
            )
        # manifests are METADATA: read them driver-side (pyarrow), never
        # as a cluster job — a version lookup must cost a file open, not
        # a Spark stage (the Delta/Iceberg layering)
        import pyarrow.parquet as pq

        target = self._manifest_file(version)
        if os.path.isdir(target):  # pre-pyarrow manifests were Spark dirs
            parts = [
                os.path.join(target, n)
                for n in os.listdir(target)
                if n.endswith(".parquet")
            ]
            tables = [pq.read_table(p) for p in parts]
            import pyarrow as pa

            t = pa.concat_tables(tables)
        else:
            t = pq.read_table(target)
        return list(
            zip(t.column("file").to_pylist(), t.column("part").to_pylist())
        )

    def _publish(
        self,
        version: int,
        files: list[tuple[str, str | None]],
        txn: tuple[str, int] | None = None,
    ) -> None:
        """Atomic commit point: rename a staged manifest into place.

        The staging dir lives OUTSIDE ``_manifest/`` — a crash between
        write and rename must never leave anything ``_versions()`` could
        parse as a committed version (a ``v=N.parquet.tmp`` inside the
        log would read back as phantom version N).  And the rename is
        ``os.rename``, not ``shutil.move``: renaming onto an existing
        non-empty directory FAILS, so a lost-update race (two writers
        publishing the same version) surfaces as an error instead of one
        writer's tmp dir being silently nested inside the other's
        manifest.

        The manifest is written DRIVER-SIDE with pyarrow — committing a
        version is metadata work and must not cost a Spark job (two jobs
        per commit was the dominant cost of small table writes).  The
        publish is ``os.link`` (hard-link then unlink the tmp), which
        fails with EEXIST if the destination exists — same lost-update
        detection the directory rename gave."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pa.table(
            {
                "file": pa.array([f for f, _ in files], pa.string()),
                "part": pa.array([p for _, p in files], pa.string()),
            }
        )
        # txn watermarks commit ATOMICALLY with the version by riding in
        # the manifest's schema metadata — and EVERY publish carries the
        # full app→batch map forward from the previous version, so any
        # single retained manifest is self-sufficient: vacuuming old
        # manifests (or interleaving non-txn commits) can never lose a
        # watermark and resurrect a replayed streaming batch
        import json

        txns = dict(self._txn_map(version - 1))
        if txn is not None:
            app, batch = txn
            txns[str(app)] = max(
                int(batch), txns.get(str(app), int(batch))
            )
        if txns:
            table = table.replace_schema_metadata({"txns": json.dumps(txns)})
        tmp = os.path.join(
            self.root, f".tmp-manifest-{uuid.uuid4().hex[:12]}.parquet"
        )
        os.makedirs(self.manifest_path, exist_ok=True)
        pq.write_table(table, tmp)
        dest = self._manifest_file(version)
        try:
            os.link(tmp, dest)
        except OSError as e:
            import errno as _errno

            if e.errno == _errno.EEXIST:
                raise FileExistsError(
                    f"version {version} already committed (concurrent "
                    f"writer?) — refusing to overwrite {dest}"
                ) from e
            # any other errno (EPERM/ENOTSUP on link-less mounts, EIO…)
            # is NOT a lost-update race — surface it untranslated
            raise
        finally:
            os.unlink(tmp)

    # -- writes -----------------------------------------------------------
    def _write_data(
        self, df: DataFrame, cluster: bool = True
    ) -> list[tuple[str, str | None]]:
        """Write ``df`` as new immutable files; return (path, part) rows.

        Files are written to a staging dir, then MOVED (never rewritten)
        into the canonical ``data/<part_col>=<v>/<uuid>.parquet`` layout:
        one flat k=v level under ``data/`` keeps Spark's partition
        discovery happy for any mix of manifest file lists under one
        ``basePath``, and unique names make concurrent batches collide-free.

        ``cluster=False`` skips the pre-write repartition — for callers
        (compaction) whose rows are already shaped: one partition value
        per frame, file count and sort order deliberately chosen; the
        default hash repartition would both collapse the file count and
        shuffle away a z-order sort.
        """
        batch = os.path.join(self.root, f"_stage-{uuid.uuid4().hex[:12]}")
        if self.part_col and cluster:
            # cluster rows by the partition value before the partitioned
            # write ("optimize write"): without this every input task
            # crosses every partition value, emitting tasks×values tiny
            # files per commit.  REBALANCE(part_col), not a plain
            # repartition (round 11): the same single exchange, but AQE
            # sizes the write tasks from the real map output — locally a
            # 16-value commit no longer schedules 32 mostly-empty write
            # tasks (each paying committer setup/commit), and at scale a
            # skewed partition VALUE is split into several well-sized
            # files instead of funneling through one task (the
            # secondary-salt need the old comment deferred).  A plain
            # repartition is user-specified, so AQE may neither coalesce
            # nor split it.  (r10 rejected REBALANCE on UNpartitioned
            # writes — that added an exchange where none existed; here
            # it replaces one.)
            df = df.hint("rebalance", F.col(self.part_col))
        writer = df.write.mode("error")
        if self.part_col:
            writer = writer.partitionBy(self.part_col)
        writer.parquet(batch)
        out: list[tuple[str, str | None]] = []
        for dirpath, _dirs, names in os.walk(batch):
            # enc = the directory-encoded partition segment (Spark
            # escapes ':'/'/'/'%'… as %XX and writes NULL as the Hive
            # sentinel); part = the LOGICAL value, recorded in the
            # manifest.  Mixing them up makes replace_partitions miss
            # escaped values and compact() re-materialize the encoded
            # string as data.
            enc = None
            part = None
            if self.part_col:
                for seg in dirpath.split(os.sep):
                    if seg.startswith(f"{self.part_col}="):
                        enc = seg.split("=", 1)[1]
                        part = _decode_part(enc)
            for n in names:
                if not n.endswith(".parquet"):
                    continue
                dest_dir = (
                    os.path.join(self.data_path, f"{self.part_col}={enc}")
                    if enc is not None
                    else self.data_path
                )
                os.makedirs(dest_dir, exist_ok=True)
                dest = os.path.join(
                    dest_dir, f"{uuid.uuid4().hex[:16]}.parquet"
                )
                shutil.move(os.path.join(dirpath, n), dest)
                out.append((dest, part))
        shutil.rmtree(batch, ignore_errors=True)
        return out

    def append(self, df: DataFrame) -> int:
        """New version = previous live set + ``df``'s new files."""
        cur = self.current_version()
        files = self._live_files(cur) + self._write_data(df)
        self._publish(cur + 1, files)
        return cur + 1

    def _txn_map(self, version: int) -> dict[str, int]:
        """The app→batch watermark map committed at ``version`` (empty
        for v0 / legacy manifests).  One driver-side footer read."""
        import json

        import pyarrow.parquet as pq

        if version <= 0 or version not in self._versions():
            return {}
        target = self._manifest_file(version)
        if os.path.isdir(target):  # legacy dir manifests carry no txn
            return {}
        meta = pq.read_schema(target).metadata or {}
        if b"txns" in meta:
            return {
                k: int(v) for k, v in json.loads(meta[b"txns"]).items()
            }
        if b"txn_app" in meta:  # pre-map single-watermark form
            return {
                meta[b"txn_app"].decode(): int(meta[b"txn_batch"].decode())
            }
        return {}

    def last_committed_batch(self, app_id: str) -> int | None:
        """Newest committed batch id for ``app_id`` (None if none) —
        one footer read of the newest manifest, which carries the full
        propagated watermark map."""
        return self._txn_map(self.current_version()).get(str(app_id))

    def append_exactly_once(
        self, df: DataFrame, app_id: str, batch_id: int
    ) -> int:
        """Idempotent streaming append (the Delta ``txnAppId`` contract):
        a (app_id, batch_id) at or below the committed watermark is a
        REPLAY — the call returns the current version without writing.
        Use from ``foreachBatch``: Structured Streaming re-delivers a
        batch after a failure, and this turns at-least-once delivery
        into an exactly-once table state.  (A crash between the data
        write and the manifest publish leaves orphaned files, never
        duplicate rows — vacuum collects them.)"""
        last = self.last_committed_batch(app_id)
        if last is not None and int(batch_id) <= last:
            return self.current_version()
        cur = self.current_version()
        files = self._live_files(cur) + self._write_data(df)
        self._publish(cur + 1, files, txn=(str(app_id), int(batch_id)))
        return cur + 1

    def stage(self, df: DataFrame, cluster: bool = True) -> list[tuple[str, str | None]]:
        """Write ``df``'s data files WITHOUT committing: returns the
        (path, part) rows a later ``commit_staged_replace`` publishes.

        Exists so a caller coordinating MULTI-table commits can overlap
        the expensive data writes (guide §2.6 — independent Spark jobs)
        while still sequencing the cheap manifest publishes to preserve
        a cross-table ordering contract (e.g. the fingerprint store's
        shingles-before-bands visibility invariant, or the IVF index's
        centroids-before-lists pairing).  Staged files are invisible to
        readers until published; an abandoned staging is reclaimed by
        ``vacuum`` like any crash orphan."""
        return self._write_data(df, cluster)

    def commit_staged_replace(
        self,
        files: list[tuple[str, str | None]],
        txn: tuple[str, int] | None = None,
    ) -> int:
        """Atomically publish previously ``stage``-d files as a full
        logical replacement (the staged-write half of ``replace``)."""
        cur = self.current_version()
        self._publish(cur + 1, files, txn=txn)
        return cur + 1

    def replace(
        self, df: DataFrame, txn: tuple[str, int] | None = None
    ) -> int:
        """Full logical replacement (the new state was computed upstream,
        e.g. by ``operators.store.upsert``); old files stay for time
        travel until vacuumed.  ``txn`` commits an exactly-once
        watermark atomically with the replacement (same contract as
        ``append_exactly_once`` — the CALLER checks the watermark before
        computing the new state)."""
        cur = self.current_version()
        self._publish(cur + 1, self._write_data(df), txn=txn)
        return cur + 1

    def replace_partitions(self, df: DataFrame) -> int:
        """Rewrite ONLY the partitions present in ``df``: their old files
        retire from the live set, every other partition's files carry
        over untouched — O(changed partitions) write amplification."""
        if not self.part_col:
            raise ValueError("replace_partitions requires part_col")
        touched = {
            # logical values, including None for a NULL partition —
            # str() would turn NULL into the string 'None' and never
            # match the manifest's null
            (None if r[0] is None else str(r[0]))
            for r in df.select(self.part_col).distinct().collect()
        }
        cur = self.current_version()
        kept = [
            (f, p) for f, p in self._live_files(cur) if p not in touched
        ]
        self._publish(cur + 1, kept + self._write_data(df))
        return cur + 1

    # -- reads ------------------------------------------------------------
    def read(self, version: int | None = None) -> DataFrame:
        """The table as of ``version`` (default: latest).  Plans a scan
        over exactly that version's file list — no directory listing.

        ``mergeSchema`` is on: commits may ADD columns (schema
        evolution) and earlier files' rows read back NULL in them —
        Delta/Iceberg's additive-evolution contract.  The cost is a
        footer read per live file at planning time; at very large file
        counts a table format caches the merged schema in the manifest
        (noted as the follow-up — the manifest already carries per-file
        rows to hang it on)."""
        v = self.current_version() if version is None else version
        files = [f for f, _ in self._live_files(v)]
        if not files:
            return self.spark.createDataFrame([], self.schema_ddl)
        reader = self.spark.read.option("mergeSchema", "true")
        if not self.part_col:
            return reader.parquet(*files)
        reader = reader.option("basePath", self.data_path)
        # partition-column TYPE INFERENCE off for this read: inference
        # turns an all-numeric string partition ('0123') into an int
        # column with the leading zero gone, contradicting schema_ddl.
        # With inference off the directory value comes back STRING; cast
        # to the DECLARED type so non-string partition columns (cid INT)
        # keep their type.
        conf = "spark.sql.sources.partitionColumnTypeInference.enabled"
        old = self.spark.conf.get(conf, "true")
        self.spark.conf.set(conf, "false")
        try:
            df = reader.parquet(*files)
        finally:
            self.spark.conf.set(conf, old)
        from pyspark.sql.types import _parse_datatype_string

        declared = {
            f.name: f.dataType
            for f in _parse_datatype_string(self.schema_ddl).fields
        }
        t = declared.get(self.part_col)
        if t is not None and str(df.schema[self.part_col].dataType) != str(t):
            df = df.withColumn(
                self.part_col, F.col(self.part_col).cast(t)
            )
        return df

    # -- maintenance ------------------------------------------------------
    def compact(
        self,
        max_files_per_partition: int = 1,
        zorder_cols: Sequence[str] | None = None,
        zorder_bits: int = 16,
    ) -> int:
        """Rewrite partitions whose live-file count exceeds
        ``max_files_per_partition`` into that many files; untouched
        partitions carry their files over by reference.  Appends (daily
        fingerprint batches, streaming foreachBatch commits) each add a
        file per partition — without compaction a year of appends makes
        every scan open 365× more files than its bytes justify, and at
        cloud-storage latencies file count IS the scan cost.

        ``zorder_cols`` additionally sorts each rewritten partition by
        the columns' Morton key (``operators.layout.zorder_key``) —
        compaction is exactly when layout maintenance is free, since the
        rows are being rewritten anyway; z-ordered row groups give
        parquet min/max pruning on EVERY listed column (measured in
        ``tests/test_layout.py``).

        Data identity is preserved (same rows, new physical layout), old
        versions still see the old files (vacuum reclaims them), and the
        commit is the same atomic manifest publish as any write.
        Returns the new version, or the current one if nothing needed
        compaction."""
        cur = self.current_version()
        live = self._live_files(cur)
        by_part: dict[str | None, list[str]] = {}
        for f, p in live:
            by_part.setdefault(p, []).append(f)
        crowded = {
            p for p, fs in by_part.items() if len(fs) > max_files_per_partition
        }
        if not crowded:
            return cur
        kept = [(f, p) for f, p in live if p not in crowded]
        new_files: list[tuple[str, str | None]] = []
        for p in sorted(crowded, key=str):
            # mergeSchema: additive evolution means the crowded files may
            # not share one footer schema — without the merge the rewrite
            # would silently DROP any column absent from the sampled file
            df = self.spark.read.option("mergeSchema", "true").parquet(
                *by_part[p]
            )
            if self.part_col and p is not None:
                # partition value is directory-encoded; re-materialize the
                # column so _write_data routes rows back to cid=<p>/
                df = df.withColumn(self.part_col, F.lit(p))
            df = df.coalesce(max_files_per_partition)
            if zorder_cols:
                from merkonvectordb_spark.operators.layout import zorder_key

                df = (
                    df.withColumn(
                        "__zk",
                        zorder_key(
                            [F.col(c) for c in zorder_cols], bits=zorder_bits
                        ),
                    )
                    .sortWithinPartitions("__zk")
                    .drop("__zk")
                )
            new_files.extend(self._write_data(df, cluster=False))
        self._publish(cur + 1, kept + new_files)
        return cur + 1

    def vacuum(self, retain_last: int = 1, grace_seconds: float = 3600.0) -> int:
        """Delete data files unreferenced by the newest ``retain_last``
        versions and drop the expired manifests.  Time travel to expired
        versions then (correctly) fails.  Returns files deleted.

        ``grace_seconds``: an unreferenced file younger than this is an
        IN-FLIGHT commit, not an orphan — ``_write_data`` moves files
        into ``data/`` before ``_publish`` references them, so a vacuum
        racing a writer would otherwise delete data the about-to-publish
        version needs (the Delta retention-window rule).  Crash orphans
        are collected on the next vacuum after the window passes; pass
        ``0`` only when no writer can be running."""
        import time as _time

        vs = self._versions()
        keep_vs = vs[-retain_last:] if retain_last > 0 else []
        live: set[str] = set()
        for v in keep_vs:
            live.update(f for f, _ in self._live_files(v))
        cutoff = _time.time() - max(0.0, float(grace_seconds))
        deleted = 0
        for dirpath, _dirs, names in os.walk(self.data_path):
            for n in names:
                p = os.path.join(dirpath, n)
                if not n.endswith(".parquet") or p in live:
                    continue
                try:
                    if os.path.getmtime(p) > cutoff:
                        continue  # young unreferenced file: in-flight
                except OSError:
                    continue
                os.remove(p)
                deleted += 1
        for v in vs:
            if v not in keep_vs:
                target = self._manifest_file(v)
                if os.path.isdir(target):
                    shutil.rmtree(target)
                else:
                    os.remove(target)
        return deleted


def versioned_vector_store(
    spark: SparkSession, root: str
) -> VersionedTable:
    """The vectors table (SURVEY §1.3 layout) on the versioned format:
    collection-partitioned, so upserts/deletes retire only the touched
    collections' files and every past state stays readable."""
    from merkonvectordb_spark.schema import VECTORS_SCHEMA_DDL

    return VersionedTable(
        spark, root, VECTORS_SCHEMA_DDL, part_col="collection"
    )


def table_diff(
    table: VersionedTable,
    key_cols: Sequence[str],
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Change-data-feed between two snapshots of a versioned table:
    one row per key that was ``insert``-ed, ``delete``-d, or
    ``update``-d between ``from_version`` and ``to_version`` (default:
    latest), with the change kind in ``_change_type`` (Delta CDF's
    column name) and both sides' non-key columns as ``old``/``new``
    structs.

    Semantics: keys are assumed unique per snapshot (enforce upstream
    with ``operators.cdc.apply_changes`` / ``operators.store.upsert``);
    a key present in both versions with ANY differing non-key column is
    an update — the comparison is a null-safe struct equality, one
    expression per row.

    Scale: a single full-outer join on the key columns — both sides are
    snapshot SCANS of exactly the two manifests' file lists (no log
    replay), so cost is |v_from| + |v_to| rows through one hash
    exchange.  At 100 TB, partition-scoped manifests mean unchanged
    partitions' files are identical objects on both sides; a
    file-level manifest diff (metadata-only) can skip scanning them —
    noted here as the follow-up optimization; the row-level join is the
    correctness baseline.
    """
    old = table.read(from_version)
    new = table.read(to_version)
    keys = list(key_cols)
    # value columns = UNION of both snapshots' non-key columns: additive
    # schema evolution means a column can exist on only one side, and a
    # change confined to an evolved column must still surface as an
    # update.  A side missing a column contributes typed NULLs.
    types = {f.name: f.dataType for f in old.schema.fields}
    types.update({f.name: f.dataType for f in new.schema.fields})
    val_cols = [c for c in old.columns if c not in keys]
    val_cols += [
        c for c in new.columns if c not in keys and c not in val_cols
    ]

    def _side(df: DataFrame, alias: str, kp: str) -> DataFrame:
        vals = [
            (
                F.col(c)
                if c in df.columns
                else F.lit(None).cast(types[c])
            ).alias(c)
            for c in val_cols
        ]
        return df.select(
            *[F.col(c).alias(f"{kp}{i}") for i, c in enumerate(keys)],
            F.struct(*vals).alias(alias),
        )

    # the join keys are eqNullSafe: a plain equality full-outer never
    # matches a NULL key with itself, so an unchanged NULL-keyed row
    # would surface as a phantom delete + insert
    o = _side(old, "old", "__ko")
    n = _side(new, "new", "__kn")
    cond = None
    for i in range(len(keys)):
        c = F.col(f"__ko{i}").eqNullSafe(F.col(f"__kn{i}"))
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")
    change = (
        F.when(F.col("old").isNull(), F.lit("insert"))
        .when(F.col("new").isNull(), F.lit("delete"))
        .when(~F.col("old").eqNullSafe(F.col("new")), F.lit("update"))
    )
    out = j.withColumn("_change_type", change).where(
        F.col("_change_type").isNotNull()
    )
    return out.select(
        *[
            F.coalesce(F.col(f"__ko{i}"), F.col(f"__kn{i}")).alias(c)
            for i, c in enumerate(keys)
        ],
        "_change_type",
        "old",
        "new",
    )
