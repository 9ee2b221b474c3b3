"""Materialized aggregate views: incremental maintenance persisted in
the versioned store.

Composes ``operators.incremental`` (distributive-aggregate state merge)
with ``sources.versioned.VersionedTable`` (manifest-committed snapshots)
into the user-facing contract a warehouse MV gives you:

* ``refresh_full(rows)`` — (re)build the state from a full scan.
* ``refresh_incremental(delta)`` — fold ONLY the delta in: cost is
  O(|delta| + |groups|), never history scale.  Each refresh commits a
  new table version, so readers get snapshot isolation and time travel
  across refreshes for free (query yesterday's view by version).
* ``read(version=None)`` — the current (or any historical) state.

Exactness: merged aggregates equal full recompute bit-for-bit for
associative types (see ``operators.incremental``'s float-sum note);
``tests/test_matview.py`` pins refresh-chain ≡ one-shot equality and
version history.

At 100 TB the state table is GROUP-cardinality-sized; the delta fold is
one partial-aggregated union per refresh, and the versioned commit
rewrites only the state files — the raw history is never rescanned.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession

from merkonvectordb_spark.operators.incremental import (
    aggregate_state,
    merge_states,
)
from merkonvectordb_spark.sources.versioned import VersionedTable


class MaterializedView:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        state_ddl: str,
        keys: Sequence[str],
        aggs: Mapping[str, tuple[str, str]],
    ):
        self.keys = list(keys)
        self.aggs = dict(aggs)
        self.table = VersionedTable(spark, root, state_ddl)

    def refresh_full(self, rows: DataFrame) -> int:
        """(Re)build the state from scratch; returns the new version."""
        return self.table.replace(
            aggregate_state(rows, self.keys, self.aggs)
        )

    def refresh_incremental(
        self,
        delta: DataFrame,
        app_id: str | None = None,
        batch_id: int | None = None,
    ) -> int:
        """Fold a delta batch into the state; returns the new version.

        The delta is partially aggregated first, so only |groups(delta)|
        rows meet the persisted state in the merge.

        ``app_id``/``batch_id`` make the fold EXACTLY-ONCE from
        ``foreachBatch``: Structured Streaming redelivers a batch after
        a failure, and folding the same delta twice permanently inflates
        every sum/count it touched.  With the ids set, a batch at or
        below the committed watermark is a no-op returning the current
        version (the same ``txnAppId`` contract as
        ``VersionedTable.append_exactly_once``); the watermark commits
        ATOMICALLY with the merged state."""
        if (app_id is None) != (batch_id is None):
            raise ValueError("pass app_id and batch_id together")
        txn = None
        if app_id is not None:
            last = self.table.last_committed_batch(app_id)
            if last is not None and int(batch_id) <= last:
                return self.table.current_version()  # replay: no-op
            txn = (str(app_id), int(batch_id))
        delta_state = aggregate_state(delta, self.keys, self.aggs)
        merged = merge_states(
            self.table.read(), delta_state, self.keys, self.aggs
        )
        return self.table.replace(merged, txn=txn)

    def read(self, version: int | None = None) -> DataFrame:
        return self.table.read(version)
