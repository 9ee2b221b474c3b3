"""Change-data-capture application: a change log → the current snapshot.

``operators.store.upsert`` merges ONE batch into an existing state;
CDC application answers the other standard lakehouse question: given an
append-only log of keyed changes (upserts and deletes, each with a
monotonic sequence), what is the table NOW?  The Delta/Iceberg
``APPLY CHANGES`` / ``MERGE`` equivalent, as a pure transform.

Scale shape: latest-wins per key is ``max_by(payload, seq)`` — a
partial-aggregable aggregate (map-side combine reduces every partition
to one candidate row per key BEFORE the exchange), not a row_number
window (which shuffles every log row, then discards all but one per
key).  One shuffle of ≤|keys| combined rows; deletes drop after the
argmax, so a delete followed by nothing stays deleted and a later
re-insert revives the key — exactly log-replay semantics.

Precondition: ``seq_col`` is unique per key (a log offset, commit LSN,
or (ts, id) encoded into one comparable value) — ties would make
"latest" ambiguous in any engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_changes(
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Fold the change log into its end-state snapshot.

    ``changes`` rows carry the key columns, ``seq_col``, ``op_col``
    (``delete_op`` marks deletions; anything else is insert-or-update),
    and arbitrary payload columns.  Returns one row per live key with
    the latest payload and its sequence.

    Rows with a NULL ``seq_col`` are EXCLUDED explicitly: a null
    sequence has no position in the log order — ``max_by`` would
    silently skip them next to valid rows, and a key with ONLY null-seq
    rows would otherwise surface as a phantom all-NULL live row."""
    changes = changes.where(F.col(seq_col).isNotNull())
    keys = list(key_cols)
    payload = [
        c for c in changes.columns if c not in keys
    ]  # includes seq + op, so the winner's own op/seq survive the argmax
    latest = changes.groupBy(*keys).agg(
        F.max_by(F.struct(*payload), F.col(seq_col)).alias("__p")
    )
    flat = latest.select(
        *keys, *[F.col(f"__p.{c}").alias(c) for c in payload]
    )
    # null-safe: a NULL op is "not a delete" (common CDC encodings only
    # mark deletes) — a bare != would evaluate NULL and drop live keys
    return flat.where(
        ~F.col(op_col).eqNullSafe(F.lit(delete_op))
    ).drop(op_col)
