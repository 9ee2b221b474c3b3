"""Incremental view maintenance for distributive aggregates.

A 100 TB pipeline does not recompute yesterday's aggregate over all of
history — it merges the new partition's partial aggregate into the
materialized state.  For distributive aggregates (count, sum, min, max)
the merge is itself just an aggregation over the union of states:

    maintain(state, delta) = agg(state ∪ agg(delta))

so the whole maintenance step costs O(|delta| + |state|) with |state| at
GROUP cardinality, never history scale.  (avg and other algebraic
aggregates decompose into these: maintain (sum, count), derive avg at
read time.  Holistic aggregates — exact percentiles, distinct — need a
sketch instead: see operators.sketch.)

Exactness note: merged SUMs equal full-recompute SUMs bit-for-bit only
for associative types — integers, longs, decimals.  Double sums differ
in the last ulp depending on grouping; callers who need cross-run or
cross-engine equality scale doubles to integers first (the measured
float-sum law, e.g. ``floor(value * 100)`` for cents).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ONE table drives both build and merge — a two-sided dispatch lets the
# pair drift (a kind one side accepts and the other rejects)
_BUILD = {
    # ROW count (count(*)), not count(col): every caller mirrors a
    # count(*) oracle, and count(col) silently undercounts on a NULL in
    # the counted column — breaking maintain == recompute parity.  The
    # input column is accepted but ignored for this kind.
    "count": lambda col: F.count(F.lit(1)),
    "sum": lambda col: F.sum(F.col(col)),
    "min": lambda col: F.min(F.col(col)),
    "max": lambda col: F.max(F.col(col)),
}
_MERGE = {
    "count": F.sum,  # counts add
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}
assert set(_BUILD) == set(_MERGE)


def aggregate_state(
    rows: DataFrame, keys: Sequence[str], aggs: Mapping[str, tuple[str, str]]
) -> DataFrame:
    """Build (or partially build) the materialized state: ``aggs`` maps
    output column → (kind, input column), kind ∈ count/sum/min/max.
    ``count`` is a ROW count (count(*) semantics; its input column is
    ignored)."""
    exprs = []
    for out, (kind, col) in aggs.items():
        fn = _BUILD.get(kind)
        if fn is None:
            raise ValueError(f"non-distributive aggregate: {kind!r}")
        exprs.append(fn(col).alias(out))
    return rows.groupBy(*keys).agg(*exprs)


def merge_states(
    state: DataFrame,
    delta_state: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, tuple[str, str]],
) -> DataFrame:
    """Fold a delta's partial aggregate into the materialized state.
    Input frames must share the state schema (keys + agg columns); new
    keys appear, existing keys merge, untouched keys pass through."""
    exprs = []
    for out, (kind, _) in aggs.items():
        fn = _MERGE.get(kind)
        if fn is None:
            raise ValueError(f"non-distributive aggregate: {kind!r}")
        exprs.append(fn(F.col(out)).alias(out))
    return state.unionByName(delta_state).groupBy(*keys).agg(*exprs)
