"""Z-order (Morton) data layout for multi-dimensional file pruning.

Parquet min/max footer statistics prune a scan only on columns the data
is clustered by; sorting by (a, b) clusters a perfectly and b not at
all.  Interleaving the bits of both columns' rank spaces gives a single
sort key whose contiguous ranges are small hyper-rectangles in (a, b) —
so range-partitioning + sorting by the z-value leaves EVERY interleaved
column with tight per-file min/max bounds, and selective filters on any
of them skip most files.  This is the layout trick behind
Delta/Iceberg's OPTIMIZE ZORDER, expressed here as plain columns +
``repartitionByRange`` — no table format required.

The z-value is a pure closed-form bit expression (shift/or over fixed
bit width), identical in any engine — which makes the whole layout
decision oracle-checkable row-by-row, not a heuristic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of each (non-negative integer)
    column: output bit ``i·n + j`` is bit ``i`` of column ``j``.  With
    n columns at 16 bits each the key fits comfortably in a BIGINT up
    to n = 3.  Out-of-range values CLAMP to the ends of the bit range
    (a true clamp, not modulo: wrapping would sort value 2^bits right
    next to value 0, smearing a file's min/max stats across the whole
    domain — the top bucket merely saturates instead).  Callers should
    still pre-scale: rank/bucket ids, not raw values, are the usual
    input.
    """
    n = len(cols)
    if n == 0:
        raise ValueError("need at least one column")
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits overflows BIGINT")
    hi = F.lit((1 << bits) - 1)
    clamped = [
        F.least(F.greatest(c.cast("bigint"), F.lit(0)), hi) for c in cols
    ]
    z: Column | None = None
    for i in range(bits):
        for j, c in enumerate(clamped):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            term = F.shiftleft(bit, i * n + j)
            z = term if z is None else z.bitwiseOR(term)
    return z.cast("bigint")


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Re-cluster ``df`` for multi-dimensional pruning: range-partition
    and sort by the Morton key of ``cols``.  Written out as parquet,
    every partition's footer then carries tight min/max for ALL the
    interleaved columns.  One range shuffle — the same cost as a plain
    sort-by-one-column layout."""
    par = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    key = zorder_key([F.col(c) for c in cols], bits)
    return (
        df.withColumn("__z", key)
        .repartitionByRange(par, F.asc("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
