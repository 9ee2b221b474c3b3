"""Temporal joins Spark lacks as built-ins: as-of join and interval
(range) join — both composed from DataFrame ops with scale-safe shapes.

The reference has no joins at all (SURVEY §2.7); these are north-star
additions every time-series / training-data pipeline needs.

**As-of join** (``asof_join``): for each left row, the single right row
with the greatest ``right_ts <= left_ts`` per key.  The naive plan — an
inequality join then a per-left-row max — is a range cross product that
explodes on dense keys.  We use the *union-merge* shape instead: tag and
union both sides, one window per key ordered by (ts, side, seq) carrying
the last-seen right payload forward (``F.last(ignorenulls=True)``).
Cost: ONE shuffle of |L|+|R| rows on the key — identical asymptotics to
a sort-merge join, no multiplicity blowup, AQE-splittable per key.

**Interval join** (``interval_join``): match left rows to every interval
``[start, end)`` of the same key that contains ``left_ts``.  Scale shape:
quantize time into fixed bins, explode each interval into the bins it
covers (bounded when interval length is bounded), equi-join on
(key, bin), then the exact containment filter.  The comparison count is
Σ|bin-bucket|² — never |L|·|R| — the same bucketing argument as the LSH
dedup pipeline (operators/dedup.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    suffix: str = "_right",
) -> DataFrame:
    """Merge-shaped as-of join (inclusive: right_ts <= left_ts).

    Returns every ``left`` row plus ``<col><suffix>`` for each requested
    right payload column and ``<right_ts><suffix>`` (NULL when no right
    row precedes).  Ties on the timestamp resolve right-row-visible
    (a right row AT left_ts matches); among DUPLICATE right (key, ts)
    rows the winner is deterministic — the greatest payload in JSON
    order (an explicit tie column in the merge window; without it the
    carried value would depend on shuffle order).  Pass a deduplicated
    right side when a domain-specific rule is wanted.
    """
    rt = right_ts + suffix
    payload = [rt, *[c + suffix for c in right_cols]]
    # the whole right row travels as ONE struct: per-column
    # last(ignorenulls) would pick each payload column's latest NON-NULL
    # value independently, so two right rows with NULLs in different
    # columns could blend into a row that never existed — a struct is
    # non-null whenever the right ROW exists, making the carried winner
    # a single whole row by construction
    carry = F.struct(
        F.col(right_ts).alias(rt),
        *[F.col(c).alias(c + suffix) for c in right_cols],
    )
    # a NULL right_ts row has no position in time: ascending sort puts
    # NULLs FIRST, so without this filter its (non-null) carry struct
    # would become visible to every left row before the first real
    # right row
    right = right.where(F.col(right_ts).isNotNull())
    r = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),  # right sorts BEFORE left at equal ts
        F.to_json(carry).alias("__tie"),
        carry.alias("__carry"),
    )
    l = left.select(
        *left.columns,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit("").alias("__tie"),
        F.lit(None).cast(r.schema["__carry"].dataType).alias("__carry"),
    )
    merged = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.asc("__t"), F.asc("__side"), F.asc("__tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn(
        "__c", F.last("__carry", ignorenulls=True).over(w)
    )
    return carried.where(F.col("__side") == 1).select(
        *left.columns,
        *[F.col("__c").getField(p).alias(p) for p in payload],
    )


def interval_join(
    left: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bin_seconds: int = 600,
) -> DataFrame:
    """Bucketed interval containment join: left rows × intervals of the
    same key with ``start <= left_ts < end`` (half-open).

    Each interval explodes into its covered time bins — for intervals no
    longer than ``bin_seconds`` that is at most 2 rows; generally
    ``ceil(len/bin)+1`` — so the equi-join on (key…, bin) bounds the
    candidate set without ever forming the range cross product.
    """
    # integral µs arithmetic throughout: unix_timestamp truncates
    # sub-second parts and double division can land one bin off at
    # boundaries — `div` on unix_micros is exact
    bin_us = bin_seconds * 1_000_000
    lb = left.withColumn(
        "__bin", F.expr(f"unix_micros({left_ts}) div {bin_us}")
    )
    s_bin = F.expr(f"unix_micros({start}) div {bin_us}")
    # half-open [start, end): the end-instant bin only matters if the
    # interval extends INTO it, hence the (end - 1µs) bound
    e_bin = F.expr(f"(unix_micros({end}) - 1) div {bin_us}")
    ib = intervals.withColumn(
        "__bin", F.explode(F.sequence(s_bin, F.greatest(e_bin, s_bin)))
    )
    return (
        lb.join(ib, [*on, "__bin"])
        .where(
            (F.col(left_ts) >= F.col(start)) & (F.col(left_ts) < F.col(end))
        )
        .drop("__bin")
    )


def scd2_history(
    df,
    key_cols,
    attr_col: str,
    ts_col: str = "ts",
    order_cols=("ts",),
):
    """Type-2 slowly-changing-dimension historization: collapse an event
    log into validity intervals — one row per (key, attribute-run) with
    ``valid_from`` / ``valid_to`` (NULL = currently open).

    Change detection is NULL-SAFE (``row_number = 1 OR NOT prev <=>
    attr``): a transition INTO a NULL attribute is a run of its own — a
    bare ``!=`` evaluates NULL there and silently extends the previous
    value's validity.  Interval close is ``lead(valid_from)`` over the
    surviving change rows.  Both windows hash-partition on the key — Spark reuses the
    single exchange for the two window stages, so the whole
    historization is ONE shuffle of the log, no self-joins.  Ties in
    the order must be broken by unique columns (pass them in
    ``order_cols``) or runs are nondeterministic.
    """
    from pyspark.sql import Window

    keys = list(key_cols)
    order = [F.asc(c) for c in order_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    changed = (
        df.withColumn("__prev", F.lag(F.col(attr_col)).over(w))
        .withColumn("__rn", F.row_number().over(w))
        .where(
            (F.col("__rn") == 1)
            | (~F.col("__prev").eqNullSafe(F.col(attr_col)))
        )
        .drop("__prev", "__rn")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return changed.select(
        *keys,
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
    )
