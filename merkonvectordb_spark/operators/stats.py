"""Distributed order statistics: exact global quantiles without a
single-reducer sort.

``percentile()`` (and any per-group exact percentile) buffers a whole
group's values in one task — fine when groups are many (see
``queries_misc.q_lineitem_quantiles``), fatal for a GLOBAL quantile over
a 100 TB fact table.  The classic distributed algorithm avoids it:

1. range-partition the column (sampled boundaries) and sort within each
   partition — the global order becomes (partition, local rank);
2. count rows per partition (tiny: one row per partition) and prefix-sum
   the counts on the driver — P numbers, not data;
3. each requested quantile maps to one or two global ranks
   (PERCENTILE_CONT interpolation: pos = q·(n-1), ranks ⌊pos⌋/⌈pos⌉);
   translate global rank → (partition, local rank) with the offsets and
   fetch exactly those rows with a partition-local filter.

Total cost: one range shuffle + one P-row count + one filtered scan of
the sorted data.  Nothing ever holds more than its own partition, and
the only driver traffic is P counts and the handful of fetched values.
"""

from __future__ import annotations

from bisect import bisect_right
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_global_quantiles(
    df: DataFrame,
    col: str,
    qs: Sequence[float],
    num_partitions: int | None = None,
) -> list[float]:
    """PERCENTILE_CONT-interpolated exact global quantiles of ``col``.

    Returns one float per entry of ``qs`` (each in [0, 1]).  NULLs are
    excluded, matching SQL aggregate semantics.  Deterministic: the k-th
    order statistic does not depend on where sampled range boundaries
    land.
    """
    import pandas as pd

    src = df.select(F.col(col).cast("double").alias("__v")).where(
        F.col("__v").isNotNull()
    )
    par = num_partitions or df.sparkSession.sparkContext.defaultParallelism

    def _enumerate(batches):
        # per-partition local ranks: mapInPandas preserves the partition's
        # (sorted) row order, so a running counter IS the local rank — no
        # window, no second shuffle
        i = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["__lr"] = pd.RangeIndex(i + 1, i + 1 + len(pdf))
            i += len(pdf)
            yield pdf

    ranked = (
        src.repartitionByRange(par, F.asc("__v"))
        .sortWithinPartitions("__v")
        .withColumn("__pid", F.spark_partition_id())
        .mapInPandas(_enumerate, "__v DOUBLE, __pid INT, __lr LONG")
    ).persist()
    # per-partition counts: P rows to the driver — the ONLY collect
    counts = {
        r["__pid"]: r["n"]
        for r in ranked.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    pids = sorted(counts)
    offsets: list[int] = []  # cumulative rows BEFORE each pid
    total = 0
    for p in pids:
        offsets.append(total)
        total += counts[p]
    if total == 0:
        return [float("nan")] * len(qs)

    def locate(global_rank: int) -> tuple[int, int]:
        """0-based global rank → (pid, 1-based local rank)."""
        i = bisect_right(offsets, global_rank) - 1
        return pids[i], global_rank - offsets[i] + 1

    # every needed (pid, local rank) in one filtered pass
    wanted: dict[tuple[int, int], float] = {}
    plan: list[tuple[int, int, float]] = []  # (lo_rank, hi_rank, weight)
    for q in qs:
        pos = q * (total - 1)
        lo, hi = int(pos), min(int(pos) + 1, total - 1)
        plan.append((lo, hi, pos - int(pos)))
        for g in (lo, hi):
            wanted[locate(g)] = None  # type: ignore[assignment]
    cond = None
    for pid, lr in wanted:
        c = (F.col("__pid") == pid) & (F.col("__lr") == lr)
        cond = c if cond is None else (cond | c)
    for r in ranked.where(cond).collect():
        wanted[(r["__pid"], r["__lr"])] = float(r["__v"])
    ranked.unpersist()

    out: list[float] = []
    for lo, hi, w in plan:
        v_lo = wanted[locate(lo)]
        v_hi = wanted[locate(hi)]
        out.append(v_lo + (v_hi - v_lo) * w)
    return out
