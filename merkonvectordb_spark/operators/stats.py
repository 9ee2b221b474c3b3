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

import math
from bisect import bisect_right
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_global_quantiles(
    df: DataFrame,
    col: str,
    qs: Sequence[float],
    num_partitions: int | None = None,
    return_count: bool = False,
) -> list[float] | tuple[list[float], int]:
    """PERCENTILE_CONT-interpolated exact global quantiles of ``col``.

    Returns one float per entry of ``qs`` (each in [0, 1]), or
    ``(values, n)`` with ``return_count=True`` — the non-null count
    falls out of the internal per-partition count pass, so callers that
    need it must not pay a second table scan.  NULLs are excluded,
    matching SQL aggregate semantics.  Deterministic: the k-th order
    statistic does not depend on where sampled range boundaries land.
    """
    import pandas as pd

    if not list(qs):
        # degenerate: nothing requested — don't pay the range shuffle
        # (and ranked.where(None) below would raise); the count, when
        # asked for, is one plain aggregate
        if return_count:
            n0 = df.where(F.col(col).isNotNull()).count()
            return [], n0
        return []
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
        empty = [float("nan")] * len(qs)
        return (empty, 0) if return_count else empty

    def locate(global_rank: int) -> tuple[int, int]:
        """0-based global rank → (pid, 1-based local rank)."""
        i = bisect_right(offsets, global_rank) - 1
        return pids[i], global_rank - offsets[i] + 1

    # every needed (pid, local rank) in one filtered pass
    wanted: dict[tuple[int, int], float] = {}
    plan: list[tuple[int, int, float]] = []  # (lo_rank, hi_rank, weight)
    for q in qs:
        pos = q * (total - 1)
        # hi = ceil(pos), so an integral pos gives lo == hi and the
        # interpolation below degenerates to exactly v_lo — replaying
        # Spark Percentile's floor==ceil early return (otherwise a
        # ±Inf/NaN neighbor would poison `(v_hi - v_lo) * 0`, and -0.0
        # order statistics would flip sign)
        lo, hi = int(math.floor(pos)), int(math.ceil(pos))
        plan.append((lo, hi, pos - lo))
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
        # explicit floor==ceil early return (Spark Percentile): with
        # lo == hi, `v_lo + (v_lo - v_lo) * 0` would still NaN on ±Inf
        out.append(v_lo if lo == hi else v_lo + (v_hi - v_lo) * w)
    return (out, total) if return_count else out


def grouped_exact_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    col: str,
    qs: dict[str, float],
) -> DataFrame:
    """Per-group PERCENTILE_CONT without ``percentile()``'s per-group
    value buffer (round 9: the ``percentile()`` form measured slope
    1.21/1.34 across two decades at sf1→sf3→sf10, 115.9 s at sf10 — its
    ObjectHashAggregate holds a value→count map per group that never
    spills; this form ran the same probe at slope ~0.9).

    One pass, one hash exchange on the group key: a per-group window
    ranks values with a SPILLABLE sort, each quantile fetches its ≤2
    interpolation rows by rank, and the interpolation replays Spark
    ``Percentile``'s exact arithmetic — ``pos = q·(n−1)`` 0-based,
    ``v_lo·(⌈pos⌉−pos) + v_hi·(pos−⌊pos⌋)`` — so results are
    bit-identical to the ``percentile()`` aggregate it replaces.

    ``qs`` maps output column name → quantile in [0, 1].  NULLs are
    excluded from ranks/counts (SQL aggregate semantics) but still
    counted by the ``n`` output column (``count(*)`` per group); groups
    with zero non-null values return NULL quantiles.  A NULL group KEY
    is a group like any other (SQL GROUP BY semantics): the counts join
    below is null-safe (``<=>``), so NULL-keyed rows are not silently
    dropped.

    Scale bound (same as any per-group exact percentile): a single
    group's values sort within one task — spillable, so it degrades to
    disk instead of OOM — and the group count is the parallelism.  For
    one-group/global quantiles use ``exact_global_quantiles``.
    """
    from pyspark.sql import Window

    groups = list(group_cols)
    vals = df.select(*groups, F.col(col).cast("double").alias("__v"))
    w = Window.partitionBy(*groups).orderBy(F.col("__v").asc_nulls_last())
    # Per-group counts via a partial-agg groupBy broadcast back — NOT a
    # second count-over-partition window: the unordered window re-buffers
    # every partition group through WindowExec's spill path and measured
    # +0 s at sf3 but +24 s at sf10 on identical data (round 9), while
    # the groupBy is map-side combinable and its output is |groups| rows.
    counts = F.broadcast(
        vals.groupBy(*groups).agg(
            F.count("__v").alias("__nv"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    # null-safe equi-join (still a BroadcastHashJoin — Catalyst hashes
    # EqualNullSafe keys) so a NULL group key joins its own counts row
    # instead of being dropped, matching groupBy's NULL-keyed group
    ranked_l = vals.withColumn("__rn", F.row_number().over(w)).alias("l")
    counts_r = counts.alias("r")
    jcond = None
    for g in groups:
        c = F.col(f"l.{g}").eqNullSafe(F.col(f"r.{g}"))
        jcond = c if jcond is None else (jcond & c)
    ranked = ranked_l.join(counts_r, jcond).select(
        "l.*", F.col("r.__nv").alias("__nv"), F.col("r.__n").alias("__n")
    )
    # 0-based position of each quantile within the group's non-null
    # order; a row is fetched iff its 0-based rank is some quantile's
    # floor or ceil.  NULLs sort last and can never match (__nv ≤ rank).
    def _pos(q: float):
        return F.lit(float(q)) * (F.col("__nv") - F.lit(1)).cast("double")

    # an all-NULL group has no rank match; keep its first row so the
    # group still emits (NULL quantiles + its count(*)) — no second
    # aggregation scan over df needed
    keep = (F.col("__nv") == 0) & (F.col("__rn") == 1)
    for q in qs.values():
        p = _pos(q)
        r0 = (F.col("__rn") - 1).cast("long")
        keep = (
            keep
            | (r0 == F.floor(p).cast("long"))
            | (r0 == F.ceil(p).cast("long"))
        )
    picked = ranked.where(keep)
    aggs = [
        F.first("__nv").alias("__nv"),
        F.first("__n").alias("__n"),
    ]
    for nm, q in qs.items():
        p = _pos(q)
        r0 = (F.col("__rn") - 1).cast("long")
        aggs.append(
            F.min(
                F.when(r0 == F.floor(p).cast("long"), F.col("__v"))
            ).alias(f"__lo_{nm}")
        )
        aggs.append(
            F.min(
                F.when(r0 == F.ceil(p).cast("long"), F.col("__v"))
            ).alias(f"__hi_{nm}")
        )
    agged = picked.groupBy(*groups).agg(*aggs)
    outs = []
    for nm, q in qs.items():
        p = F.lit(float(q)) * (F.col("__nv") - F.lit(1)).cast("double")
        lo, hi = F.floor(p).cast("long"), F.ceil(p).cast("long")
        outs.append(
            F.when(lo == hi, F.col(f"__lo_{nm}"))
            .otherwise(
                F.col(f"__lo_{nm}") * (hi.cast("double") - p)
                + F.col(f"__hi_{nm}") * (p - lo.cast("double"))
            )
            .alias(nm)
        )
    return agged.select(
        *groups,
        *outs,
        F.col("__n").cast("bigint").alias("n"),
    )


def grouped_exact_quantiles_ranged(
    df: DataFrame,
    group_cols: Sequence[str],
    col: str,
    qs: dict[str, float],
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group PERCENTILE_CONT for FEW HUGE GROUPS — parallelism =
    partitions, not groups.

    ``grouped_exact_quantiles`` sorts each group inside one task (the
    right plan when groups ≫ cores); with a handful of groups over a
    100 TB fact table that is a handful of tasks.  This form
    range-partitions on (group…, value) so every core sorts a slice,
    exactly like ``exact_global_quantiles`` but with per-(partition,
    group) counts: the driver sees P·G count rows + ≤2·G·|qs| fetched
    values — index metadata, never data.  NULL values are excluded
    (SQL aggregate semantics); all-NULL groups are absent from the
    output (callers joining thresholds back don't want them).

    Interpolation replays Spark ``Percentile``'s exact arithmetic, so
    thresholds computed here are bit-identical to the ``percentile()``
    aggregate's.  Runs two jobs at call time (counts + fetch) and
    returns a small local DataFrame of one row per group.
    """
    import pandas as pd

    if not qs:
        raise ValueError("qs must name at least one quantile")
    spark = df.sparkSession
    groups = list(group_cols)
    src = df.select(
        *groups, F.col(col).cast("double").alias("__v")
    ).where(F.col("__v").isNotNull())
    par = num_partitions or spark.sparkContext.defaultParallelism
    order = [F.asc(g) for g in groups] + [F.asc("__v")]

    def _enumerate(batches):
        # local rank within (partition, group): partition rows arrive
        # sorted by (groups…, __v), so a per-group running counter is
        # the local rank — same trick as exact_global_quantiles
        seen: dict[tuple, int] = {}
        for pdf in batches:
            pdf = pdf.copy()
            lrs = []
            for key in map(tuple, pdf[groups].itertuples(index=False)):
                nxt = seen.get(key, 0) + 1
                seen[key] = nxt
                lrs.append(nxt)
            pdf["__lr"] = pd.Series(lrs, index=pdf.index, dtype="int64")
            yield pdf

    gfields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in src.schema.fields
        if f.name in groups
    )
    ranked = (
        src.repartitionByRange(par, *order)
        .sortWithinPartitions(*groups, "__v")
        .withColumn("__pid", F.spark_partition_id())
        .mapInPandas(
            _enumerate, f"{gfields}, __v DOUBLE, __pid INT, __lr LONG"
        )
    ).persist()
    # P·G rows to the driver — the only data-independent collect
    crows = (
        ranked.groupBy("__pid", *groups)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    per_group: dict[tuple, list[tuple[int, int]]] = {}
    for r in crows:
        key = tuple(r[g] for g in groups)
        per_group.setdefault(key, []).append((r["__pid"], r["n"]))
    plans: dict[tuple, dict] = {}
    wanted: dict[tuple, float | None] = {}
    for key, parts in per_group.items():
        parts.sort()
        offs, tot = [], 0
        for _pid, n in parts:
            offs.append(tot)
            tot += n

        def locate(grank: int, parts=parts, offs=offs) -> tuple[int, int]:
            i = bisect_right(offs, grank) - 1
            return parts[i][0], grank - offs[i] + 1

        plan = {}
        for nm, q in qs.items():
            pos = q * (tot - 1)
            # hi = ceil(pos): an integral pos gives lo == hi, taking the
            # `v_lo` early-return below exactly as Spark Percentile does
            # when floor == ceil — the lo+1 form interpolated with
            # weight 0 instead, which NaNs on a ±Inf neighbor and flips
            # -0.0 to +0.0 (ADVICE round-9)
            lo, hi = int(math.floor(pos)), int(math.ceil(pos))
            plan[nm] = (pos, lo, hi)
            for g in (lo, hi):
                wanted[(key, *locate(g))] = None
        plans[key] = {"n": tot, "plan": plan, "locate": locate}
    cond = None
    for (key, pid, lr) in wanted:
        c = (F.col("__pid") == pid) & (F.col("__lr") == lr)
        for g, v in zip(groups, key):
            c = c & (F.col(g) == v)
        cond = c if cond is None else (cond | c)
    if cond is not None:
        for r in ranked.where(cond).collect():
            key = tuple(r[g] for g in groups)
            wanted[(key, r["__pid"], r["__lr"])] = float(r["__v"])
    ranked.unpersist()
    out_rows = []
    for key, info in plans.items():
        vals = []
        for nm, q in qs.items():
            pos, lo, hi = info["plan"][nm]
            v_lo = wanted[(key, *info["locate"](lo))]
            v_hi = wanted[(key, *info["locate"](hi))]
            # Spark Percentile's exact arithmetic (see
            # grouped_exact_quantiles)
            vals.append(
                v_lo
                if lo == hi
                else v_lo * (hi - pos) + v_hi * (pos - lo)
            )
        out_rows.append((*key, *vals, info["n"]))
    names = ", ".join(f"`{g}` {t}" for g, t in (
        (f.name, f.dataType.simpleString())
        for f in src.schema.fields
        if f.name in groups
    ))
    qnames = ", ".join(f"`{nm}` DOUBLE" for nm in qs)
    return spark.createDataFrame(
        out_rows, f"{names}, {qnames}, n_values BIGINT"
    )


def global_ntile(
    df: DataFrame,
    order_cols: Sequence,
    n_tiles: int,
    out_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``NTILE(n)`` over a global order — without the
    single-partition window ``ntile() OVER (ORDER BY ...)`` plans.

    ``order_cols`` are (col, 'asc'|'desc') pairs (or bare names, taken
    ascending) and must form a total order (include a unique tie-break).
    The global 0-based rank comes from the same distributed two-pass
    shape as ``exact_global_quantiles``: range-partition + local sort,
    P partition counts to the driver, offsets re-applied as literals
    (``operators.pipeline.global_exclusive_prefix_sum`` with a ones
    column).  The tile is then pure arithmetic on the rank — SQL NTILE
    semantics: with n rows and t tiles, the first ``n % t`` tiles get
    ``n // t + 1`` rows, the rest ``n // t``.  NULL order values sort
    LAST (worst tile) in BOTH directions — the DuckDB/SQL-standard ASC
    default, NOT Spark's native NULLS FIRST — so a ntile oracle can
    never silently diverge on a nullable metric.
    """
    from merkonvectordb_spark.operators.pipeline import (
        global_exclusive_prefix_sum,
    )

    norm: list[tuple[str, str]] = []
    for oc in order_cols:
        if isinstance(oc, str):
            norm.append((oc, "asc"))
        else:
            c, d = oc
            norm.append((c, d.lower()))

    work = df
    keys: list[str] = []
    drop: list[str] = []
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName()
        in ("byte", "short", "integer", "long", "float", "double", "decimal")
    }
    floating = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("float", "double")
    }
    integral = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("byte", "short", "integer", "long")
    }
    for i, (c, d) in enumerate(norm):
        if d == "desc":
            # the range partitioner orders ascending only, so DESC is
            # encoded as (null-flag ASC, nan-flag ASC, negated value
            # ASC): the null flag reproduces SQL's DESC NULLS LAST (a
            # bare -col would send NULLs to tile 1); the NaN flag
            # reproduces Spark's NaN-is-largest (so NaN sorts FIRST
            # under DESC — negating alone leaves -NaN = NaN sorting
            # LAST, diverging from builtin NTILE); integral columns
            # use (-1 - x) — a strictly decreasing bijection on the
            # FULL long range (-1 - Long.MIN = Long.MAX), so no
            # -Long.MIN_VALUE overflow (an ArithmeticException under
            # ANSI mode, silent wrap otherwise) and the sort key stays
            # a cheap long instead of a DECIMAL.  Negation is only
            # sound for numerics — reject anything else loudly instead
            # of mis-sorting.
            if c not in numeric:
                raise TypeError(
                    f"desc ordering needs a numeric column, got {c!r}"
                )
            kn = f"__ordn{i}"
            k = f"__ord{i}"
            work = work.withColumn(kn, F.col(c).isNull().cast("int"))
            keys.append(kn)
            drop.append(kn)
            if c in floating:
                knan = f"__ordf{i}"
                work = work.withColumn(
                    knan,
                    F.when(F.isnan(F.col(c)), 0).otherwise(1),
                )
                keys.append(knan)
                drop.append(knan)
            if c in integral:
                work = work.withColumn(k, F.lit(-1) - F.col(c))
            else:
                work = work.withColumn(k, -F.col(c))
            keys.append(k)
            drop.append(k)
        else:
            # ASC also gets an explicit null flag: Spark's native sort
            # is NULLS FIRST (NULL lands in the BEST tile), DuckDB's /
            # the SQL-standard ASC default is NULLS LAST — an ASC
            # metric with NULLs would silently diverge from any ntile
            # oracle.  NULLS LAST in BOTH directions: NULL is always
            # the worst tile.
            kn = f"__ordn{i}"
            work = work.withColumn(kn, F.col(c).isNull().cast("int"))
            keys.append(kn)
            drop.append(kn)
            keys.append(c)

    work = work.withColumn("__one", F.lit(1))
    ranked = global_exclusive_prefix_sum(
        work, keys, "__one", out_col="__rank", num_partitions=num_partitions
    )
    n = ranked.count()  # metadata-sized job over the persisted ranking
    tile = _ntile_expr(n, n_tiles, F.col("__rank"))
    return ranked.withColumn(out_col, tile).drop("__one", "__rank", *drop)


def _ntile_expr(n: int, n_tiles: int, r) -> "F.Column":
    """SQL NTILE arithmetic on a 0-based rank column: with n rows and t
    tiles, the first ``n % t`` tiles get ``n // t + 1`` rows, the rest
    ``n // t``.  Single definition shared by ``global_ntile`` and
    ``global_ntile_multi`` so boundary-tie semantics can't drift."""
    base, rem = divmod(n, n_tiles)
    if base == 0:
        return (r + 1).cast("int")
    cut = rem * (base + 1)
    return (
        F.when(r < cut, F.floor(r / (base + 1)))
        .otherwise(rem + F.floor((r - cut) / base))
        .cast("int")
        + 1
    )


def exact_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact Mann-Whitney AUC of an integer ``score_col`` against a 0/1
    ``label_col`` — "does the score rank positives above negatives?" —
    the evaluation rail for any quality/classifier column before it
    gates a corpus.

    Tie handling is the textbook midrank rule, carried in DOUBLED
    integer arithmetic so no fraction ever materializes: for each
    distinct score ``v`` with ``n_v`` rows (``p_v`` positive) and
    ``C_v`` rows strictly below, the doubled positive rank-sum is

        2R = Σ_v p_v · (2·C_v + n_v + 1)

    and AUC = (2R − P(P+1)) / (2·P·N). The output carries the exact
    BIGINT numerator/denominator plus the one rounded double.

    Scale shape: the corpus compresses FIRST to one row per distinct
    score (partial-agg groupBy) — for a micro-unit score in [0, 1e6]
    that frame is ≤ 1,000,001 rows no matter the corpus size, so the
    single cumulative window over it is bounded by the VALUE DOMAIN,
    not the data.  2R stays in BIGINT up to ~1e9 rows (P·(2N+1) <
    2^63); beyond that, swap the doubled sum to DECIMAL(38,0).
    NULL labels count as negatives; NULL scores rank below every value
    (first window position) — made EXPLICIT with ``asc_nulls_first``
    here, and any SQL oracle must say ``ORDER BY score NULLS FIRST``
    (engines disagree on the default: Spark ASC is NULLS FIRST, DuckDB
    ASC is NULLS LAST — left implicit, a NULL score silently
    hash-diverges the two sides).
    """
    from pyspark.sql import Window

    per_v = df.groupBy(F.col(score_col).alias("__v")).agg(
        F.count(F.lit(1)).alias("__nv"),
        F.sum(
            F.when(F.col(label_col).cast("long") == 1, 1).otherwise(0)
        ).alias("__pv"),
    )
    w = (
        Window.orderBy(F.asc_nulls_first("__v"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = per_v.select(
        "__nv",
        "__pv",
        F.coalesce(F.sum("__nv").over(w), F.lit(0)).alias("__cv"),
    )
    agg = cum.agg(
        F.sum(
            F.col("__pv") * (2 * F.col("__cv") + F.col("__nv") + 1)
        ).alias("__two_r"),
        F.sum("__pv").alias("p_cnt"),
        F.sum("__nv").alias("__n_tot"),
    )
    num = F.col("__two_r") - F.col("p_cnt") * (F.col("p_cnt") + 1)
    den = 2 * F.col("p_cnt") * (F.col("__n_tot") - F.col("p_cnt"))
    return agg.select(
        F.col("p_cnt"),
        (F.col("__n_tot") - F.col("p_cnt")).alias("neg_cnt"),
        num.alias("auc_num"),
        den.alias("auc_den"),
        F.when(
            den > 0,
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("auc"),
    )


def linear_probe_2f(
    df: DataFrame,
    y_col: str,
    x1_col: str,
    x2_col: str,
) -> DataFrame:
    """Closed-form OLS of integer ``y`` on two integer features plus an
    intercept — "train" a tiny linear quality model inside the engine
    (the cheap probe you fit before paying for a real classifier).

    One aggregation pass collects the ten normal-equation moments as
    EXACT BIGINT sums (order-free, partial-aggregable); the 3x3 system
    solves by Cramer's rule in a FIXED double expression tree over
    those integers, so any engine replaying the same tree on the same
    BIGINTs produces bit-identical coefficients (each IEEE op is
    correctly rounded; cross-engine divergence needs a different tree,
    not a different engine).  R^2 comes from the same moments via the
    normal-equation identity SSE = Syy - (b0·Sy + b1·Sx1y + b2·Sx2y).

    Bounds: BIGINT moments hold to ~9e6 rows for micro-unit y
    (Σy² ≤ n·10¹² < 2^63 ⇒ n < 9.2e6; rescale y or swap the moment
    sums to DECIMAL(38,0) beyond that); the double casts stay EXACT
    below 2^53 and remain
    cross-engine REPRODUCIBLE above it (both engines round the same
    BIGINT to the same nearest double).  Degenerate designs (singular
    matrix, zero variance) yield NULL coefficients, never a crash.
    Scale shape: one scan, one 1-row partial-agg fold — no shuffle of
    the data, no iteration.
    """
    y = F.col(y_col).cast("bigint")
    x1 = F.col(x1_col).cast("bigint")
    x2 = F.col(x2_col).cast("bigint")
    m = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x1).alias("sx1"),
        F.sum(x2).alias("sx2"),
        F.sum(y).alias("sy"),
        F.sum(x1 * x1).alias("sx11"),
        F.sum(x1 * x2).alias("sx12"),
        F.sum(x2 * x2).alias("sx22"),
        F.sum(x1 * y).alias("sx1y"),
        F.sum(x2 * y).alias("sx2y"),
        F.sum(y * y).alias("syy"),
    )
    d = [F.col(c).cast("double") for c in (
        "n", "sx1", "sx2", "sy", "sx11", "sx12", "sx22", "sx1y", "sx2y",
        "syy",
    )]
    n, sx1d, sx2d, syd, sx11, sx12, sx22, sx1y, sx2y, syy = d
    det = (
        n * (sx11 * sx22 - sx12 * sx12)
        - sx1d * (sx1d * sx22 - sx12 * sx2d)
        + sx2d * (sx1d * sx12 - sx11 * sx2d)
    )
    det0 = (
        syd * (sx11 * sx22 - sx12 * sx12)
        - sx1d * (sx1y * sx22 - sx12 * sx2y)
        + sx2d * (sx1y * sx12 - sx11 * sx2y)
    )
    det1 = (
        n * (sx1y * sx22 - sx12 * sx2y)
        - syd * (sx1d * sx22 - sx12 * sx2d)
        + sx2d * (sx1d * sx2y - sx1y * sx2d)
    )
    det2 = (
        n * (sx11 * sx2y - sx1y * sx12)
        - sx1d * (sx1d * sx2y - sx1y * sx2d)
        + syd * (sx1d * sx12 - sx11 * sx2d)
    )
    b0 = det0 / det
    b1 = det1 / det
    b2 = det2 / det
    sst = syy - syd * syd / n
    sse = syy - (b0 * syd + b1 * sx1y + b2 * sx2y)
    ok = det != F.lit(0.0)
    return m.select(
        F.col("n"),
        F.when(ok, F.round(b0, 6)).alias("b0"),
        F.when(ok, F.round(b1, 6)).alias("b1"),
        F.when(ok, F.round(b2, 6)).alias("b2"),
        F.when(ok & (sst > 0), F.round(1.0 - sse / sst, 6)).alias("r2"),
    )


def global_ntile_multi(
    df: DataFrame,
    metrics: Sequence,
    n_tiles: int,
    tie_col: str,
    out_cols: Sequence[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact NTILE over SEVERAL integer metrics in ONE distributed
    ranking pass — k independent ``global_ntile`` calls cost k range
    shuffles + k driver-offset jobs (stage latency dominates on
    dimension-sized frames; measured 3x on the RFM tercile); this
    unpivots the k metrics into (metric_id, key) rows, ranks the 3n-row
    frame ONCE, and recovers each metric's rank as
    ``global_rank − metric_id·n`` (every metric contributes exactly n
    rows, so the per-metric blocks are contiguous in the combined
    order).

    ``metrics`` are (col, 'asc'|'desc') pairs over INTEGRAL columns
    (byte/short/int/long — a float would be silently floor-truncated by
    the bigint unpivot key, corrupting the order: rejected loudly
    instead); DESC uses the same overflow-free ``(-1 − x)`` full-range
    decreasing bijection as ``global_ntile`` and the same explicit
    null-flag key; NULL metric values land in the WORST tile in BOTH
    directions (NULLS LAST — the DuckDB/SQL-standard ASC default,
    matching ``global_ntile``).  Ties break on ``tie_col`` ascending
    (must be unique).  Tile arithmetic and boundary-tie behavior are
    ``_ntile_expr`` — the same single definition ``global_ntile`` uses
    — pinned by a parity test, so swapping k calls for one is free of
    semantic drift.
    """
    from merkonvectordb_spark.operators.pipeline import (
        global_exclusive_prefix_sum,
    )

    if len(metrics) != len(out_cols) or not metrics:
        raise ValueError("metrics and out_cols must align and be non-empty")
    integral = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("byte", "short", "integer", "long")
    }
    arms = []
    for i, m in enumerate(metrics):
        c, d = (m, "asc") if isinstance(m, str) else m
        if c not in integral:
            raise TypeError(
                f"global_ntile_multi needs integral metric columns, got {c!r}"
            )
        key = F.col(c).cast("bigint")
        # null flag first in BOTH directions: NULLs must sort LAST
        # (worst tile) — under DESC a bare NULL key would range-sort
        # FIRST; under ASC Spark's native NULLS FIRST would put NULL in
        # the BEST tile while DuckDB's/the SQL-standard ASC default is
        # NULLS LAST, silently diverging from any ntile oracle.
        nf = F.col(c).isNull().cast("int")
        if d.lower() == "desc":
            key = F.lit(-1) - key
        arms.append(
            F.struct(
                F.lit(i).cast("int").alias("__mi"),
                nf.alias("__nf"),
                key.alias("__k"),
            )
        )
    unp = (
        df.select(tie_col, F.explode(F.array(*arms)).alias("__e"))
        .select(
            tie_col,
            F.col("__e.__mi").alias("__mi"),
            F.col("__e.__nf").alias("__nf"),
            F.col("__e.__k").alias("__k"),
        )
        .withColumn("__one", F.lit(1))
    )
    ranked = global_exclusive_prefix_sum(
        unp,
        ["__mi", "__nf", "__k", tie_col],
        "__one",
        out_col="__grank",
        num_partitions=num_partitions,
    )
    # count AFTER the prefix sum: the ranking frame is persisted, so
    # this is a metadata-sized job — an upfront df.count() would fold
    # the whole upstream lineage (e.g. a corpus aggregation) twice
    n = ranked.count() // len(metrics)
    r = F.col("__grank") - F.col("__mi").cast("bigint") * F.lit(n)
    tile = _ntile_expr(n, n_tiles, r)
    tiles = ranked.withColumn("__tile", tile).groupBy(tie_col).agg(
        *[
            F.max(
                F.when(F.col("__mi") == i, F.col("__tile"))
            ).alias(out)
            for i, out in enumerate(out_cols)
        ]
    )
    return df.join(tiles, tie_col)
