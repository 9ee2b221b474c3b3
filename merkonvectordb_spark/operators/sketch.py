"""Mergeable distinct-count sketch (KMV — k minimum values) as a pure
DataFrame composition.

The reference has no sketching surface; this is a north-star extension
for 100 TB profiling: estimate the distinct count of a key column with
a bounded-size, mergeable summary instead of a full distinct shuffle.

KMV: hash every value to a uniform 60-bit integer, keep the k smallest
DISTINCT hashes.  If fewer than k survive the estimate is exact; else
``est = (k-1) / (h_k / 2^60)`` where ``h_k`` is the k-th smallest hash
(the classic KMV/bottom-k estimator — Bar-Yossef et al. 2002; relative
error ≈ 1/√(k−2)).  Determinism: the hash is md5 of the value's string
form, identical in Spark (``conv(substring(md5(x),1,15),16,10)``) and
DuckDB (``CAST('0x'||substring(md5(x),1,15) AS BIGINT)``), so the
estimate is bit-for-bit reproducible — and oracle-checkable — in both
engines.

Scale shape: the inner ``distinct()`` partial-aggregates map-side (each
partition dedupes before the exchange), so the shuffle carries only
per-partition-distinct 8-byte longs; the ``orderBy().limit(k)`` plans
as TakeOrderedAndProject (per-partition heap of k, driver merges P·k
rows).  Nothing unbounded reaches one task.  Sketches are mergeable by
construction: union the hash sets, re-take the bottom k (tested in
``tests/test_sketch.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from merkonvectordb_spark.functions.hashing import md5_hash60

TWO_POW_60 = float(1 << 60)


def kmv_hash(col: Column) -> Column:
    """Deterministic uniform 60-bit hash of a value's string form
    (the repo-wide shared hash — functions/hashing.py)."""
    return md5_hash60(col)


def kmv_bottom_k(df: DataFrame, column: str, k: int) -> DataFrame:
    """The sketch itself: the k smallest distinct hashes of ``column``
    (single column ``h``, ≤ k rows).  This is the mergeable summary."""
    if k < 3:
        raise ValueError("kmv requires k >= 3")
    return (
        df.where(F.col(column).isNotNull())
        .select(kmv_hash(F.col(column)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def _kmv_estimator(k: int) -> Column:
    """THE estimator expression over (__n, __mx) aggregate columns —
    defined once so the global and grouped variants can never drift:
    exact when the sketch is not full, else (k-1)·2^60/max."""
    return (
        F.when(F.col("__n") < k, F.col("__n").cast("double"))
        .otherwise(
            F.lit(float(k - 1)) * F.lit(TWO_POW_60) / F.col("__mx").cast("double")
        )
        .alias("est_distinct")
    )


def kmv_estimate(sketch: DataFrame, k: int) -> DataFrame:
    """One-row estimate from a bottom-k sketch: exact when the sketch is
    not full, else the KMV estimator.  All arithmetic is double with
    exactly-representable constants, so Spark and DuckDB agree."""
    return sketch.agg(
        F.count("h").alias("__n"), F.max("h").alias("__mx")
    ).select(_kmv_estimator(k))


def kmv_distinct(df: DataFrame, column: str, k: int = 256) -> DataFrame:
    """Estimate ``count(distinct column)`` via a k-minimum-values
    sketch; returns a one-row DataFrame with ``est_distinct``."""
    return kmv_estimate(kmv_bottom_k(df, column, k), k)


def kmv_merge(*sketches: DataFrame, k: int) -> DataFrame:
    """Merge bottom-k sketches (e.g. built on disjoint shards): union
    the hash sets, dedupe, re-take the bottom k.  The result is the
    sketch of the union of the inputs — KMV's defining property."""
    if k < 3:
        raise ValueError("k must be >= 3 (estimator needs k-1 > 1)")
    if not sketches:
        raise ValueError("kmv_merge needs at least one sketch")
    it = iter(sketches)
    merged = next(it)
    for s in it:
        merged = merged.unionByName(s)
    return merged.distinct().orderBy("h").limit(k)


# ---------------------------------------------------------------------------
# heavy hitters: Misra-Gries candidates + exact verification pass
# ---------------------------------------------------------------------------


def mg_candidates(df: DataFrame, column: str, m: int) -> DataFrame:
    """Per-partition Misra-Gries summaries of ``column``; returns the
    distinct union of surviving items (≤ m per partition).

    The MG invariant (mergeable-summaries form, Agarwal et al. 2012):
    after absorbing n_p rows with capacity m, an item's undercount is at
    most n_p/(m+1) — so every item with partition frequency above that
    survives, and summing the per-partition bounds, **every item with
    global frequency > n/(m+1) appears in at least one partition's
    summary**.  That completeness guarantee is what makes the two-pass
    exact heavy hitters below correct.

    Each partition's state is a bounded m-entry counter map, merged
    batch-at-a-time with vectorized pandas ops (value_counts → add →
    subtract the (m+1)-th largest → drop non-positive): memory is O(m)
    per task regardless of partition size, and nothing shuffles — the
    output is the tiny candidate set itself.
    """
    if m < 1:
        raise ValueError("capacity m must be >= 1")
    import pandas as pd

    src = df.where(F.col(column).isNotNull()).select(
        F.col(column).cast("string").alias("item")
    )

    def _mg(batches):
        counters = pd.Series(dtype="int64")
        for pdf in batches:
            batch = pdf["item"].value_counts()
            counters = counters.add(batch, fill_value=0)
            if len(counters) > m:
                cut = counters.nlargest(m + 1).iloc[-1]
                counters = counters - cut
                counters = counters[counters > 0]
        yield pd.DataFrame({"item": counters.index.astype(str)})

    return src.mapInPandas(_mg, "item STRING").distinct()


def exact_heavy_hitters(
    df: DataFrame,
    column: str,
    phi_num: int,
    phi_den: int,
    m: int | None = None,
) -> DataFrame:
    """Exact items with frequency ≥ (phi_num/phi_den)·n, in bounded
    memory: MG candidate generation (pass 1) + exact counting of the
    candidate set only (pass 2).

    A plain ``groupBy(column)`` is exact but its hash-aggregate state is
    proportional to the number of DISTINCT items — unbounded on a
    100 TB key column.  Here pass 2's aggregate only ever holds the
    ≤ m·P candidate items (broadcast semi-join prunes everything else
    map-side), and MG completeness (``m ≥ phi_den/phi_num`` ⇒ threshold
    > n/(m+1)) guarantees no qualifying item was pruned.  The threshold
    compare is integer arithmetic (``cnt·phi_den ≥ n·phi_num``) — no
    float boundary, so the result is bit-exact and oracle-checkable
    against a full GROUP BY ... HAVING.
    """
    if phi_num <= 0 or phi_den <= 0:
        raise ValueError("phi must be a positive rational")
    need = -(-phi_den // phi_num)  # ceil(1/phi): MG completeness bound
    cap = m if m is not None else need
    if cap < need:
        raise ValueError(
            f"capacity m={cap} cannot guarantee completeness at "
            f"phi={phi_num}/{phi_den}; need m >= {need}"
        )
    cand = mg_candidates(df, column, cap)
    src = df.where(F.col(column).isNotNull()).select(
        F.col(column).cast("string").alias("item")
    )
    n_total = src.agg(F.count(F.lit(1)).alias("n"))
    counted = (
        src.join(F.broadcast(cand), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(n_total))
        .where(F.col("cnt") * phi_den >= F.col("n") * phi_num)
        .select("item", "cnt")
    )


def kmv_bottom_k_grouped(
    df: DataFrame, group_col: str, column: str, k: int
) -> DataFrame:
    """Per-group bottom-k sketches in ONE pass: distinct (group, hash)
    pairs, then a per-group rank keep of the k smallest — the shuffle
    carries per-partition-distinct hashes only, and every group's
    summary stays ≤ k rows (mergeable exactly like the global sketch)."""
    if k < 3:
        raise ValueError("kmv requires k >= 3")
    from pyspark.sql import Window

    hashes = (
        df.where(F.col(column).isNotNull())
        .select(group_col, kmv_hash(F.col(column)).alias("h"))
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy(F.asc("h"))
    return (
        hashes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_distinct_grouped(
    df: DataFrame, group_col: str, column: str, k: int = 256
) -> DataFrame:
    """Per-group distinct-count estimates: (group_col, est_distinct)."""
    sk = kmv_bottom_k_grouped(df, group_col, column, k)
    return (
        sk.groupBy(group_col)
        .agg(F.count("h").alias("__n"), F.max("h").alias("__mx"))
        .select(group_col, _kmv_estimator(k))
    )


# ---------------------------------------------------------------------------
# fixed-grid histogram quantiles — a deterministic, mergeable
# approximate-quantile summary
# ---------------------------------------------------------------------------


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: tuple[float, ...],
    bins: int = 128,
    round_dp: int = 6,
) -> DataFrame:
    """Approximate quantiles from a fixed-grid histogram: two linear
    passes (global min/max, then per-bin counts — both one
    partial-aggregable shuffle of ≤ ``bins`` rows), then linear
    interpolation inside the bin where the cumulative count crosses
    ``q·N``.  Absolute error ≤ one bin width ``(max−min)/bins``.

    Why this next to ``stats.exact_global_quantiles``: the exact
    algorithm range-partitions the DATA (a full shuffle); the histogram
    summary is ``bins`` longs — mergeable across partitions, days, or
    streams by adding counts — the profiling tool you reach for when a
    whole-corpus shuffle per metric is not worth it.  Unlike
    ``approx_percentile`` (engine-specific internal ordering), every
    step here is deterministic arithmetic, identical in any engine.

    The cumulative window runs over ≤ ``bins`` rows on one partition —
    sketch-sized by construction, never data-sized.  Degenerate input
    (all values equal → zero bin width) returns that value for every
    quantile.
    """
    if bins < 2:
        raise ValueError("need at least 2 bins")
    if not quantiles or any(not (0.0 < q <= 1.0) for q in quantiles):
        raise ValueError("quantiles must lie in (0, 1]")
    from pyspark.sql import Window

    v = df.select(F.col(value_col).cast("double").alias("x")).where(
        F.col("x").isNotNull() & (~F.isnan("x"))
    )
    mm = v.agg(
        F.min("x").alias("mn"), F.max("x").alias("mx"), F.count("x").alias("n")
    )
    w = (F.col("mx") - F.col("mn")) / bins
    binned = (
        v.crossJoin(F.broadcast(mm))
        .select(
            F.when(F.col("mx") == F.col("mn"), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(bins - 1),
                    F.greatest(
                        F.lit(0),
                        F.floor((F.col("x") - F.col("mn")) / w).cast("int"),
                    ),
                )
            )
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cum = binned.withColumn(
        "cum",
        F.sum("c").over(
            Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    qs = F.array(*[F.lit(float(q)) for q in quantiles])
    picks = (
        cum.crossJoin(F.broadcast(mm))
        .join(
            binned.sparkSession.range(1).select(
                F.explode(qs).alias("q")
            ),
            F.col("cum") >= F.col("q") * F.col("n"),
        )
        .groupBy("q")
        .agg(
            F.min(F.struct("bin", "c", "cum", "mn", "mx", "n")).alias("b")
        )
        .select("q", "b.bin", "b.c", "b.cum", "b.mn", "b.mx", "b.n")
    )
    # est = mn + w * (bin + (q*n - cum_before) / c); cum_before = cum - c
    wq = (F.col("mx") - F.col("mn")) / bins
    return picks.select(
        "q",
        F.round(
            F.when(F.col("mx") == F.col("mn"), F.col("mn")).otherwise(
                F.col("mn")
                + wq
                * (
                    F.col("bin")
                    + (F.col("q") * F.col("n") - (F.col("cum") - F.col("c")))
                    / F.col("c")
                )
            ),
            round_dp,
        ).alias("est"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch: bounded-memory point-frequency estimation
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 64


def cms_cell(col: Column, row: int, width: int = CMS_WIDTH) -> Column:
    """Deterministic counter column for hash row ``row``: the shared
    md5-fold hash of the salted value string, reduced mod ``width`` —
    identical in DuckDB."""
    return (
        md5_hash60(F.concat(F.lit(f"cms{row}:"), col.cast("string")))
        % width
    )


def cms_build(
    df: DataFrame,
    column: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """The sketch: ≤ depth·width rows (row_id, col_id, cnt).

    One pass, one aggregation — the shuffled state is the d×w counter
    grid, independent of input size.  Sketches MERGE by summing matching
    cells (counters are additive), which makes the summary streamable
    and shard-parallel: build per shard, union, re-aggregate.

    Estimate for value v: min over rows of cnt[row, h_row(v)] — an upper
    bound on the true count, within εN (ε = e/width) with probability
    1-δ (δ = e^-depth) [Cormode & Muthukrishnan 2005].
    """
    c = F.col(column)
    cells = df.select(
        F.posexplode(
            F.array(*[cms_cell(c, r, width) for r in range(depth)])
        ).alias("row_id", "col_id")
    )
    return cells.groupBy("row_id", "col_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    probe_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-frequency estimates for every probe value: join each probe's
    depth cells against the sketch (broadcast — the sketch is ≤ d·w
    rows), take the min counter.  Missing cells are zero (value never
    seen)."""
    p = probes.select(
        F.col(probe_col).alias("probe"),
        F.posexplode(
            F.array(
                *[cms_cell(F.col(probe_col), r, width) for r in range(depth)]
            )
        ).alias("row_id", "col_id"),
    )
    return (
        p.join(F.broadcast(sketch), ["row_id", "col_id"], "left")
        .groupBy("probe")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias("est_count")
        )
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (Flajolet et al. 2007) — the
# constant-state sibling of KMV: 2^p max-rank registers instead of a
# bottom-k hash set.  Same shared 60-bit md5 hash, so the whole sketch
# (register table AND estimate) is bit-reproducible in DuckDB.
# ---------------------------------------------------------------------------

HLL_P = 8                    # 2^8 = 256 registers (~6.5% rel. error)
HLL_M = 1 << HLL_P
HLL_Q = 60 - HLL_P           # rank bits left after the register index
# max rho = HLL_Q + 1 (all rank bits zero); integer pow terms use
# 2^(RHO_MAX - rho) so the register sum is EXACT BIGINT arithmetic:
# sum_j 2^(53 - M_j) <= 256 * 2^53 = 2^61 < Long.MAX.
HLL_RHO_MAX = HLL_Q + 1


def hll_registers(df: DataFrame, column: str) -> DataFrame:
    """The sketch state: ``(idx, mj)`` — per-register max leading-zero
    rank, <= 2^p rows.  rho of a hash = leading zeros of its upper
    ``HLL_Q`` bits + 1, computed with INTEGER ops only (binary-string
    length, no log2 float) so Spark and DuckDB agree exactly.

    Scale shape: the groupBy partial-aggregates map-side — each task
    folds its rows into <= 256 registers before the exchange, so the
    shuffle carries <= P*256 tiny rows no matter the input size.
    Mergeable by construction: union register tables, re-take max(mj)
    (``hll_merge``) — the cross-partition/cross-day rollup costs
    nothing.  One definition: this IS ``hll_registers_grouped`` with no
    group columns (the single-definition rule — a drifted copy would
    silently desynchronize the global and grouped estimators)."""
    return hll_registers_grouped(df, column)


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union register tables, keep the max rank per register — HLL's
    lossless merge (the estimate of the merge == the estimate of the
    concatenated inputs)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("idx").agg(F.max("mj").alias("mj"))


def hll_estimate(registers: DataFrame) -> DataFrame:
    """One-row estimate from a register table: the raw HLL estimator
    with the standard linear-counting small-range correction.

    Determinism: the harmonic-mean denominator is an INTEGER sum of
    power-of-two terms (``2^(53 - mj)``, absent registers contribute
    ``2^53``), so it is associative and order-free; doubles appear only
    in the fixed final expression (identical literal tree in the DuckDB
    oracle).  Output carries the integer state (``sum_pow``,
    ``n_zero_regs``) alongside the estimate so an oracle hash verifies
    the sketch exactly, not just to rounding.  One definition: this IS
    ``hll_estimate_grouped`` with no group columns."""
    return hll_estimate_grouped(registers)


def hll_distinct(df: DataFrame, column: str) -> DataFrame:
    """count(distinct column) estimated in 256 integers of state."""
    return hll_estimate(hll_registers(df, column))


def hll_estimate_grouped(
    registers: DataFrame, *group_cols: str
) -> DataFrame:
    """``hll_estimate`` per group: one row per key with the same
    ``(est_distinct, sum_pow, n_zero_regs)`` contract.  The input is a
    register table carrying the group columns (e.g. per-day sketches
    merged per window) — state per group is ≤ 2^p rows, so the whole
    aggregation is sketch-sized regardless of the data that built it."""
    s = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("np"),
        F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), {HLL_RHO_MAX} - mj)")
        ).alias("sp"),
    )
    vz = F.lit(HLL_M) - F.col("np")
    sum_pow = (
        F.coalesce(F.col("sp"), F.lit(0))
        + vz.cast("long") * F.lit(1 << HLL_RHO_MAX).cast("long")
    )
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(256.0))
    raw = (
        alpha
        * F.lit(float(HLL_M * HLL_M))
        * F.lit(float(1 << HLL_RHO_MAX))
        / sum_pow.cast("double")
    )
    linear = F.lit(float(HLL_M)) * F.log(
        F.lit(float(HLL_M)) / vz.cast("double")
    )
    est = F.when((vz > 0) & (raw <= F.lit(2.5 * HLL_M)), linear).otherwise(raw)
    return s.select(
        *group_cols,
        F.round(est, 6).alias("est_distinct"),
        sum_pow.cast("bigint").alias("sum_pow"),
        vz.cast("bigint").alias("n_zero_regs"),
    )


def hll_registers_grouped(
    df: DataFrame, column: str, *group_cols: str
) -> DataFrame:
    """Per-group register tables ``(*group_cols, idx, mj)`` — the
    building block of the sketch cube: sketch once at the finest grain
    (day, shard, partition), then answer any coarser rollup by
    ``max(mj)``-merging register rows instead of re-scanning data."""
    h = kmv_hash(F.col(column))
    w = F.shiftright(h, HLL_P)
    rho = F.when(w == 0, F.lit(HLL_RHO_MAX)).otherwise(
        F.lit(HLL_RHO_MAX) - F.length(F.bin(w))
    )
    return (
        df.where(F.col(column).isNotNull())
        .select(
            *group_cols,
            h.bitwiseAND(F.lit(HLL_M - 1)).cast("int").alias("idx"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(*group_cols, "idx")
        .agg(F.max("rho").alias("mj"))
    )


def sampled_quantiles(
    df: DataFrame,
    value_col: str,
    key_col: Column | str,
    q_pcts: tuple[int, ...],
    k: int = 1024,
    salt: str = "",
) -> DataFrame:
    """Quantile estimates from a deterministic bottom-k hash sample —
    the KMV trick applied to order statistics.  Rows whose salted
    60-bit content hash ranks in the global bottom ``k`` form a
    uniform-without-replacement sample; the estimate for the q-th
    percentile is the sample's own discrete order statistic at rank
    ``ceil(q·|sample|/100)``.

    Where this sits among the engine's three quantile paths:
    ``stats.exact_global_quantiles`` is exact but range-partitions the
    DATA (a full shuffle per metric); ``histogram_quantiles`` is two
    linear passes with VALUE error ≤ one bin width — which blows up on
    heavy tails; this sketch is one heap top-k pass with RANK error
    O(1/sqrt(k)) with high probability, independent of the value
    distribution — the heavy-tail-safe profiler.  The sample is
    mergeable exactly like KMV: union two bottom-k sets, keep the
    bottom k (same hash space, same salt).

    Determinism: the sample is content-addressed (re-runs, re-shards,
    and any engine agree on the exact member set); duplicate
    ``(key, salt)`` contents produce identical hashes, so the bottom-k
    ordering tie-breaks on the VALUE — a hash tie at the k boundary
    still selects an engine-independent member set (without this, each
    engine picks an arbitrary duplicate).  Within the sample, ranks
    tie-break on the hash, so every estimate is a value the data
    actually contains.  Scale shape: TakeOrderedAndProject (per-task
    heap, ≤ k rows forwarded per partition — never a data shuffle),
    then one window + one fold over the k-row frame.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    if not q_pcts or any(q < 1 or q > 100 for q in q_pcts):
        raise ValueError("q_pcts must be integer percents in [1, 100]")
    from pyspark.sql import Window

    key = F.col(key_col) if isinstance(key_col, str) else key_col
    h = md5_hash60(F.concat(key.cast("string"), F.lit(salt)))
    # NULL keys hash to NULL — Spark's asc sort would put them FIRST
    # (occupying the sample) while a SQL oracle's default puts them
    # LAST (excluded); NULL values have no rank.  Both are excluded
    # EXPLICITLY so the member set is engine-independent, as promised.
    sample = (
        df.select(F.col(value_col).alias("__v"), h.alias("__h"))
        .where(F.col("__h").isNotNull() & F.col("__v").isNotNull())
        .orderBy(F.asc("__h"), F.asc("__v"))
        .limit(k)
    )
    w = Window.orderBy(F.asc("__v"), F.asc("__h"))
    ranked = sample.select(
        "__v", F.row_number().over(w).alias("__rn")
    ).withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy()))
    return ranked.agg(
        F.count(F.lit(1)).alias("sample_n"),
        *[
            F.max(
                F.when(
                    F.col("__rn") <= F.expr(f"({q} * __n + 99) div 100"),
                    F.col("__v"),
                )
            ).alias(f"p{q}")
            for q in q_pcts
        ],
    )
