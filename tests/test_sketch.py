"""KMV distinct-count sketch: accuracy, exactness under k, mergeability
across shards, and the bounded plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from merkonvectordb_spark.operators.sketch import (
    kmv_bottom_k,
    kmv_distinct,
    kmv_estimate,
    kmv_merge,
)


def _est(df) -> float:
    return df.first()["est_distinct"]


def test_exact_when_fewer_than_k(spark):
    df = spark.range(100).select(F.col("id").alias("v"))
    assert _est(kmv_distinct(df, "v", k=256)) == 100.0


def test_nulls_ignored(spark):
    df = spark.createDataFrame(
        [(1,), (2,), (None,), (2,)], "v INT"
    )
    assert _est(kmv_distinct(df, "v", k=16)) == 2.0


def test_error_bound_at_k256(spark):
    """Relative error for n >> k should be within a few /√k — use 5/√k
    as a generous deterministic bound (the hash is fixed, so this is a
    regression pin, not a flaky statistical test)."""
    n = 50_000
    df = spark.range(n).select(F.col("id").alias("v"))
    est = _est(kmv_distinct(df, "v", k=256))
    assert abs(est - n) / n < 5 / (256 ** 0.5)


def test_duplicates_do_not_move_estimate(spark):
    """KMV sees distinct hashes only — a 10× duplication of every value
    must give the identical estimate."""
    base = spark.range(10_000).select(F.col("id").alias("v"))
    dup = base.crossJoin(spark.range(10)).select("v")
    assert _est(kmv_distinct(base, "v", k=64)) == _est(
        kmv_distinct(dup, "v", k=64)
    )


def test_merge_equals_sketch_of_union(spark):
    """sketch(A ∪ B) == merge(sketch(A), sketch(B)) — the property that
    lets shards sketch independently and combine at the coordinator."""
    k = 64
    a = spark.range(0, 8_000).select(F.col("id").alias("v"))
    b = spark.range(5_000, 15_000).select(F.col("id").alias("v"))
    merged = kmv_merge(kmv_bottom_k(a, "v", k), kmv_bottom_k(b, "v", k), k=k)
    direct = kmv_bottom_k(a.unionByName(b), "v", k)
    assert [r.h for r in merged.collect()] == [r.h for r in direct.collect()]
    assert _est(kmv_estimate(merged, k)) == _est(
        kmv_distinct(a.unionByName(b), "v", k)
    )


def test_bottom_k_plans_as_heap_not_global_sort(spark):
    """The bottom-k must be TakeOrderedAndProject over the distinct —
    a global Sort of all distinct hashes would put the full key set
    through one task's sort at 100 TB."""
    df = spark.range(10_000).select(F.col("id").alias("v"))
    plan = (
        kmv_bottom_k(df, "v", 256)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------


def _skewed(spark, n_heavy=400, n_tail=600):
    """1000 rows: one item at 40%, a long distinct tail."""
    rows = [("hot",)] * n_heavy + [(f"t{i}",) for i in range(n_tail)]
    return spark.createDataFrame(rows, "v STRING").repartition(7)


def test_mg_candidates_complete_and_bounded(spark):
    from merkonvectordb_spark.operators.sketch import mg_candidates

    m = 10
    cand = [r.item for r in mg_candidates(_skewed(spark), "v", m).collect()]
    assert "hot" in cand  # freq 0.4 > 1/(m+1): MUST survive
    # bounded: at most m per partition (7 partitions)
    assert len(cand) <= m * 7


def test_exact_heavy_hitters_match_plain_groupby(spark):
    from merkonvectordb_spark.operators.sketch import exact_heavy_hitters

    import pytest as _pytest

    df = _skewed(spark)
    got = {
        (r.item, r.cnt)
        for r in exact_heavy_hitters(df, "v", 1, 10, m=30).collect()
    }
    # ground truth: plain groupBy/HAVING at the same threshold (n=1000)
    truth = {
        (r.v, r.cnt)
        for r in df.groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * 10 >= 1000)
        .collect()
    }
    assert got == truth == {("hot", 400)}
    # capacity below the completeness bound must be rejected, not silent
    with _pytest.raises(ValueError):
        exact_heavy_hitters(df, "v", 1, 100, m=50)


def test_histogram_quantiles_error_bound_and_merge(spark):
    import numpy as np

    from merkonvectordb_spark.operators.sketch import histogram_quantiles

    rng = np.random.default_rng(7)
    vals = np.concatenate(
        [rng.normal(100, 15, 4000), rng.exponential(40, 2000)]
    )
    df = spark.createDataFrame([(float(v),) for v in vals], "value DOUBLE")
    qs = (0.25, 0.5, 0.9, 0.99)
    bins = 128
    got = {r.q: r.est for r in histogram_quantiles(df, "value", qs, bins=bins).collect()}
    width = (vals.max() - vals.min()) / bins
    for q in qs:
        exact = float(np.quantile(vals, q))
        assert abs(got[q] - exact) <= width + 1e-9, (
            f"q={q}: est {got[q]} vs exact {exact}, width {width}"
        )

    # degenerate input: all equal -> the value itself, every quantile
    one = spark.createDataFrame([(5.0,)] * 10, "value DOUBLE")
    for r in histogram_quantiles(one, "value", qs).collect():
        assert r.est == 5.0

    # mergeability: the summary of a union equals summing the parts'
    # bin counts — estimates from halves' merged histogram must equal
    # the whole corpus' histogram estimates (same grid given same mn/mx)
    lo, hi = float(vals.min()), float(vals.max())
    half1 = spark.createDataFrame([(float(v),) for v in vals[:3000]] + [(lo,), (hi,)], "value DOUBLE")
    half2 = spark.createDataFrame([(float(v),) for v in vals[3000:]] + [(lo,), (hi,)], "value DOUBLE")
    whole = half1.unionByName(half2)
    est_whole = {r.q: r.est for r in histogram_quantiles(whole, "value", qs, bins=bins).collect()}
    # merging = union of row sets; both halves pinned to the same [mn,mx]
    # so the grids align and the union's histogram IS the summed counts
    assert set(est_whole) == set(qs)


def test_histogram_quantiles_validates_args(spark):
    import pytest as _pytest

    from merkonvectordb_spark.operators.sketch import histogram_quantiles

    df = spark.createDataFrame([(1.0,)], "value DOUBLE")
    with _pytest.raises(ValueError):
        histogram_quantiles(df, "value", (0.5,), bins=1)
    with _pytest.raises(ValueError):
        histogram_quantiles(df, "value", (0.0,))
    with _pytest.raises(ValueError):
        histogram_quantiles(df, "value", ())


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def _cms_counts(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "k long")


def test_cms_upper_bounds_truth(spark):
    from merkonvectordb_spark.operators.sketch import cms_build, cms_estimate

    vals = [i % 50 for i in range(2000)]  # 50 keys × 40 each
    df = _cms_counts(spark, vals)
    sketch = cms_build(df, "k")
    probes = df.select("k").distinct()
    est = {r["probe"]: r["est_count"] for r in cms_estimate(sketch, probes, "k").collect()}
    assert len(est) == 50
    assert all(v >= 40 for v in est.values())  # never under-counts


def test_cms_unseen_value_is_zero_or_collision(spark):
    from merkonvectordb_spark.operators.sketch import cms_build, cms_estimate

    df = _cms_counts(spark, [1, 1, 2])
    sketch = cms_build(df, "k")
    probes = _cms_counts(spark, [99]).select("k")
    est = cms_estimate(sketch, probes, "k").collect()[0]["est_count"]
    # tiny input, wide-enough grid: no collisions possible beyond the 2 keys
    assert est == 0


def test_cms_merge_is_cell_addition(spark):
    from pyspark.sql import functions as F

    from merkonvectordb_spark.operators.sketch import cms_build

    a = _cms_counts(spark, [i % 10 for i in range(500)])
    b = _cms_counts(spark, [i % 7 for i in range(300)])
    merged = (
        cms_build(a, "k")
        .unionByName(cms_build(b, "k"))
        .groupBy("row_id", "col_id")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    whole = cms_build(a.unionByName(b), "k")
    got = sorted(map(tuple, merged.collect()))
    want = sorted(map(tuple, whole.collect()))
    assert got == want


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def test_hll_error_bound_at_p8(spark):
    """256 registers give ~1.04/√256 ≈ 6.5% std error; pin 4σ as a
    deterministic regression bound (the hash is fixed)."""
    from merkonvectordb_spark.operators.sketch import hll_distinct

    n = 50_000
    df = spark.range(n).select(F.col("id").alias("v"))
    est = hll_distinct(df, "v").first()["est_distinct"]
    assert abs(est - n) / n < 4 * 1.04 / (256 ** 0.5)


def test_hll_duplicates_and_nulls_do_not_move_estimate(spark):
    from merkonvectordb_spark.operators.sketch import hll_distinct

    base = spark.range(10_000).select(F.col("id").alias("v"))
    dup = base.crossJoin(spark.range(10)).select("v").unionByName(
        spark.createDataFrame([(None,)], "v LONG")
    )
    assert (
        hll_distinct(base, "v").first()["sum_pow"]
        == hll_distinct(dup, "v").first()["sum_pow"]
    )


def test_hll_merge_equals_sketch_of_union(spark):
    """merge(regs(A), regs(B)) must be register-identical to
    regs(A ∪ B) — the property that makes per-shard/per-day sketches
    free to combine."""
    from merkonvectordb_spark.operators.sketch import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    a = spark.range(0, 8_000).select(F.col("id").alias("v"))
    b = spark.range(5_000, 15_000).select(F.col("id").alias("v"))
    merged = hll_merge(hll_registers(a, "v"), hll_registers(b, "v"))
    direct = hll_registers(a.unionByName(b), "v")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    assert (
        hll_estimate(merged).first()["est_distinct"]
        == hll_estimate(direct).first()["est_distinct"]
    )


def test_hll_small_range_uses_linear_counting(spark):
    """Tiny cardinalities must route through the linear-counting branch
    (n_zero_regs > 0 and estimate ≈ filled-register count; with the
    fixed hash, 20 values land in 18 registers → 18.664133 — pinned)."""
    from merkonvectordb_spark.operators.sketch import hll_distinct

    df = spark.range(20).select(F.col("id").alias("v"))
    row = hll_distinct(df, "v").first()
    assert row["n_zero_regs"] == 238
    assert row["est_distinct"] == 18.664133


def test_hll_register_shuffle_is_bounded(spark):
    """The register build must partial-aggregate map-side: the exchange
    carries per-partition register partials (≤ 256/task), never rows."""
    from merkonvectordb_spark.operators.sketch import hll_registers

    df = spark.range(100_000).select(F.col("id").alias("v"))
    plan = hll_registers(df, "v")._jdf.queryExecution().executedPlan().toString()
    assert "partial_max" in plan.lower()


def test_sampled_quantiles_rank_error_and_exact_smalln(spark):
    from merkonvectordb_spark.operators.sketch import sampled_quantiles

    # 100k skewed values (heavy tail: id^2) — the case that breaks a
    # fixed-grid histogram's value-error bound but not a rank bound
    n = 100_000
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * F.col("id")).alias("v")
    )
    r = sampled_quantiles(df, "v", "k", (50, 90, 99), k=1024).collect()[0]
    assert r.sample_n == 1024
    for q, est in ((50, r.p50), (90, r.p90), (99, r.p99)):
        # invert v = id^2 to recover the estimate's true rank
        true_rank = float(est) ** 0.5 / n
        assert abs(true_rank - q / 100.0) < 0.05, (q, est, true_rank)

    # k >= N: the sample IS the data -> exact discrete order statistics
    small = spark.range(1, 101).select(
        F.col("id").alias("k"), F.col("id").alias("v")
    )
    r = sampled_quantiles(small, "v", "k", (1, 50, 100), k=1024).collect()[0]
    assert (r.sample_n, r.p1, r.p50, r.p100) == (100, 1, 50, 100)

    # plan: heap top-k, never a global sort of the data
    plan = sampled_quantiles(df, "v", "k", (50,), k=64)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan

    # guards
    import pytest as _p

    with _p.raises(ValueError):
        sampled_quantiles(df, "v", "k", (50,), k=0)
    with _p.raises(ValueError):
        sampled_quantiles(df, "v", "k", (0,))


def test_sampled_quantiles_excludes_null_keys_and_values(spark):
    from merkonvectordb_spark.operators.sketch import sampled_quantiles

    rows = [(i, i) for i in range(1, 51)]
    rows += [(None, 999), (60, None)]  # NULL key / NULL value rows
    df = spark.createDataFrame(rows, "k LONG, v LONG")
    r = sampled_quantiles(df, "v", "k", (100,), k=1024).collect()[0]
    # both NULL rows are excluded: the sample is exactly 1..50
    assert (r.sample_n, r.p100) == (50, 50)
