"""Z-order layout: key correctness and multi-dim clustering quality."""

from __future__ import annotations

from pyspark.sql import functions as F

from merkonvectordb_spark.operators.layout import zorder_key, zorder_layout


def test_zorder_key_interleaves_bits(spark):
    rows = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5)], "a LONG, b LONG"
    ).select("a", "b", zorder_key([F.col("a"), F.col("b")], bits=4).alias("z"))
    got = {(r.a, r.b): r.z for r in rows.collect()}
    # bit i of a lands at 2i, bit i of b at 2i+1
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    # a=3 (0b11) -> bits 0,2 ; b=5 (0b101) -> bits 1,5  => 0b100111
    assert got[(3, 5)] == 0b100111


def test_zorder_key_rejects_overflow(spark):
    import pytest

    with pytest.raises(ValueError):
        zorder_key([F.col("a")] * 4, bits=16)
    with pytest.raises(ValueError):
        zorder_key([], bits=16)


def _partition_spread(df, col, n_parts):
    """Mean per-partition (max-min) extent of ``col``."""
    spread = (
        df.withColumn("__p", F.spark_partition_id())
        .groupBy("__p")
        .agg((F.max(col) - F.min(col)).alias("ext"))
        .agg(F.avg("ext"))
        .first()[0]
    )
    return float(spread)


def test_zorder_clusters_both_dimensions(spark):
    """The point of the layout: after z-ordering, BOTH columns have
    tight per-partition bounds; after a plain sort, only the sort
    column does.  Tight bounds == parquet min/max pruning works."""
    n, parts = 40_000, 16
    df = spark.range(n).select(
        (F.col("id") % 200).alias("a"),
        F.floor(F.col("id") / 200).alias("b"),  # 200x200 grid
    )
    plain = df.repartitionByRange(parts, F.asc("a")).sortWithinPartitions("a")
    zord = zorder_layout(df, ["a", "b"], bits=8, num_partitions=parts)

    # plain layout: 'a' is clustered, 'b' spans ~the full 0..199 range
    assert _partition_spread(plain, "b", parts) > 150
    # z-order: BOTH dimensions stay within small hyper-rectangles
    assert _partition_spread(zord, "a", parts) < 100
    assert _partition_spread(zord, "b", parts) < 100


def test_zorder_prunes_scan_on_either_dimension(spark, tmp_path):
    """End-to-end parquet pruning, measured at the SCAN node: with a
    single-dimension sort, a filter on the OTHER dimension reads the
    whole table; the z-ordered layout bounds the scan for filters on
    EITHER dimension.  (Pruning granularity here is the file — 16
    range-partitioned files ≈ a 4×4 z-tile grid, so a 1-band box reads
    ~half the tiles; finer row groups tighten it further.)"""
    import os

    from merkonvectordb_spark.operators.layout import zorder_key

    n, parts = 40_000, 16
    df = spark.range(n).select(
        (F.col("id") % 200).alias("a"),
        F.floor(F.col("id") / 200).alias("b"),
    )
    zp = os.path.join(str(tmp_path), "z")
    pp = os.path.join(str(tmp_path), "p")
    (
        df.withColumn("__z", zorder_key([F.col("a"), F.col("b")], bits=8))
        .repartitionByRange(parts, F.asc("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(zp)
    )
    (
        df.repartitionByRange(parts, F.asc("a"))
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(pp)
    )

    def scanned(path, cond):
        d = spark.read.parquet(path).where(cond)
        d.collect()
        leaf = (
            d._jdf.queryExecution().executedPlan().collectLeaves().head()
        )
        return leaf.metrics().apply("numOutputRows").value()

    box_a = F.col("a").between(50, 60)
    box_b = F.col("b").between(50, 60)
    z_worst = max(scanned(zp, box_a), scanned(zp, box_b))
    p_worst = max(scanned(pp, box_a), scanned(pp, box_b))
    assert p_worst == n  # the unsorted dimension forces a full scan
    assert z_worst <= 0.75 * p_worst
