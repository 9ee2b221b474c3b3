"""Training-pipeline operators: split determinism and chunk coverage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from merkonvectordb_spark.operators.pipeline import (
    chunk_tokens,
    global_exclusive_prefix_sum,
    hash_split,
    mixture_sample,
    pack_sequences,
    stratified_sample,
)

SPLITS = {"train": 90, "val": 5, "test": 5}


def test_hash_split_is_partition_invariant(spark):
    """The property sample() lacks: repartitioning must not move any row
    between splits."""
    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    a = {r.doc_id: r.split for r in hash_split(df, "doc_id", SPLITS).collect()}
    b = {
        r.doc_id: r.split
        for r in hash_split(df.repartition(17), "doc_id", SPLITS).collect()
    }
    assert a == b


def test_hash_split_respects_weights(spark):
    df = spark.range(20_000).select(F.col("id").alias("doc_id"))
    counts = dict(
        hash_split(df, "doc_id", SPLITS)
        .groupBy("split")
        .count()
        .rdd.map(lambda r: (r["split"], r["count"]))
        .collect()
    )
    assert set(counts) == set(SPLITS)
    for name, w in SPLITS.items():
        assert abs(counts[name] / 20_000 - w / 100) < 0.02, (name, counts)


def test_hash_split_salt_redeals(spark):
    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    a = {r.doc_id: r.split for r in hash_split(df, "doc_id", SPLITS).collect()}
    b = {
        r.doc_id: r.split
        for r in hash_split(df, "doc_id", SPLITS, salt="v2").collect()
    }
    assert a != b  # a salt change re-deals ...
    assert set(a) == set(b)  # ... without gaining or losing rows


def test_hash_split_rejects_bad_weights(spark):
    df = spark.range(10).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", {"a": 0, "b": 0})
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", {"a": -1, "b": 2})


def test_chunks_cover_every_token_in_order(spark):
    """Concatenating each doc's stride-prefixes reconstructs the token
    stream: no token lost, none duplicated outside the overlap."""
    text = " ".join(f"tok{i}" for i in range(150))
    df = spark.createDataFrame([(1, text)], "doc_id LONG, text STRING")
    rows = (
        chunk_tokens(df, "text", window=64, stride=48)
        .orderBy("chunk_idx")
        .collect()
    )
    # starts advance by stride; last chunk may be short but never empty
    assert [r.chunk_idx for r in rows] == list(range(len(rows)))
    rebuilt = []
    for r in rows:
        toks = r.chunk_text.split(" ")
        assert len(toks) == r.chunk_tokens <= 64
        rebuilt.extend(toks[: 48 if len(toks) == 64 else len(toks)])
    # trailing overlap of the final full window duplicates nothing
    assert rebuilt[:150] == [f"tok{i}" for i in range(150)]


def test_prefix_sum_matches_sequential_and_is_partition_invariant(spark):
    """The two-pass distributed prefix sum must equal the sequential
    running total regardless of input partitioning or partition count."""
    import random

    rng = random.Random(7)
    rows = [(i, rng.randint(0, 30)) for i in range(500)]
    rng.shuffle(rows)
    expect = {}
    run = 0
    for k, v in sorted(rows):
        expect[k] = run
        run += v
    for shape in (1, 5, 13):
        df = spark.createDataFrame(rows, "k LONG, v LONG").repartition(shape)
        got = {
            r.k: r.run_start
            for r in global_exclusive_prefix_sum(
                df, ("k",), "v", num_partitions=shape
            ).collect()
        }
        assert got == expect, f"mismatch at {shape} partitions"


def test_pack_sequences_budget_and_straddle(spark):
    rows = [(i, 0, 40) for i in range(20)]  # 800 tokens, budget 128
    df = spark.createDataFrame(rows, "doc_id LONG, chunk_idx LONG, t LONG")
    out = pack_sequences(df, ("doc_id", "chunk_idx"), "t", budget=128).collect()
    for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_idx)):
        assert 0 <= r.seq_offset < 128
        # straddle flag is exact: crosses a cut iff offset+len > budget
        assert r.straddles == (r.seq_offset + r.t > 128)
    # last chunk starts at token 760 → its sequence is 760 // 128
    assert max(r.seq_id for r in out) == (800 - 40) // 128
    with pytest.raises(ValueError):
        pack_sequences(df, ("doc_id", "chunk_idx"), "t", budget=0)


def test_stratified_sample_is_deterministic_subset(spark):
    df = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("src"),
    )
    rates = {"0": 1.0, "1": 0.5, "2": 0.0}
    a = sorted(
        r.doc_id
        for r in stratified_sample(df, "doc_id", "src", rates, 0.25).collect()
    )
    b = sorted(
        r.doc_id
        for r in stratified_sample(
            df.repartition(11), "doc_id", "src", rates, 0.25
        ).collect()
    )
    assert a == b  # partition-invariant
    by_src = {
        r.src: r.n
        for r in stratified_sample(df, "doc_id", "src", rates, 0.25)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert by_src.get("0") == 1250  # rate 1.0 keeps everything
    assert "2" not in by_src  # rate 0.0 keeps nothing
    assert abs(by_src["1"] / 1250 - 0.5) < 0.1
    assert abs(by_src["3"] / 1250 - 0.25) < 0.1
    with pytest.raises(ValueError):
        stratified_sample(df, "doc_id", "src", {"0": 1.5})


def test_mixture_sample_budget_semantics(spark):
    # 3 strata × 1000 docs × 10 tokens = 10k tokens each
    df = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("src"),
        F.lit(10).alias("toks"),
    )
    kept = mixture_sample(
        df, "doc_id", "src", "toks",
        {"s0": 1, "s1": 1}, budget_tokens=25_000,
    )
    by = {
        r.src: r.n
        for r in kept.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # s2 has weight 0: dropped entirely
    assert "s2" not in by
    # each weighted stratum targets 12.5k tokens > its 10k mass: rate
    # clamps to 1 and the stratum passes through WHOLE (not ~sampled)
    assert by == {"s0": 1000, "s1": 1000}
    # now a tight budget: ~30% keep-rate per stratum
    tight = mixture_sample(
        df, "doc_id", "src", "toks", {"s0": 1, "s1": 1}, budget_tokens=6000
    )
    n = tight.count()
    assert abs(n - 600) < 120  # 2×3000-token targets / 10 tokens each
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mixture_sample(df, "doc_id", "src", "toks", {"s0": 0}, 100)


def test_chunking_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "just three tokens"), (2, "   "), (3, "")],
        "doc_id LONG, text STRING",
    )
    rows = chunk_tokens(df, "text", window=8, stride=4).collect()
    assert len(rows) == 1
    assert rows[0].doc_id == 1 and rows[0].chunk_tokens == 3
    with pytest.raises(ValueError):
        chunk_tokens(df, "text", window=4, stride=8)


def test_training_shards_invariants(spark):
    from merkonvectordb_spark.operators.pipeline import prepare_training_shards

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    out = prepare_training_shards(docs).cache()
    rows = out.collect()
    assert rows, "pipeline produced no chunks"

    # sequence numbering restarts per split: every split starts at seq 0
    # and its seq_offsets are consistent with a contiguous token stream
    by_split = {}
    for r in rows:
        by_split.setdefault(r.split, []).append(r)
    for split, rs in by_split.items():
        rs.sort(key=lambda r: (r.doc_id, r.chunk_idx))
        assert rs[0].seq_id == 0 and rs[0].seq_offset == 0
        run = 0
        for r in rs:
            assert r.seq_id * 256 + r.seq_offset == run
            assert r.shard_id == r.seq_id // 16
            run += r.chunk_tokens

    # content-addressed: a shuffled/repartitioned rerun is byte-identical
    again = prepare_training_shards(docs.repartition(7)).collect()
    key = lambda r: (r.split, r.doc_id, r.chunk_idx)
    assert sorted(map(tuple, again), key=str) == sorted(map(tuple, rows), key=str)

    # a document's chunks never span splits
    spans = out.groupBy("doc_id").agg(F.countDistinct("split").alias("n"))
    assert spans.where(F.col("n") > 1).count() == 0


def test_packing_efficiency_invariants(spark, sf_dir):
    """Fill ratio in (0, 1], tokens never exceed capacity, shard count
    consistent with 16 sequences per shard, all three splits present."""
    import math

    import __spark_entry__ as entry

    rows = {r["split"]: r for r in
            entry.queries()["packing_efficiency"](spark, sf_dir).collect()}
    assert set(rows) == {"train", "val", "test"}
    for r in rows.values():
        assert 0.0 < r["fill_ratio"] <= 1.0
        assert r["total_tokens"] <= r["n_seqs"] * 256
        assert r["n_shards"] == math.ceil(r["n_seqs"] / 16)
        assert r["n_straddles"] <= r["n_chunks"]


def test_hash_sample_k_exact_count_and_invariance(spark):
    """Exactly min(k, |stratum|) rows per stratum; the sampled id set is
    a pure function of (key, salt) — invariant to partitioning — and a
    different salt re-deals; the plan keeps the partial rank pass below
    the exchange (WindowGroupLimit) so no stratum ever shuffles whole."""
    from pyspark.sql import functions as F

    from merkonvectordb_spark.operators.pipeline import hash_sample_k

    df = spark.range(0, 500).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("g")
    )
    out = hash_sample_k(df, "id", "g", 7)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r["g"], set()).add(r["id"])
    assert {g: len(s) for g, s in per.items()} == {"0": 7, "1": 7, "2": 7}
    assert all(1 <= r["sample_rank"] <= 7 for r in rows)

    # k beyond the stratum size keeps the whole stratum
    small = df.where(F.col("id") < 5)
    assert hash_sample_k(small, "id", "g", 7).count() == 5

    # partition invariance: same ids from a different physical layout
    per2 = {}
    for r in hash_sample_k(df.repartition(13), "id", "g", 7).collect():
        per2.setdefault(r["g"], set()).add(r["id"])
    assert per2 == per

    # a salt re-deals (overwhelmingly unlikely to pick the same 21 ids)
    per3 = {}
    for r in hash_sample_k(df, "id", "g", 7, salt="x").collect():
        per3.setdefault(r["g"], set()).add(r["id"])
    assert per3 != per

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan

    import pytest

    with pytest.raises(ValueError):
        hash_sample_k(df, "id", "g", 0)


def test_weighted_sample_k_exact_count_and_invariance(spark):
    from merkonvectordb_spark.operators.pipeline import weighted_sample_k

    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7 + 1).alias("w")
    )
    got = weighted_sample_k(df, "k", "w", 50)
    rows = sorted((r.k, r.sample_rank) for r in got.collect())
    assert len(rows) == 50
    assert sorted(r[1] for r in rows) == list(range(1, 51))
    # partition-invariant: a 1-partition layout picks the identical set
    rows2 = sorted(
        (r.k, r.sample_rank)
        for r in weighted_sample_k(df.coalesce(1), "k", "w", 50).collect()
    )
    assert rows == rows2


def test_weighted_sample_k_prefers_heavy_rows(spark):
    """500 weight-1000 rows vs 500 weight-1 rows: the 50-row sample
    should be nearly all heavy (P[light wins a slot] ≈ w ratio)."""
    from merkonvectordb_spark.operators.pipeline import weighted_sample_k

    df = spark.range(1000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 500, 1000).otherwise(1).alias("w"),
    )
    got = weighted_sample_k(df, "k", "w", 50).collect()
    heavy = sum(1 for r in got if r.k < 500)
    assert heavy >= 45


def test_weighted_sample_k_excludes_nonpositive_weights(spark):
    from merkonvectordb_spark.operators.pipeline import weighted_sample_k

    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -2), (4, None), (5, 1)], "k INT, w INT"
    )
    got = {r.k for r in weighted_sample_k(df, "k", "w", 10).collect()}
    assert got == {1, 5}


def test_weighted_sample_k_smaller_k_is_prefix(spark):
    """Shrinking k must keep a PREFIX of the larger sample (same race,
    earlier cut) — consumers can tighten budgets without resampling."""
    from merkonvectordb_spark.operators.pipeline import weighted_sample_k

    df = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") % 13 + 1).alias("w")
    )
    big = {r.k: r.sample_rank for r in weighted_sample_k(df, "k", "w", 40).collect()}
    small = {r.k: r.sample_rank for r in weighted_sample_k(df, "k", "w", 10).collect()}
    assert small == {k: v for k, v in big.items() if v <= 10}


def test_weighted_sample_k_plans_as_heap_topk(spark):
    """The global top-k must be TakeOrderedAndProject — a full Sort of
    the corpus by race key would serialize at 100 TB."""
    from merkonvectordb_spark.operators.pipeline import weighted_sample_k

    df = spark.range(10_000).select(
        F.col("id").alias("k"), F.lit(1).alias("w")
    )
    plan = (
        weighted_sample_k(df, "k", "w", 25)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_weighted_sample_k_rejects_fractional_weights(spark):
    """A double weight column must raise, not truncate to 0 in the
    bigint cast and silently return an empty 'sample'."""
    from merkonvectordb_spark.operators.pipeline import weighted_sample_k

    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") / 100.0).alias("w")
    )
    with pytest.raises(ValueError, match="integral"):
        weighted_sample_k(df, "k", "w", 10)


def test_temperature_sample_upweights_small_strata(spark):
    from merkonvectordb_spark.operators.pipeline import temperature_sample

    # skewed masses: big stratum 16k tokens, small stratum 1k tokens —
    # sqrt weights 126 vs ~31, so the SMALL stratum's keep-RATE must be
    # ~4× the big one's (that is the whole point of T=2 sampling)
    df = spark.range(1700).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1600, "big").otherwise("small").alias("lang"),
        F.lit(10).alias("toks"),
    )
    kept = temperature_sample(df, "doc_id", "lang", "toks", 6_000)
    by = {
        r.lang: r.n
        for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rate_big = by.get("big", 0) / 1600.0
    rate_small = by.get("small", 0) / 100.0
    assert rate_small > 2.0 * rate_big, (rate_big, rate_small)
    # total kept tokens ≈ budget (waterfill-free single pass)
    assert abs((by.get("big", 0) + by.get("small", 0)) * 10 - 6000) < 1500

    # a huge budget passes every stratum through whole
    assert temperature_sample(df, "doc_id", "lang", "toks", 10**9).count() == 1700
    # zero budget keeps nothing; negative raises
    assert temperature_sample(df, "doc_id", "lang", "toks", 0).count() == 0
    with pytest.raises(ValueError):
        temperature_sample(df, "doc_id", "lang", "toks", -1)

    # partition-invariance: same surviving set at any parallelism
    a = {r.doc_id for r in kept.collect()}
    b = {
        r.doc_id
        for r in temperature_sample(
            df.repartition(7), "doc_id", "lang", "toks", 6_000
        ).collect()
    }
    assert a == b


def test_temperature_sample_drops_null_strata(spark):
    """ADVICE r6, pinned as contract: rows with a NULL stratum key are
    DROPPED (the equi-join on the stratum misses, both sides of the
    keep inequality coalesce to 0).  Callers who want NULLs budgeted
    must route them to a sentinel stratum upstream."""
    from merkonvectordb_spark.operators.pipeline import temperature_sample

    df = spark.createDataFrame(
        [(1, "en", 10), (2, None, 10), (3, "en", 10), (4, None, 10)],
        "doc_id LONG, lang STRING, toks INT",
    )
    kept = temperature_sample(df, "doc_id", "lang", "toks", 10**9)
    ids = {r.doc_id for r in kept.collect()}
    assert ids == {1, 3}  # infinite budget keeps every NON-NULL stratum row
    sentinel = df.withColumn("lang", F.coalesce("lang", F.lit("__unknown")))
    assert temperature_sample(
        sentinel, "doc_id", "lang", "toks", 10**9
    ).count() == 4
