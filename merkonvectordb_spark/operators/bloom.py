"""Bloom-filter runtime join pruning.

The classic 100 TB pattern: a semi-join whose build side is too large to
broadcast RAW but whose *bit-set summary* is tiny.  Build a Bloom filter
over the dimension keys (one aggregation, ≤ m/64 longs), ship it into
the fact scan as a literal array, and pre-filter scan-locally BEFORE the
shuffle — the exchange then carries only probable matches, and the exact
semi-join that follows removes the false positives.  Result is therefore
EXACTLY the plain semi-join (no false negatives by construction), which
is what the oracle checks.

Spark's own AQE injects runtime bloom filters for some shapes
(`spark.sql.optimizer.runtime.bloomFilter.enabled`); this operator makes
the pattern explicit, deterministic, and available to any plan.

Hashing is seeded xxhash64 (a JVM codegen intrinsic): because the bloom
is transparent to the result, the oracle never replays it, so the hash
only needs to be cheap and deterministic — not cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_M_BITS = 1 << 16  # 64 Kbit = 1024 longs ≈ 8 KB shipped to executors
BLOOM_K = 3  # hash count; FP rate ≈ (1 - e^{-kn/m})^k


def _bit_positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k deterministic bit positions for a key (seeded xxhash64).

    xxhash64 is a JVM codegen intrinsic — ~20× cheaper per row than an
    md5 fold, which matters because the FACT side evaluates k of these
    per row.  No cross-engine parity is needed: the bloom is transparent
    (the exact semi-join that follows makes the result independent of
    the hash), so the oracle never replays it."""
    return [F.pmod(F.xxhash64(F.lit(i), key), F.lit(m_bits)) for i in range(k)]


def build_bloom(
    dim: DataFrame,
    key_col: str,
    m_bits: int | None = None,
    k: int = BLOOM_K,
    n_rows: int | None = None,
) -> list[int]:
    """Aggregation pass over the build side → the filter's long words
    (length m_bits/64; missing words are zero).

    ``m_bits=None`` auto-sizes to ≥16 bits per build-side row (next
    power of two, floor 64 Kbit, cap 16 Mbit = 2 MB of plan literal) —
    an overloaded bloom silently degrades to "pass everything", so
    sizing from the actual key count is part of the operator, not a
    tuning knob.  Auto-sizing costs a SEPARATE count() job before the
    bit aggregation (the positions depend on m, so one pass can't both
    size and set bits) — pass ``m_bits`` explicitly, or ``n_rows``
    (an estimate is fine; only the sizing uses it), to keep the build
    single-pass on a large dim.  The driver materializes only m_bits/64
    longs — NOT the keys.  At 100 TB the build side streams through a
    partial ``bit_or`` aggregate; the shuffled state is ≤ m/64 rows per
    partition, independent of build-side row count.
    """
    nn = dim.where(F.col(key_col).isNotNull())
    if m_bits is None:
        n = nn.count() if n_rows is None else int(n_rows)
        m_bits = BLOOM_M_BITS
        while m_bits < 16 * max(n, 1) and m_bits < (1 << 24):
            m_bits *= 2
    if m_bits <= 0 or m_bits % 64 != 0:
        # bloom_filter_rows re-derives m as 64·len(words); a non-multiple
        # would make build and probe disagree (and index out of range)
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    n_words = m_bits // 64
    bits = _bit_positions(F.col(key_col), m_bits, k)
    rows = nn.select(F.explode(F.array(*bits)).alias("bit"))
    agg = (
        rows.select(
            (F.col("bit") / 64).cast("int").alias("w"),
            F.expr(
                "shiftleft(cast(1 as bigint), cast(bit % 64 as int))"
            ).alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("word"))
        .collect()
    )
    words = [0] * n_words
    for r in agg:
        words[r["w"]] = r["word"]
    return words


def bloom_filter_rows(
    df: DataFrame,
    key_col: str,
    words: list[int],
    k: int = BLOOM_K,
) -> DataFrame:
    """Scan-local Bloom membership pre-filter (keeps probable members).

    ``m_bits`` is implied by the word list (64·len).  The word array is
    embedded via ONE parsed SQL ``array(...)`` literal: ``F.lit(list)``
    pays a py4j round-trip per element (~4 s at 8k words) and
    ``F.array(*lits)`` builds a k-thousand-child Python expression tree
    — the parser ingests the same array from a single string in
    milliseconds and constant-folds it once.  The test itself is pure
    codegen: xxhash64 + element_at + shift, no shuffle, no Python.
    ``shiftrightunsigned`` only accepts a column shift amount through
    SQL, hence the expr-built bit test over aliased columns.
    """
    m_bits = 64 * len(words)
    key = F.col(key_col)
    arr = F.expr(
        "array(" + ",".join(f"{int(w)}L" for w in words) + ")"
    )
    bound = df.withColumn("__bloom_arr", arr)
    pred = key.isNotNull()
    for i, bp in enumerate(_bit_positions(key, m_bits, k)):
        bound = bound.withColumn(f"__bloom_b{i}", bp).withColumn(
            f"__bloom_w{i}",
            F.element_at(
                F.col("__bloom_arr"),
                (F.col(f"__bloom_b{i}") / 64).cast("int") + 1,
            ),
        )
        bit = F.expr(
            f"shiftrightunsigned(__bloom_w{i}, cast(__bloom_b{i} % 64 as int))"
        )
        pred = pred & (bit.bitwiseAND(F.lit(1)) == 1)
    return bound.where(pred).drop(
        "__bloom_arr",
        *[f"__bloom_b{i}" for i in range(k)],
        *[f"__bloom_w{i}" for i in range(k)],
    )


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int | None = None,
    k: int = BLOOM_K,
) -> DataFrame:
    """Semi-join ``fact`` to ``dim`` keys with a Bloom pre-filter.

    Exactly equivalent to ``fact SEMI JOIN dim`` (the exact join runs
    after the filter and kills false positives); the filter's job is to
    shrink the fact side's exchange input scan-locally.  Auto-sizing
    (≥16 bits/key, k=3) keeps the FP rate ≲1%.
    """
    words = build_bloom(dim, dim_key, m_bits, k)
    filtered = bloom_filter_rows(fact, fact_key, words, k)
    dim_keys = dim.select(F.col(dim_key).alias(fact_key)).where(
        F.col(fact_key).isNotNull()
    )
    return filtered.join(dim_keys, fact_key, "semi")
