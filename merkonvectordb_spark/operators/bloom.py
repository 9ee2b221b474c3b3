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

Hashing is the repo's cross-engine md5-fold codec, so a DuckDB oracle
could replay the bit-set bit-for-bit if needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_M_BITS = 1 << 16  # 64 Kbit = 1024 longs ≈ 8 KB shipped to executors
BLOOM_K = 3  # hash count; FP rate ≈ (1 - e^{-kn/m})^k


def _bit_positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k deterministic bit positions for a key (salted md5-folds)."""
    return [
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"bloom{i}:"), key.cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % m_bits
        )
        for i in range(k)
    ]


def build_bloom(
    dim: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> list[int]:
    """One aggregation pass over the build side → the filter's long words
    (length m_bits/64; missing words are zero).

    The driver materializes only m_bits/64 longs (8 KB at the default) —
    NOT the keys.  At 100 TB the build side streams through a partial
    ``bit_or`` aggregate; the shuffled state is ≤ m/64 rows per
    partition, independent of build-side row count.
    """
    n_words = m_bits // 64
    bits = _bit_positions(F.col(key_col), m_bits, k)
    rows = dim.where(F.col(key_col).isNotNull()).select(
        F.explode(F.array(*bits)).alias("bit")
    )
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
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Scan-local Bloom membership pre-filter (keeps probable members).

    The word array is embedded in the plan as a literal (≈8 KB at the
    default sizing) — the test evaluates per row with no shuffle and no
    Python.  ``shiftrightunsigned`` only accepts a column shift amount
    through SQL, hence the expr-built bit test over aliased columns.
    """
    key = F.col(key_col)
    arr = F.array(*[F.lit(w).cast("bigint") for w in words])
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
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Semi-join ``fact`` to ``dim`` keys with a Bloom pre-filter.

    Exactly equivalent to ``fact SEMI JOIN dim`` (the exact join runs
    after the filter and kills false positives); the filter's job is to
    shrink the fact side's exchange input scan-locally.  With default
    sizing (64 Kbit, k=3) and a 4k-key build side the FP rate is ~0.1%.
    """
    words = build_bloom(dim, dim_key, m_bits, k)
    filtered = bloom_filter_rows(fact, fact_key, words, m_bits, k)
    dim_keys = dim.select(F.col(dim_key).alias(fact_key)).where(
        F.col(fact_key).isNotNull()
    )
    return filtered.join(dim_keys, fact_key, "semi")
