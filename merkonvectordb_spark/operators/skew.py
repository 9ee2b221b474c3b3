"""Skew mitigation: salting for hot keys.

AQE's skew-join handling (enabled in ``session.get_spark``) splits
oversized SHUFFLE partitions at runtime, but it cannot help when a
single key's rows must meet in one task anyway — a hot-key aggregation,
or a broadcast-ineligible join against a dimension where one key owns a
large fraction of the fact.  Salting rewrites the plan so the hot key's
rows spread over ``n_salt`` reducers:

* join: the fact side tags each row with a deterministic salt derived
  from the whole row; the dimension side replicates ``n_salt``× (tiny —
  it's a dimension) so every (key, salt) pair finds its match;
* aggregation: partial-aggregate on (key, salt) first — the hot key
  becomes n_salt bounded partials — then finish on key.

Salts are deterministic (xxhash64 of the row), never ``rand()`` — a
retried task must re-derive the same salt or shuffle retries corrupt
results.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_salt(df: DataFrame, n_salt: int) -> Column:
    """Per-row salt: hash of all columns PLUS a per-row position term.

    Without a position term, byte-identical duplicate rows (a hot key of
    repeated facts with no unique column) all hash to ONE salt and still
    funnel through a single reducer — the exact case salting exists for.
    ``spark_partition_id`` alone only separates duplicates that landed
    in different input partitions; with a few-partition read (one file,
    a coalesce) the hot key still uses 1-2 of the n_salt buckets.
    ``monotonically_increasing_id`` adds the within-partition row
    position, so every duplicate row gets its own salt.  RESULTS stay
    exact either way: the salt only routes rows — the fact-preserving
    join/agg forms are salt-invariant by construction — so the id's
    task-retry instability is harmless (a recomputed row may route to a
    different reducer; it still joins/aggregates identically).
    """
    return F.pmod(
        F.xxhash64(
            F.monotonically_increasing_id(),
            *[F.col(c) for c in df.columns],
        ),
        F.lit(n_salt),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe fact⋈dim equi-join: fact rows salt deterministically,
    the dim replicates n_salt×, the join key becomes (on…, salt).

    Row multiplicity is identical to the plain join only for fact-preserving
    join types (each fact row carries exactly one salt; each dim key exists
    for every salt).  right/full outer would emit each unmatched dim row once
    PER SALT — n_salt phantom rows — so those types are rejected.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports fact-preserving join types only, got {how!r}: "
            "right/full outer joins would replicate unmatched dim rows n_salt×"
        )
    f = fact.withColumn("__salt", _row_salt(fact, n_salt))
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return f.join(d, [*on, "__salt"], how).drop("__salt")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation for algebraic aggregates
    (sum/count/min/max): partial on (keys…, salt) → final on keys.
    ``aggs`` maps column → one of sum|count|min|max."""
    partial_exprs, final_exprs = [], []
    for col, fn in aggs.items():
        p = f"__p_{col}"
        if fn == "count":
            # COUNT(col) semantics: NULLs don't count — F.count(lit(1))
            # would silently report group ROW counts instead
            partial_exprs.append(F.count(F.col(col)).alias(p))
            final_exprs.append(F.sum(p).alias(f"{fn}_{col}"))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(f"{fn}_{col}"))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(f"{fn}_{col}"))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(f"{fn}_{col}"))
        else:
            raise ValueError(f"non-algebraic aggregate: {fn!r}")
    salted = df.withColumn("__salt", _row_salt(df, n_salt))
    return (
        salted.groupBy(*keys, "__salt")
        .agg(*partial_exprs)
        .groupBy(*keys)
        .agg(*final_exprs)
    )
