"""The reference's async-LINQ read surface (SURVEY §2.5 R2;
Linq/AsyncEnumerable.cs:44-140) as thin Spark equivalents.

Two renderings:

* driver-returning helpers mirroring the reference API shape
  (first/last/to_list/count/any/contains) — each is one bounded Spark
  action (``limit(1)`` probes, a count, or an explicit collect);
* :func:`summary`, the declarative one-row aggregate form — all six
  semantics in a SINGLE scan + partial aggregation, which is what a
  distributed engine should prefer over six separate actions.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, Row
from pyspark.sql import functions as F


def first_or_none(df: DataFrame, order_cols: list[str] | None = None) -> Row | None:
    """FirstOrDefaultAsync (AsyncEnumerable.cs:44-52): first row in
    ascending ``order_cols`` (storage order ≙ ingest_seq), None when
    empty.  Plans as TakeOrderedAndProject — never a full sort."""
    if order_cols:
        df = df.orderBy(*[F.asc(c) for c in order_cols])
    rows = df.limit(1).collect()
    return rows[0] if rows else None


def last_or_none(df: DataFrame, order_cols: list[str]) -> Row | None:
    """LastOrDefaultAsync (AsyncEnumerable.cs:54-66): needs an explicit
    order — a distributed table has no implicit tail."""
    rows = df.orderBy(*[F.desc(c) for c in order_cols]).limit(1).collect()
    return rows[0] if rows else None


def to_list(df: DataFrame) -> list[Row]:
    """ToListAsync (AsyncEnumerable.cs:68-78) — an explicit full collect;
    the one helper that intentionally funnels data to the driver."""
    return df.collect()


def count(df: DataFrame) -> int:
    """CountAsync (AsyncEnumerable.cs:93-102)."""
    return df.count()


def any_match(df: DataFrame, pred: Column) -> bool:
    """AnyAsync(pred) (AsyncEnumerable.cs:114-140): existence via a
    ``limit(1)`` probe — never a full count."""
    return bool(df.where(pred).limit(1).count())


def contains(df: DataFrame, col: str, value: Any) -> bool:
    """ContainsAsync (AsyncEnumerable.cs:80-91)."""
    return any_match(df, F.col(col) == F.lit(value))


def summary(
    df: DataFrame,
    key_col: str,
    order_col: str,
    any_pred: Column,
    contains_value: Any,
) -> DataFrame:
    """All R2 semantics as ONE aggregation plan (no driver round-trips):
    first/last by ``order_col`` via min_by/max_by, count, existence
    flags via bool_or."""
    return df.agg(
        F.min_by(key_col, order_col).alias("first_key"),
        F.max_by(key_col, order_col).alias("last_key"),
        F.count(F.lit(1)).alias("n_rows"),
        F.bool_or(any_pred).alias("any_match"),
        F.bool_or(F.col(key_col) == F.lit(contains_value)).alias("contains_key"),
    )
