"""Query/oracle registry shared by all query modules.

Each driver-facing query registers a ``(spark, sf_dir) -> DataFrame``
callable plus (usually) a DuckDB-equivalent oracle SQL string.  Parity
rules (identical aliases both sides, raw-score thresholds with
output-only rounding, deterministic tie-breaks) are documented in
``queries.py``'s module docstring.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
