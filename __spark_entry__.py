"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (brute-force cosine top-k, the
reference's GetNearestMatchesAsync re-expressed as a Catalyst plan) on
sf0.001.  ``queries()`` / ``oracle_sql()`` — the full operator registry,
implemented in ``merkonvectordb_spark.queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from merkonvectordb_spark import queries as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: top-10 cosine neighbors of vector 0 in the sf0.001 corpus."""
    return _registry.q_knn_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
