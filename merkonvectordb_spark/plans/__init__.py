"""Plan inspection utilities (the 100 TB design gate's tooling)."""

from merkonvectordb_spark.plans.inspect import (
    count_exchanges,
    executed_plan,
    formatted_explain,
    has_operator,
    optimized_plan,
    pushed_filters,
)

__all__ = [
    "executed_plan",
    "optimized_plan",
    "formatted_explain",
    "has_operator",
    "count_exchanges",
    "pushed_filters",
]
