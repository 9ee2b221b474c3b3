"""Physical-plan inspection helpers.

We do NOT write a custom optimizer (SURVEY §4.2: Catalyst needs no custom
rule for parity) — this module is the other direction: assertions that
the plans Catalyst produces are the plans a 100 TB deployment needs
(TakeOrderedAndProject instead of global sorts, partial aggregation below
exchanges, broadcast on dimension sides only, pushed parquet filters).
Tests and the bench harness call these instead of string-poking
``_jdf`` internals everywhere.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical (executed) plan as text — AQE's initial plan before
    runtime re-optimization."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def has_operator(df: DataFrame, name: str) -> bool:
    """True if the physical plan contains an operator whose name matches
    ``name`` (substring, e.g. 'TakeOrderedAndProject', 'BroadcastHashJoin')."""
    return name in executed_plan(df)


def count_exchanges(df: DataFrame, kind: str = "hashpartitioning") -> int:
    """Number of shuffle exchanges of the given partitioning kind in the
    physical plan — the thing to minimize."""
    plan = executed_plan(df)
    return len(re.findall(rf"Exchange {re.escape(kind)}", plan))


def formatted_explain(df: DataFrame) -> str:
    """``df.explain('formatted')`` as a string instead of stdout."""
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters list in the formatted explain (one entry per
    parquet scan) — empty when no filter reached any scan.

    Bracket-BALANCED parse, not a non-greedy regex: a pushed filter like
    ``In(x, [1,2,3])`` contains ``]`` itself, and ``\\[(.*?)\\]`` would
    truncate it to ``In(x, [1,2,3`` — corrupted output that assertions
    silently mis-match."""
    text = formatted_explain(df)
    out: list[str] = []
    marker = "PushedFilters: ["
    i = text.find(marker)
    while i != -1:
        j = i + len(marker)
        depth = 1
        k = j
        while k < len(text) and depth:
            if text[k] == "[":
                depth += 1
            elif text[k] == "]":
                depth -= 1
            k += 1
        out.append(text[j : k - 1])
        i = text.find(marker, k)
    return out
