"""Registry invariants the external harness depends on."""

from __future__ import annotations

import __spark_entry__ as entry


def test_first_50_are_the_verification_priority_block():
    """The external harness hash-checks only the first 50 registry
    entries; round 4 front-loads the queries that lacked a driver-green
    row after round 3.  Pin the block so a refactor can't silently
    reorder it."""
    names = list(entry.queries())
    first = set(names[:50])
    must_be_front = {
        "events_sessionize",
        "tpch_q2", "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q17",
        "tpch_q21", "tpch_q22",
        "streaming_window_agg", "streaming_sessionize_closed",
        "streaming_stream_join", "streaming_dedup",
        "events_asof_join", "events_scd2_history",
        "seq_packing", "global_quantiles",
        "text_search_bm25", "hybrid_search_rrf",
    }
    missing = must_be_front - first
    assert not missing, f"priority block lost: {sorted(missing)}"


def test_every_query_has_an_oracle_or_is_documented():
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    # every registered query currently carries a DuckDB oracle twin
    assert o == q, f"oracle-less queries: {sorted(q - o)}"


def test_oracles_reference_only_preregistered_views():
    import re

    allowed = {
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    }
    for name, sql in entry.oracle_sql().items():
        # CTE names defined inside the query are fine; just check the
        # obvious FROM <bare_name> tables that aren't CTEs or subqueries
        ctes = set(re.findall(r"(\w+)\s*(?:\([^()]*\))?\s+AS\s*\(", sql))
        tables = set()
        for m in re.finditer(r"(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)\b", sql):
            rest = sql[m.end():].lstrip()
            if rest.startswith(")"):
                continue  # extract(hour FROM ts) — not a relation
            tables.add(m.group(1))
        unknown = tables - allowed - ctes - {"unnest", "generate_series"}
        assert not unknown, f"{name}: unknown relations {sorted(unknown)}"
