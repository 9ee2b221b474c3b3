"""Registry invariants the external harness depends on."""

from __future__ import annotations

import __spark_entry__ as entry


def test_first_50_are_the_verification_priority_block():
    """The external harness hash-checks only the first 50 registry
    entries; round 5 front-loads the 8 r4 driver-red queries (plus the
    sessionize bisect variants) and the 39 never-driver-checked ones —
    exactly 50.  Pin the block so a refactor can't silently reorder it."""
    names = list(entry.queries())
    first = set(names[:50])
    must_be_front = {
        # r4 red + bisect
        "events_sessionize", "events_sessionize_v_nevents",
        "events_sessionize_v_cents", "events_sessionize_v_bounds",
        "skew_salted_join", "tpch_q12", "events_range_join",
        "events_time_window_agg", "events_gap_fill_locf",
        "streaming_window_agg", "streaming_sessionize_closed",
        # representative never-checked entries
        "dedup_incremental", "semantic_dedup", "knn_batch_pq",
        "knn_batch_ivfpq", "knn_batch_ivf_persisted",
        "versioned_table_diff", "matview_incremental_refresh",
        "lineitem_cube", "events_pivot", "zorder_key",
        "streaming_sessionize_python", "streaming_cms_freq",
        "training_shards", "dup_span_stats", "dup_span_removal",
    }
    missing = must_be_front - first
    assert not missing, f"priority block lost: {sorted(missing)}"


def test_no_raw_timestamp_or_date_output_columns(spark, sf_dir):
    """Registry invariant (VERDICT r4 next-round #1): no registered query
    may output a raw TIMESTAMP/TIMESTAMP_NTZ/DATE column.  PySpark's
    ``collect()`` renders TimestampType as a naive ``datetime`` in the
    COLLECTING process's local zone — a property of the harness process
    that no session conf pins (root cause of the r4 ``streaming_window_agg``
    driver hash failure).  Every time value must ship as a ``unix_micros``
    BIGINT or an engine-stable string."""
    from pyspark.sql import types as T

    banned = (T.TimestampType, T.TimestampNTZType, T.DateType)
    offenders: list[str] = []
    for name, fn in entry.queries().items():
        df = fn(spark, sf_dir)
        bad = [
            f.name for f in df.schema.fields if isinstance(f.dataType, banned)
        ]
        if bad:
            offenders.append(f"{name}: {bad}")
    assert not offenders, "raw time-typed output columns:\n" + "\n".join(offenders)


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
