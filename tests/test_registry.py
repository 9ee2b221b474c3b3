"""Registry invariants the external harness depends on."""

from __future__ import annotations

import __spark_entry__ as entry


def test_first_50_are_the_verification_priority_block():
    """The external harness hash-checks only the first 50 registry
    entries; round 6 front-loads the 13 r5 driver-red queries (HUGEINT
    oracle class, fixed), the 27 never-driver-checked ones, the new
    2 new-this-round oracles (router + k-anonymity), and 8 sentinels
    incl. the 2 latent-HUGEINT fixes —
    exactly 50.  Pin the block so a refactor can't silently reorder it."""
    names = list(entry.queries())
    first = set(names[:50])
    must_be_front = {
        # r5 red (HUGEINT oracle class — re-verify after the fix)
        "events_sessionize", "events_sessionize_v_nevents",
        "events_sessionize_v_cents", "events_sessionize_v_bounds",
        "skew_salted_join", "tpch_q12", "events_range_join",
        "events_time_window_agg", "events_gap_fill_locf",
        "streaming_window_agg", "streaming_sessionize_closed",
        "events_hierarchical_rollup", "streaming_sessionize_python",
        # never driver-checked
        "knn_batch_prenorm", "knn_batch_ann_multiprobe",
        "knn_batch_ivf_appended", "merkondb_roundtrip",
        "data_expectations", "streaming_expectations", "hll_distinct",
        "bigram_lm_score", "semantic_decontam", "cross_source_overlap",
        "split_leakage_audit", "minhash_calibration",
        "gopher_rules_report", "token_zipf_fit", "quality_robust_stats",
        "quality_weighted_sample", "quality_quantile_normalize",
        "domain_quality_prior", "events_psi_drift",
        "streaming_psi_drift", "sliding_distinct_users",
        "sq8_quantization_error", "embedding_pca_anisotropy",
        "char_entropy_screen", "doc_fixed_k_sample",
        "tokenizer_fertility", "packing_efficiency",
        # new this round
        "router_knn_batch", "k_anonymity_audit",
        # latent-HUGEINT fixes, re-check is load-bearing
        "events_window_agg", "events_rollup",
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


def _duck_con(sf):
    import duckdb

    from merkonvectordb_spark.schema import TESTDATA_TABLES

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    return con


def test_no_hugeint_decimal_or_time_typed_oracle_outputs(sf_dir):
    """Registry invariant (VERDICT r5 next-round #2): no oracle's DuckDB
    output schema may contain HUGEINT, DECIMAL, TIMESTAMP, DATE, or
    TIME.  DuckDB widens every integer ``sum()`` (including windowed
    sums) to HUGEINT (int128); the external gate fetches results via
    pandas/arrow, where int128 lands as float64 (renders ``5.0``) or
    decimal128 (renders ``Decimal('5')``) while Spark's side is a plain
    BIGINT ``5`` — the content hash mismatches with every value
    numerically identical.  This was the SINGLE root cause of all 13 r5
    and all 8 r4 driver-red rows (50/50 predictive, zero exceptions).
    Fix style: ``CAST(sum(x) AS BIGINT)`` in the oracle.  TIMESTAMP/
    DATE were the r4 class (collect() renders them in the collecting
    process's zone) — pinned here in the same sweep."""
    banned = ("HUGEINT", "UHUGEINT", "DECIMAL", "TIMESTAMP", "DATE", "TIME")
    con = _duck_con(sf_dir)
    offenders = []
    for name, sql in entry.oracle_sql().items():
        rel = con.sql(sql)
        bad = [
            f"{c}:{t}"
            for c, t in zip(rel.columns, rel.types)
            if any(b in str(t).upper() for b in banned)
        ]
        if bad:
            offenders.append(f"{name}: {bad}")
    assert not offenders, (
        "oracle output columns with gate-hostile DuckDB types:\n"
        + "\n".join(offenders)
    )


def test_arrow_fetch_canon_agrees_with_fetchall_canon(sf_dir):
    """The builder's local gate canon (``fetchall()`` → native Python
    ints) could not represent the external gate's pandas/arrow fetch
    path — which is why three rounds of local verification (168/168,
    tuned AND bare) never reproduced the driver's 13 red rows.  Pin the
    second canon mode: for every oracle, hashing the DuckDB result via
    ``canon_rows_arrow`` (arrow round-trip) must agree byte-for-byte
    with hashing ``fetchall()`` rows.  Any oracle whose output type
    mutates across the fetch boundary (HUGEINT→decimal128, etc.) fails
    here locally instead of only in the driver's gate."""
    from merkonvectordb_spark.canon import canon_rows, canon_rows_arrow

    con = _duck_con(sf_dir)
    diverged = []
    for name, sql in entry.oracle_sql().items():
        rel = con.sql(sql)
        ah, _ = canon_rows_arrow(rel)
        rel2 = con.sql(sql)
        fh, _ = canon_rows(rel2.columns, rel2.fetchall())
        if ah != fh:
            diverged.append(name)
    assert not diverged, (
        f"fetch-path-divergent oracles (arrow canon != fetchall canon): "
        f"{diverged}"
    )


def test_oracles_reference_only_preregistered_views():
    import re

    from merkonvectordb_spark.schema import TESTDATA_TABLES

    allowed = set(TESTDATA_TABLES)
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
