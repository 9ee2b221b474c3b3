"""k-anonymity / l-diversity audit semantics (operators.privacy)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from merkonvectordb_spark.operators.privacy import (
    k_anonymity_report,
    k_anonymity_summary,
)


@pytest.fixture(scope="module")
def people(spark):
    # (zip, age_band, disease): the textbook k-anonymity example shape
    rows = [
        # large, diverse cell: 4 rows, 3 distinct sensitive values
        ("02138", "20s", "flu"),
        ("02138", "20s", "cold"),
        ("02138", "20s", "flu"),
        ("02138", "20s", "asthma"),
        # large but HOMOGENEOUS cell: 3 rows, 1 sensitive value
        ("02139", "30s", "flu"),
        ("02139", "30s", "flu"),
        ("02139", "30s", "flu"),
        # singleton cell: k-anonymity violation
        ("02140", "40s", "cancer"),
        # all-NULL sensitive: counts toward size, 0 distinct values
        ("02141", "50s", None),
        ("02141", "50s", None),
    ]
    return spark.createDataFrame(
        rows, "zip STRING, age_band STRING, disease STRING"
    )


def test_report_flags_small_and_homogeneous_cells(people):
    rep = k_anonymity_report(
        people, ("zip", "age_band"), "disease", k=2, l_div=2
    )
    got = {(r.zip, r.age_band): r for r in rep.collect()}
    assert len(got) == 4
    big = got[("02138", "20s")]
    assert (big.n_rows, big.n_sensitive, big.k_ok, big.l_ok) == (
        4, 3, True, True,
    )
    homog = got[("02139", "30s")]
    assert (homog.n_rows, homog.n_sensitive, homog.k_ok, homog.l_ok) == (
        3, 1, True, False,
    )
    single = got[("02140", "40s")]
    assert (single.n_rows, single.k_ok) == (1, False)
    # NULL sensitive: group size counts the rows, distinct count is 0,
    # l-diversity fails conservatively
    nulls = got[("02141", "50s")]
    assert (nulls.n_rows, nulls.n_sensitive, nulls.l_ok) == (2, 0, False)


def test_summary_rollup_integer_ppm(people):
    rep = k_anonymity_report(
        people, ("zip", "age_band"), "disease", k=2, l_div=2
    )
    s = k_anonymity_summary(rep).collect()[0]
    assert s.n_groups == 4 and s.n_rows_total == 10
    assert s.n_groups_small == 1  # the singleton
    # all-flu + all-NULL + the singleton (1 distinct value < l)
    assert s.n_groups_homogeneous == 3
    assert s.n_rows_at_risk == 1
    assert s.at_risk_ppm == 100_000  # 1/10 in integer ppm


def test_report_rejects_bad_arguments(people):
    with pytest.raises(ValueError, match="quasi-identifier"):
        k_anonymity_report(people, (), "disease", k=2, l_div=2)
    with pytest.raises(ValueError, match=">= 1"):
        k_anonymity_report(people, ("zip",), "disease", k=0, l_div=2)


def test_single_shuffle_no_expand(people):
    """One count-distinct in the agg must plan as a two-phase hash
    aggregate — no Expand carrying every column through the shuffle
    (the round-4 profiling trap)."""
    rep = k_anonymity_report(
        people, ("zip", "age_band"), "disease", k=2, l_div=2
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
