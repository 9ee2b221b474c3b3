"""Data-quality expectation suite: violation semantics per check kind,
integer ppm budgets, FK orphan counting, and the single-scan plan shape
for the row-local arms."""

from __future__ import annotations

from pyspark.sql import functions as F

from merkonvectordb_spark.operators import expectations as E


def _report(df, checks, **kw):
    rows = E.check_expectations(df, checks, **kw).collect()
    return {r["target"]: r for r in rows}


def _base(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "A", "ok"),
            (2, 55.0, "A", "ok"),       # between violation
            (3, None, "X", "ok"),       # in_set violation; NULL qty OK
            (None, 20.0, "B", None),    # not_null + matches-null skip
            (1, 30.0, "A", "bad!"),     # dup id + regex violation
        ],
        "id BIGINT, qty DOUBLE, flag STRING, note STRING",
    )


def test_row_local_violation_semantics(spark):
    rep = _report(
        _base(spark),
        [
            E.not_null("id"),
            E.between("qty", 1, 50),
            E.in_set("flag", ["A", "B"]),
            E.matches("note", "^ok$"),
            E.satisfies("qty_pos", F.col("qty") > 0),
        ],
    )
    assert rep["id"]["violations"] == 1
    # NULL qty is NOT a between violation (orthogonal to not_null)
    assert rep["qty[1,50]"]["violations"] == 1
    assert rep["flag{A,B}"]["violations"] == 1
    # NULL note is skipped by matches, 'bad!' counted
    assert rep["note~^ok$"]["violations"] == 1
    # satisfies counts NULL predicate results as violations
    assert rep["qty_pos"]["violations"] == 1
    assert all(r["total"] == 5 for r in rep.values())
    assert not any(r["passed"] for r in rep.values())


def test_unique_counts_extra_rows_and_null_keys_collide(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (None, "c"), (None, "c")],
        "k BIGINT, s STRING",
    )
    rep = _report(df, [E.unique("k", "s")])
    # (1,a) twice and (NULL,c) twice -> 2 extra rows beyond one-per-key
    assert rep["(k,s)"]["violations"] == 2
    assert rep["(k,s)"]["passed"] is False


def test_ppm_budget_integer_threshold(spark):
    # 100 rows, 5 duplicates: allowed = 100 * ppm DIV 1e6
    df = spark.range(100).select(
        F.when(F.col("id") < 5, 0).otherwise(F.col("id")).alias("k")
    )
    passed = {
        ppm: _report(df, [E.unique("k", max_violation_ppm=ppm)])["(k)"][
            "passed"
        ]
        for ppm in (0, 39_999, 40_000, 50_000)
    }
    # 4 extra rows; floor(100*39999/1e6)=3 < 4 <= floor(100*40000/1e6)=4
    assert passed == {
        0: False, 39_999: False, 40_000: True, 50_000: True
    }


def test_passed_flags_and_table_prefix(spark):
    rep = _report(
        _base(spark), [E.not_null("flag")], table="t"
    )
    assert rep == {
        "t.flag": rep["t.flag"]
    } and rep["t.flag"]["passed"] is True


def test_foreign_key_orphans_and_null_semantics(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (9,), (None,)], "fk BIGINT"
    )
    parent = spark.createDataFrame(
        [(1,), (1,), (2,), (None,)], "pk BIGINT"
    )
    for bc in (False, True):
        row = E.foreign_key(
            child, "fk", parent, "pk",
            child_table="c", parent_table="p", broadcast_parent=bc,
        ).collect()[0]
        # 9 is an orphan; NULL child key is not; dup parent keys don't
        # multiply the total
        assert row["violations"] == 1
        assert row["total"] == 4
        assert row["target"] == "c.fk->p.pk"
        assert row["passed"] is False


def test_row_local_checks_share_one_scan(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    _base(spark).write.parquet(p)
    df = spark.read.parquet(p)
    plan = E.check_expectations(
        df, [E.not_null("id"), E.between("qty", 1, 50)]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    # and a unique arm adds exactly one more (column-pruned) scan
    plan2 = E.check_expectations(
        df,
        [E.not_null("id"), E.between("qty", 1, 50), E.unique("id")],
    )._jdf.queryExecution().executedPlan().toString()
    assert plan2.count("Scan parquet") == 2


def test_empty_suite_raises(spark):
    try:
        E.check_expectations(_base(spark), [])
    except ValueError:
        pass
    else:
        raise AssertionError("empty suite must raise")


# -- property: report values match a Python reference ----------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_vals = st.lists(
    st.one_of(st.none(), st.integers(-5, 5)), min_size=0, max_size=25
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=_vals, ppm=st.sampled_from([0, 100_000, 500_000]))
def test_property_report_matches_python_reference(spark, vals, ppm):
    df = spark.createDataFrame([(v,) for v in vals], "v INT")
    rep = {
        r["check_name"]: r
        for r in E.check_expectations(
            df,
            [
                E.not_null("v", max_violation_ppm=ppm),
                E.between("v", -2, 2, max_violation_ppm=ppm),
                E.unique("v", max_violation_ppm=ppm),
            ],
        ).collect()
    }
    n = len(vals)
    v_null = sum(1 for v in vals if v is None)
    v_rng = sum(1 for v in vals if v is not None and not -2 <= v <= 2)
    v_dup = n - len(set(vals))  # None keys collide, as in the operator
    allowed = n * ppm // 1_000_000
    for name, viol in (
        ("not_null", v_null), ("between", v_rng), ("unique", v_dup)
    ):
        assert rep[name]["violations"] == viol, name
        assert rep[name]["total"] == n, name
        assert rep[name]["passed"] == (viol <= allowed), name
