"""Privacy QA for training corpora: k-anonymity and l-diversity audits.

Next to PII *detection/redaction* (``functions.text.pii_counts`` /
``pii_redact``, which find explicit identifiers), this measures the
RE-IDENTIFICATION surface of quasi-identifiers — the Sweeney
k-anonymity model and its Machanavajjhala l-diversity refinement:

* a quasi-identifier (QI) combination shared by fewer than ``k`` rows
  singles its subjects out (linkage attack surface);
* a QI group whose SENSITIVE attribute takes fewer than ``l`` distinct
  values leaks that attribute even when the group is large (homogeneity
  attack).

Scale shape: ONE partial-aggregable groupBy on the QI columns — count
plus a single count-distinct (two-phase hash aggregate, no Expand) —
so the audit costs one shuffle of |QI-groups| rows at any corpus size.
The per-group frame IS the actionable artifact (which combinations to
generalize or suppress); the one-row rollup rides on top of it.  All
report values are STRING/BIGINT/BOOLEAN — hash-stable by construction,
same contract as ``operators.expectations``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame,
    qi_cols: Sequence[str],
    sensitive_col: str,
    k: int,
    l_div: int,
) -> DataFrame:
    """Per-QI-group audit frame: group size, distinct sensitive values,
    and the two pass flags.  ``k_ok`` = the group is k-anonymous;
    ``l_ok`` = it is l-diverse (distinct-count l-diversity).  Rows with
    a NULL sensitive value still count toward group size but contribute
    no sensitive value (count distinct ignores NULL — a group of
    all-NULL sensitives reports 0 distinct and fails ``l_ok``, the
    conservative reading)."""
    if not qi_cols:
        raise ValueError("need at least one quasi-identifier column")
    if k < 1 or l_div < 1:
        raise ValueError("k and l must be >= 1")
    return (
        df.groupBy(*[F.col(c) for c in qi_cols])
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(F.col(sensitive_col)).alias("n_sensitive"),
        )
        .select(
            *qi_cols,
            "n_rows",
            "n_sensitive",
            (F.col("n_rows") >= F.lit(int(k))).alias("k_ok"),
            (F.col("n_sensitive") >= F.lit(int(l_div))).alias("l_ok"),
        )
    )


def k_anonymity_summary(report: DataFrame) -> DataFrame:
    """One-row rollup of a ``k_anonymity_report`` frame: group and row
    totals, how many groups (and rows) fail each property, and the
    at-risk row share in integer ppm (no float in the report)."""
    return report.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n_rows").cast("bigint").alias("n_rows_total"),
        F.sum(F.when(~F.col("k_ok"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_groups_small"),
        F.sum(F.when(~F.col("l_ok"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_groups_homogeneous"),
        F.sum(F.when(~F.col("k_ok"), F.col("n_rows")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_at_risk"),
        (
            F.sum(F.when(~F.col("k_ok"), F.col("n_rows")).otherwise(0))
            * F.lit(1_000_000)
            / F.sum("n_rows")
        )
        .cast("bigint")
        .alias("at_risk_ppm"),
    )
