"""Declarative data-quality expectations (the Deequ/Great-Expectations
shape, Spark-first): a constraint suite compiles into ONE aggregation
pass over the table, returning a small report frame — one row per check.

A 100 TB training-data pipeline gates every ingest on checks like these
(null fractions, key uniqueness, domain membership, referential
integrity) before the data reaches dedup/curation; a validation layer
that re-scans the corpus once per constraint is unusable at that scale.
Design:

* **Row-local checks** (``not_null`` / ``between`` / ``in_set`` /
  ``matches`` / ``satisfies``) all fold into a single ``agg`` — one
  corpus scan, partial-aggregated map-side, producing a 1-row frame that
  explodes into the report.  Adding a check adds an expression, not a
  pass.
* **Uniqueness** needs a distinct count, which cannot share that pass
  without planning an Expand that drags every column through the
  shuffle (measured on the profiler: 24.6 s vs 2.7 s — see STATUS
  round-4 notes); each ``unique`` check runs as its own narrow
  column-pruned arm, same as ``q_lineitem_profile``.
* **Referential integrity** (:func:`foreign_key`) joins the child
  against the parent's distinct keys — one shuffle; pass
  ``broadcast_parent=True`` when the parent's key set fits in an
  executor (dimension tables), which removes the exchange entirely.

Thresholds are integer parts-per-million (``max_violation_ppm``), and a
check passes iff ``violations <= total * ppm DIV 1_000_000`` — exact
integer arithmetic, no float in any reported value, so reports hash
identically across engines (report schema is STRING/BIGINT/BOOLEAN
only).

Reference parity note: the reference has no validation surface at all
(writes land unchecked, MerkonMemoryStore.cs); this is pipeline
infrastructure a Spark deployment adds in front of it.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REPORT_DDL = (
    "check_name STRING, target STRING, violations BIGINT, "
    "total BIGINT, passed BOOLEAN"
)

# field separator / NULL sentinel for composite unique keys (mirrors in
# SQL as concat_ws over coalesce(cast(c AS VARCHAR), sentinel))
_SEP = "\x1f"
_NULL = "\x00<NULL>"


class Check(NamedTuple):
    """One compiled expectation.

    ``violation`` is a BOOLEAN Column — TRUE for rows that break the
    constraint (row-local checks only; ``unique`` carries the key
    columns instead and is compiled separately).
    """

    kind: str
    target: str
    violation: Column | None
    unique_cols: tuple[str, ...]
    max_violation_ppm: int


def not_null(col: str, max_violation_ppm: int = 0) -> Check:
    """Completeness: a violation is a NULL value.  A ppm budget turns
    this into Deequ's ``hasCompleteness(col, >= 1 - ppm/1e6)``."""
    return Check(
        "not_null", col, F.col(col).isNull(), (), int(max_violation_ppm)
    )


def between(
    col: str, lo, hi, max_violation_ppm: int = 0
) -> Check:
    """Domain range (inclusive).  NULLs are NOT violations here — pair
    with :func:`not_null` to reject them; keeping the two orthogonal
    lets a nullable column still carry a range contract."""
    v = F.col(col).isNotNull() & (
        (F.col(col) < F.lit(lo)) | (F.col(col) > F.lit(hi))
    )
    return Check(
        "between", f"{col}[{lo},{hi}]", v, (), int(max_violation_ppm)
    )


def in_set(
    col: str, values: Sequence, max_violation_ppm: int = 0
) -> Check:
    """Categorical domain membership (NULLs excluded, as in between)."""
    v = F.col(col).isNotNull() & ~F.col(col).isin(list(values))
    return Check(
        "in_set",
        f"{col}{{{','.join(str(x) for x in sorted(values))}}}",
        v,
        (),
        int(max_violation_ppm),
    )


def matches(
    col: str, pattern: str, max_violation_ppm: int = 0
) -> Check:
    """Regex shape check (NULLs excluded).  Keep patterns in the
    Java∩RE2 common subset if the report must mirror in another engine
    (character classes, anchors, quantifiers — no backreferences)."""
    v = F.col(col).isNotNull() & ~F.col(col).rlike(pattern)
    return Check(
        "matches", f"{col}~{pattern}", v, (), int(max_violation_ppm)
    )


def satisfies(
    name: str, expr: Column, max_violation_ppm: int = 0
) -> Check:
    """Arbitrary row predicate; a row violates iff the predicate is not
    TRUE (NULL counts as a violation — the predicate owns null
    handling)."""
    return Check(
        "satisfies",
        name,
        ~F.coalesce(expr, F.lit(False)),
        (),
        int(max_violation_ppm),
    )


def unique(*cols: str, max_violation_ppm: int = 0) -> Check:
    """Key uniqueness: violations = total − distinct key count, i.e.
    the number of EXTRA rows beyond one per key.  The key is the
    NULL-sentineled string concatenation of the columns, so NULL keys
    collide with each other (two all-NULL keys count as a duplicate) —
    the primary-key reading.  Caveat: columns are compared through
    their canonical string cast; use raw integer/string key columns,
    not floats or timestamps."""
    if not cols:
        raise ValueError("unique() needs at least one column")
    return Check(
        "unique", "(" + ",".join(cols) + ")", None, tuple(cols),
        int(max_violation_ppm),
    )


def _key_expr(cols: tuple[str, ...]) -> Column:
    return F.concat_ws(
        _SEP,
        *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols],
    )


def _passed(violations: Column, total: Column, ppm: int) -> Column:
    # exact integer threshold: floor(total * ppm / 1e6) with BIGINT DIV —
    # no float ever touches a reported decision, so a 1e12-row total is
    # still exact.  Contract: every caller's aggregate frame names its
    # row count column ``total`` (all three in-module call sites do);
    # the SQL-text DIV needs the name because the Column API has no
    # integral-division operator.
    del total  # resolved by name inside the expression
    allowed = F.expr(
        f"CAST({int(ppm)} AS BIGINT) * total DIV CAST(1000000 AS BIGINT)"
    )
    return violations <= allowed


def check_expectations(
    df: DataFrame, checks: Sequence[Check], table: str = ""
) -> DataFrame:
    """Run ``checks`` against ``df`` → report frame (``REPORT_DDL``).

    All row-local checks share ONE aggregation job (single scan, no
    persist needed — the report rows are built by exploding an array of
    structs from the 1-row aggregate, so no downstream branch re-reads
    the corpus).  Each ``unique`` check adds one narrow column-pruned
    aggregation of its own (see module docstring for why they must not
    fuse)."""
    prefix = f"{table}." if table else ""
    row_local = [c for c in checks if c.kind != "unique"]
    uniques = [c for c in checks if c.kind == "unique"]

    frames: list[DataFrame] = []
    if row_local:
        aggs = [F.count(F.lit(1)).cast("long").alias("total")] + [
            F.sum(c.violation.cast("long")).cast("long").alias(f"v{i}")
            for i, c in enumerate(row_local)
        ]
        one = df.agg(*aggs)
        structs = [
            F.struct(
                F.lit(c.kind).alias("check_name"),
                F.lit(prefix + c.target).alias("target"),
                F.coalesce(F.col(f"v{i}"), F.lit(0)).cast("long").alias(
                    "violations"
                ),
                F.col("total"),
                _passed(
                    F.coalesce(F.col(f"v{i}"), F.lit(0)),
                    F.col("total"),
                    c.max_violation_ppm,
                ).alias("passed"),
            )
            for i, c in enumerate(row_local)
        ]
        frames.append(
            one.select(F.explode(F.array(*structs)).alias("r")).select(
                "r.*"
            )
        )
    for c in uniques:
        one = df.select(
            _key_expr(c.unique_cols).alias("__k")
        ).agg(
            F.count(F.lit(1)).cast("long").alias("total"),
            F.count_distinct(F.col("__k")).cast("long").alias("nd"),
        )
        viol = (F.col("total") - F.col("nd")).cast("long")
        frames.append(
            one.select(
                F.lit("unique").alias("check_name"),
                F.lit(prefix + c.target).alias("target"),
                viol.alias("violations"),
                F.col("total"),
                _passed(viol, F.col("total"), c.max_violation_ppm).alias(
                    "passed"
                ),
            )
        )
    if not frames:
        raise ValueError("empty expectation suite")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def foreign_key(
    child: DataFrame,
    col: str,
    parent: DataFrame,
    parent_col: str,
    child_table: str = "",
    parent_table: str = "",
    max_violation_ppm: int = 0,
    broadcast_parent: bool = False,
) -> DataFrame:
    """Referential integrity: one report row counting child rows whose
    non-NULL key has no match in ``parent`` (NULL keys are not
    violations — FK semantics; add :func:`not_null` for NOT NULL FKs).

    The parent side is reduced to its DISTINCT keys before the join, so
    a non-unique parent key can never multiply child rows into the
    count.  One shuffle join by default; ``broadcast_parent`` pins a
    broadcast when the parent key set is dimension-sized — the plan a
    1000-executor fact-to-dim audit wants."""
    pk = parent.select(F.col(parent_col).alias("__pk")).distinct()
    if broadcast_parent:
        pk = F.broadcast(pk)
    joined = child.select(F.col(col).alias("__ck")).join(
        pk, F.col("__ck") == F.col("__pk"), "left"
    )
    one = joined.agg(
        F.count(F.lit(1)).cast("long").alias("total"),
        F.sum(
            (F.col("__ck").isNotNull() & F.col("__pk").isNull()).cast(
                "long"
            )
        ).cast("long").alias("v"),
    )
    cp = f"{child_table}." if child_table else ""
    pp = f"{parent_table}." if parent_table else ""
    viol = F.coalesce(F.col("v"), F.lit(0)).cast("long")
    return one.select(
        F.lit("foreign_key").alias("check_name"),
        F.lit(f"{cp}{col}->{pp}{parent_col}").alias("target"),
        viol.alias("violations"),
        F.col("total"),
        _passed(viol, F.col("total"), max_violation_ppm).alias("passed"),
    )
