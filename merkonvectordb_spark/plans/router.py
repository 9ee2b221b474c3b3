"""Cost-based retrieval routing (SURVEY §7.7's "optional optimizer
work", done at the API layer instead of as a Catalyst rule).

The reference has exactly one retrieval strategy — the O(N·d)
single-threaded scan (`MerkonMemoryStore.cs:133-148`).  This engine has
two physical strategies for the same logical query (exact brute-force
`knn_batch`, approximate LSH `knn_batch_ann`), and the right one depends
on runtime quantities Catalyst cannot see (score-flops = rows × queries
× dim, and whether the caller tolerates approximate recall).  The
router is therefore deliberately a *logical-plan-level* decision, the
same altitude at which Spark decides broadcast vs shuffle join: estimate
cost from catalog statistics, compare against a budget, emit the chosen
DataFrame plan — which Catalyst then optimizes as usual.

Cost estimation uses `optimizedPlan().stats().sizeInBytes` — the same
statistic AQE's broadcast decisions consume — so no extra job runs to
count the corpus.  A caller with better knowledge (e.g. a metastore row
count) passes ``est_rows`` and skips the estimate entirely.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from merkonvectordb_spark.operators.ann import knn_batch_ann
from merkonvectordb_spark.operators.search import knn_batch


@dataclass(frozen=True)
class RouteDecision:
    strategy: str  # "brute" | "sq8" | "ann" | "ivfpq"
    est_rows: int
    est_flops: float
    budget: float
    # the IO dimension, populated on every route so a surfaced decision
    # shows WHICH resource bound fired and by how much
    est_scan_bytes: float = 0.0
    byte_budget: float = 0.0
    # "flops" | "bytes" | "flops+bytes" (both budgets blown → ivfpq) | "none"
    binding_resource: str = "none"


def estimate_rows(df: DataFrame, row_bytes: int) -> int | None:
    """Catalyst's size estimate divided by an expected row width.  Uses
    rowCount when the catalog has one (ANALYZE'd tables), else
    sizeInBytes — never runs a job.

    Returns ``None`` when the source has NO real statistics: a
    stats-less plan (JDBC/DSv2 without stats, RDD-backed) reports
    ``spark.sql.defaultSizeInBytes`` = Long.MaxValue, which would
    inflate the estimate to ~10^16 rows and silently route every query
    — even a 100-row corpus — to an approximate strategy."""
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    rc = stats.rowCount()
    if rc.isDefined():
        return int(rc.get().longValue())
    size = int(stats.sizeInBytes())
    if size >= (1 << 62):  # the defaultSizeInBytes sentinel: no stats
        return None
    return max(1, size // max(1, row_bytes))


def route_knn_batch(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    n_queries: int,
    flop_budget: float = 2e12,
    byte_budget: float = 64e9,
    allow_approx: bool = True,
    est_rows: int | None = None,
    brute_kwargs: dict | None = None,
    ann_kwargs: dict | None = None,
    sq8_kwargs: dict | None = None,
    ivfpq_kwargs: dict | None = None,
) -> tuple[RouteDecision, DataFrame]:
    """Pick a physical strategy for a batched similarity search.

    Two independent resources, four strategies:

    * BOTH budgets blown → IVF-PQ (``knn_batch_ivfpq``: list pruning
      cuts rows, codes cut bytes) — requires ``ivfpq_kwargs`` to carry
      ``centroids``; without them the flops bound wins and LSH routes.
    * ``flops`` = rows × n_queries × dim multiply-adds — the COMPUTE
      dimension.  Over ``flop_budget`` only candidate pruning helps →
      LSH (``knn_batch_ann``: corpus touched at candidate rows only).
    * ``scan_bytes`` = rows × row width — the IO dimension.  Over
      ``byte_budget`` with compute still affordable, the right lever is
      SQ8 (``knn_batch_sq8``: scan int8 codes, 8× fewer bytes, exact
      re-rank on k·refine rows).
    * Under both budgets (or when the caller demands exactness):
      exact ``knn_batch``.

    ``n_queries`` is caller-supplied — the query batch is driver-known
    in every entry point, so no count job.  Returns (decision, plan);
    the decision is surfaced, not hidden, so callers can log/refuse it.
    Per-path kwargs are separate because the operators expose different
    knobs (tie_break vs planes/extra_cols vs refine).
    """
    row_bytes = 4 * dim + 32
    rows = est_rows if est_rows is not None else estimate_rows(
        corpus, row_bytes=row_bytes
    )
    if rows is None:
        # no statistics at all: be CORRECT by default — exact brute
        # force, never a silent downgrade to approximate results on an
        # unknown-size corpus.  Callers that know the scale pass
        # est_rows explicitly.
        decision = RouteDecision("brute", -1, 0.0, flop_budget,
                                 0.0, byte_budget, "none")
        return decision, knn_batch(
            corpus, queries, k, **(brute_kwargs or {})
        )
    flops = float(rows) * float(max(0, n_queries)) * float(dim)
    scan_bytes = float(rows) * float(row_bytes)
    if (
        allow_approx
        and flops > flop_budget
        and scan_bytes > byte_budget
        and (ivfpq_kwargs or {}).get("centroids") is not None
    ):
        from merkonvectordb_spark.operators.ann import knn_batch_ivfpq

        decision = RouteDecision(
            "ivfpq", rows, flops, flop_budget,
            scan_bytes, byte_budget, "flops+bytes",
        )
        return decision, knn_batch_ivfpq(
            corpus, queries, k, **(ivfpq_kwargs or {})
        )
    if allow_approx and flops > flop_budget:
        decision = RouteDecision(
            "ann", rows, flops, flop_budget,
            scan_bytes, byte_budget, "flops",
        )
        return decision, knn_batch_ann(
            corpus, queries, k, **(ann_kwargs or {})
        )
    if allow_approx and scan_bytes > byte_budget:
        from merkonvectordb_spark.operators.ann import knn_batch_sq8

        decision = RouteDecision(
            "sq8", rows, flops, flop_budget,
            scan_bytes, byte_budget, "bytes",
        )
        return decision, knn_batch_sq8(
            corpus, queries, k, **(sq8_kwargs or {})
        )
    decision = RouteDecision(
        "brute", rows, flops, flop_budget, scan_bytes, byte_budget, "none"
    )
    return decision, knn_batch(corpus, queries, k, **(brute_kwargs or {}))
