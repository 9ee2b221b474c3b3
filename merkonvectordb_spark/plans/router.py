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
    strategy: str  # "brute" | "ann"
    est_rows: int
    est_flops: float
    budget: float


def estimate_rows(df: DataFrame, row_bytes: int) -> int:
    """Catalyst's size estimate divided by an expected row width.  Uses
    rowCount when the catalog has one (ANALYZE'd tables), else
    sizeInBytes — never runs a job."""
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    rc = stats.rowCount()
    if rc.isDefined():
        return int(rc.get().longValue())
    return max(1, int(stats.sizeInBytes()) // max(1, row_bytes))


def route_knn_batch(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    n_queries: int,
    flop_budget: float = 2e12,
    allow_approx: bool = True,
    est_rows: int | None = None,
    brute_kwargs: dict | None = None,
    ann_kwargs: dict | None = None,
) -> tuple[RouteDecision, DataFrame]:
    """Pick exact vs ANN for a batched similarity search.

    Exact scoring costs ``rows × n_queries × dim`` multiply-adds; when
    that exceeds ``flop_budget`` and the caller allows approximation,
    route to the LSH index path (corpus touched only at candidate rows).
    ``n_queries`` is caller-supplied — the query batch is driver-known
    in every entry point, so no count job.  Returns (decision, plan);
    the decision is surfaced, not hidden, so callers can log/refuse it.
    Per-path kwargs are separate because the two operators expose
    different knobs (tie_break vs planes/extra_cols).
    """
    rows = est_rows if est_rows is not None else estimate_rows(
        corpus, row_bytes=4 * dim + 32
    )
    flops = float(rows) * float(max(0, n_queries)) * float(dim)
    if flops <= flop_budget or not allow_approx:
        decision = RouteDecision("brute", rows, flops, flop_budget)
        return decision, knn_batch(corpus, queries, k, **(brute_kwargs or {}))
    decision = RouteDecision("ann", rows, flops, flop_budget)
    return decision, knn_batch_ann(corpus, queries, k, **(ann_kwargs or {}))
