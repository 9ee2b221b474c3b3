"""Brute-force k-NN search — the reference's one real query
(GetNearestMatchesAsync, MerkonMemoryStore.cs:117-150) re-expressed as a
Catalyst plan: scan → score → NaN-safe threshold → TakeOrderedAndProject.

Plan shape at scale (verified via .explain):

* the collection filter partition-prunes the scan (S3);
* dropping the embedding column prunes the dominant bytes at the parquet
  scan when ``with_embeddings=False`` — column pruning happens BEFORE the
  scan, unlike the reference which always materializes embeddings
  (MerkonMemoryStore.cs:133 vs :140, SURVEY §4.1);
* ``orderBy(desc).limit(k)`` plans as TakeOrderedAndProject: per-partition
  heap top-k + driver merge — O(N log k), no full shuffle/sort.  At 1000
  executors this is a single reduce of 1000·k rows, not a 100 TB sort;
* batch form broadcasts the query set and computes per-query top-k with a
  window — one corpus scan for Q queries instead of Q scans.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from merkonvectordb_spark.functions.vector import (
    cosine_similarity,
    cosine_similarity_pandas,
    dot_product,
    l2_normalize,
    vector_literal,
)


def unit_query(query: Sequence[float]) -> list[float] | None:
    """Driver-side L2 normalization of a query vector, or None for a
    zero-norm query (unscorable — the reference's NaN fails every
    threshold).  Left-fold sum + IEEE sqrt + per-element division: the
    exact operation order the engines' ``x / sqrt(list_dot_product)``
    performs, so oracle scores stay bit-identical."""
    import math

    acc = 0.0
    for v in query:
        acc += float(v) * float(v)
    n = math.sqrt(acc)
    if n == 0.0:
        return None
    return [float(v) / n for v in query]


def _scoreable_at_least(score: Column, threshold: float) -> Column:
    """Inclusive threshold over scoreable rows only.

    Unscorable rows (zero-norm vectors) carry NULL score (see
    ``functions.vector.cosine_similarity``) and must be excluded — the
    reference's NaN fails its ``>=`` the same way (MerkonMemoryStore.cs:138).
    The explicit ``isnan`` guard stays because NaN can still arrive from NaN
    *elements* in user data, and Spark orders NaN largest (SURVEY §2.2 P3).
    """
    return (
        score.isNotNull() & (~F.isnan(score)) & (score >= F.lit(float(threshold)))
    )


def knn(
    vectors: DataFrame,
    query: Sequence[float],
    k: int,
    min_score: float = 0.0,
    collection: str | None = None,
    with_embeddings: bool = False,
    embedding_col: str = "embedding",
    tie_break: str | None = "ingest_seq",
    use_pandas: bool = False,
    assume_normalized: bool = False,
) -> DataFrame:
    """Top-k rows by cosine similarity to ``query``.

    ``assume_normalized=True`` is the pre-normalized-corpus fast path
    (``VectorStore(pre_normalized=True)`` layout): the stored embeddings
    are unit vectors, so the cosine collapses to a single dot-product
    fold against the unit query — one fold per row instead of three
    (dot + both norms).  At 100 TB this halves-plus the per-query FLOPs
    and is the layout a real deployment should use
    (functions/vector.py:19-21).  A zero-norm query is unscorable
    (reference NaN semantics) and returns the empty frame.

    Parity quirks pinned (SURVEY §5.2.3): limit ≤ 0 ⇒ empty
    (MerkonMemoryStore.cs:125-128); threshold inclusive; zero-vector NaN
    excluded; empty/NULL keys excluded (the reference purges them before
    every search, MerkonDatabase.cs:72-88 — we filter instead of mutating);
    ties break by ingest order (stable sort, MerkonMemoryStore.cs:146);
    ``with_embeddings=False`` drops the embedding column entirely (the
    relational rendering of the reference's empty-vector projection,
    MerkonMemoryStore.cs:286).
    """
    if k <= 0:
        empty = vectors.limit(0).withColumn("score", F.lit(0.0))
        return empty if with_embeddings else empty.drop(embedding_col)

    df = vectors
    if collection is not None:
        df = df.where(F.col("collection") == collection)
    if "key" in df.columns:
        df = df.where(F.col("key").isNotNull() & (F.col("key") != ""))
    # rows whose embedding can't be scored (dimension mismatch / empty) are
    # excluded — the reference would throw; a distributed engine must not.
    df = df.where(F.size(F.col(embedding_col)) == len(query))

    if assume_normalized:
        uq = unit_query(query)
        if uq is None:  # zero-norm query: nothing can score
            empty = vectors.limit(0).withColumn("score", F.lit(0.0))
            return empty if with_embeddings else empty.drop(embedding_col)
        score = dot_product(F.col(embedding_col), vector_literal(uq))
    elif use_pandas:
        score = cosine_similarity_pandas(query)(F.col(embedding_col))
    else:
        score = cosine_similarity(F.col(embedding_col), vector_literal(query))
    # threshold + ordering act on the RAW score (the reference filters the
    # raw similarity, MerkonMemoryStore.cs:138); rounding is output-only —
    # filtering a rounded score would admit e.g. 0.5999996 at t=0.6.
    # no spread_small_scan here (unlike knn_batch): single-query scoring
    # is one dot/cosine fold per row — measured round 10, the round-robin
    # exchange cost ≈ the serial compute it spreads (knn_topk 0.39 s →
    # 0.57-0.90 s), a net loss; the batch form's Q-fold work is what
    # justifies the exchange
    df = df.withColumn("__raw", score)
    df = df.where(_scoreable_at_least(F.col("__raw"), min_score))
    order = [F.desc("__raw")]
    if tie_break and tie_break in df.columns:
        order.append(F.asc(tie_break))
    df = (
        df.orderBy(*order)
        .limit(k)
        .withColumn("score", F.round(F.col("__raw"), 6))
        .drop("__raw")
    )
    if not with_embeddings:
        df = df.drop(embedding_col)
    return df


def knn_batch(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    min_score: float = 0.0,
    embedding_col: str = "embedding",
    query_embedding_col: str = "embedding",
    query_id_col: str = "query_id",
    tie_break: str | None = "ingest_seq",
    assume_normalized: bool = False,
) -> DataFrame:
    """Per-query top-k for a whole query SET in one corpus scan.

    ``assume_normalized=True``: the corpus embeddings are unit vectors
    (pre-normalized layout); query vectors are normalized ONCE in the
    Q-row broadcast projection (zero-norm queries drop — unscorable),
    and scoring is a single dot fold per (row, query) pair instead of
    three.  The amortization argument: cosine costs 3 folds per pair;
    with the corpus normalized once (3 folds per ROW, off the per-query
    path), Q queries cost N·Q folds instead of 3·N·Q.

    Not in the reference (its API is one query at a time) but required at
    Spark scale (SURVEY §2.4 batch form): broadcast the (small) query set,
    cross-join against the corpus — Catalyst plans BroadcastNestedLoopJoin,
    so the 100 TB side streams once — then per-query top-k via
    ``row_number() <= k`` over ``Window.partitionBy(qid)``.

    **Two-phase at the physical layer:** Spark ≥3.5 rewrites this window
    into ``WindowGroupLimit Partial`` (map-side per-partition top-k heap,
    bounded at k rows per query per input partition) → Exchange of
    ≤ Q·P·k survivors → ``WindowGroupLimit Final``.  The scored N·Q
    cross-product is therefore never shuffled — only k·Q rows per input
    partition move.  ``tests/test_search.py`` pins this plan shape so a
    config/version regression (which would reintroduce the full N·Q
    shuffle into Q reducer tasks — a 100 TB scale-killer) fails loudly.
    """
    qproj = queries.select(
        F.col(query_id_col).alias("__qid"),
        F.col(query_embedding_col).alias("__qvec"),
    )
    if assume_normalized:
        # normalize each query once in the Q-row frame — NEVER per
        # corpus row; zero-norm queries are unscorable and drop here
        qproj = qproj.withColumn(
            "__qvec", l2_normalize(F.col("__qvec"))
        ).where(F.col("__qvec").isNotNull())
    q = F.broadcast(qproj)
    corpus = vectors
    if "key" in corpus.columns:
        corpus = corpus.where(F.col("key").isNotNull() & (F.col("key") != ""))
    score = (
        dot_product(F.col(embedding_col), F.col("__qvec"))
        if assume_normalized
        else cosine_similarity(F.col(embedding_col), F.col("__qvec"))
    )
    from merkonvectordb_spark.operators.skew import spread_small_scan

    # per-(row, query) scoring is CPU-bound fold arithmetic and the
    # BroadcastNestedLoopJoin runs on the corpus's OWN partitioning — a
    # narrow small-file scan would score serially; no-op at cluster scale
    scored = (
        spread_small_scan(corpus).crossJoin(q)
        .where(F.size(F.col(embedding_col)) == F.size(F.col("__qvec")))
        .withColumn("__raw", score)
        .where(_scoreable_at_least(F.col("__raw"), min_score))
    )
    order = [F.desc("__raw")]
    if tie_break and tie_break in vectors.columns:
        order.append(F.asc(tie_break))
    w = Window.partitionBy("__qid").orderBy(*order)
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .withColumn("score", F.round(F.col("__raw"), 6))
        .drop("__rn", "__raw", "__qvec", embedding_col)
        .withColumnRenamed("__qid", query_id_col)
    )


def mmr_rerank(
    cand: DataFrame,
    psim: DataFrame,
    k: int,
    lam: float = 0.5,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    strategy: str = "local",
) -> DataFrame:
    """Maximal-marginal-relevance diversification over a per-query
    candidate set: greedily pick the candidate maximizing
    ``lam * sim(q, d) - (1 - lam) * max_{s in selected} sim(d, s)``.

    Two physical strategies with IDENTICAL results:

    * ``"local"`` (default): cogroup ``cand`` and ``psim`` on query_id
      and run the whole greedy loop per query inside one
      ``applyInPandas`` task — ONE shuffle, one job, regardless of k.
      Candidate sets are re-rank-width by construction (top-N per
      query), so a group always fits a task; with millions of queries
      every group solves in parallel.  This is the shape a large
      deployment wants: the iterative form's latency is k-1 sequential
      cluster-wide jobs, the local form's is one.
    * ``"iterative"``: the k-1-step dataflow loop below — kept for the
      degenerate case of candidate sets too wide for one task.

    ``cand`` carries ``(query_id, vec_id, qs)`` (raw query-relevance,
    UNROUNDED — rounding happens at output only) and ``psim`` the raw
    pairwise sims ``(query_id, a, b, sim)`` among that query's
    candidates.  Expressed as k-1 dataflow iterations over the
    candidate-width frames — the frames are (queries × top-N) rows, so
    cost follows re-rank width, never corpus size; candidate generation
    upstream is the existing top-k machinery.  Ties break on lowest id.

    Use ``lam`` values exactly representable in binary (0.5, 0.25,
    0.75): the oracle interpolates the SAME literals, and an
    unrepresentable ``1 - lam`` would diverge in the last ulp.

    Returns ``(query_id, vec_id, sel_rank, mmr_score)``; rank 1's score
    is its raw relevance (greedy seed), later ranks the MMR objective.
    """
    qk, ik = query_id_col, id_col
    # unscorable candidates (NULL/NaN relevance) are excluded up front,
    # identically for both strategies: Spark's window would order NaN
    # LARGEST (seeding on garbage) while a Python max would propagate
    # it differently — the contract is that ``qs`` is a real score
    cand = cand.where(F.col("qs").isNotNull() & (~F.isnan("qs")))
    if strategy == "local":
        return _mmr_rerank_local(cand, psim, k, lam, qk, ik)
    if strategy != "iterative":
        raise ValueError(f"unknown mmr strategy: {strategy!r}")
    # the loop re-references cand/psim every iteration and the selected
    # set's lineage grows per step — persist the invariants and cut the
    # accumulator's lineage (same persist-or-recompute law PageRank
    # measured; without this, k-1 iterations re-run the candidate
    # scoring DAG k-1 times over)
    cand = cand.persist()
    psim = psim.persist()
    w_seed = Window.partitionBy(qk).orderBy(F.desc("qs"), F.asc(ik))
    selected = (
        cand.withColumn("__rn", F.row_number().over(w_seed))
        .where(F.col("__rn") == 1)
        .select(
            qk,
            ik,
            F.lit(1).alias("sel_rank"),
            F.col("qs").alias("__mscore"),
        )
    ).localCheckpoint()
    for r in range(2, k + 1):
        rem = cand.join(selected.select(qk, ik), [qk, ik], "left_anti")
        ms = (
            psim.join(
                selected.select(qk, F.col(ik).alias("__sel")),
                [qk],
            )
            .where(F.col("b") == F.col("__sel"))
            .groupBy(qk, "a")
            .agg(F.max("sim").alias("__ms"))
            .withColumnRenamed("a", ik)
        )
        # LEFT join: a candidate with no pairwise-sim row against any
        # selected item is maximally diverse (sim 0), not silently
        # droppable — an incomplete/one-directional psim otherwise
        # shrinks the result set without error
        scored = (
            rem.join(ms, [qk, ik], "left")
            .withColumn("__ms", F.coalesce("__ms", F.lit(0.0)))
            .withColumn(
                "__mmr",
                F.lit(float(lam)) * F.col("qs")
                - F.lit(float(1.0 - lam)) * F.col("__ms"),
            )
        )
        w = Window.partitionBy(qk).orderBy(F.desc("__mmr"), F.asc(ik))
        pick = (
            scored.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select(
                qk,
                ik,
                F.lit(r).alias("sel_rank"),
                F.col("__mmr").alias("__mscore"),
            )
        )
        selected = selected.unionByName(pick).localCheckpoint()
    out = selected.withColumn(
        "mmr_score", F.round(F.col("__mscore"), 6)
    ).drop("__mscore")
    cand.unpersist()
    psim.unpersist()
    return out


def _mmr_rerank_local(
    cand: DataFrame,
    psim: DataFrame,
    k: int,
    lam: float,
    qk: str,
    ik: str,
) -> DataFrame:
    """The cogrouped strategy: whole greedy loop per query in one task.

    Exact-parity notes: same double arithmetic as the dataflow form
    (``lam*qs - (1-lam)*max_sim``), same tie-breaks (desc objective,
    asc id), a candidate with NO pairwise row against any selected item
    scores max_sim 0 (maximally diverse, mirroring the LEFT-join
    coalesce), and rounding happens in the SPARK layer (``F.round``,
    HALF_UP) — Python's banker's ``round`` would diverge on .xxxxx5
    ticks."""
    from pyspark.sql import types as T

    lam_f = float(lam)
    one_m = float(1.0 - lam)
    out_schema = T.StructType(
        [
            cand.schema[qk],
            cand.schema[ik],
            T.StructField("sel_rank", T.IntegerType()),
            T.StructField("__mscore", T.DoubleType()),
        ]
    )

    def _greedy(key, cpdf, ppdf):
        import pandas as pd

        cols = [qk, ik, "sel_rank", "__mscore"]
        if k <= 0 or not len(cpdf):
            return pd.DataFrame(columns=cols)
        qs = dict(zip(cpdf[ik], cpdf["qs"]))
        sims: dict = {}
        if len(ppdf):
            for a, b, s in zip(ppdf["a"], ppdf["b"], ppdf["sim"]):
                sims[(a, b)] = s
        seed = min(qs, key=lambda i: (-qs[i], i))
        sel = [(seed, float(qs[seed]))]
        remaining = sorted(i for i in qs if i != seed)
        while len(sel) < k and remaining:
            best_id = None
            best_m = None
            for i in remaining:
                have = [sims[(i, s)] for s, _ in sel if (i, s) in sims]
                ms = max(have) if have else 0.0
                m = lam_f * float(qs[i]) - one_m * float(ms)
                if best_m is None or m > best_m:
                    best_id, best_m = i, m  # remaining is asc-sorted: first
                    # strictly-greater wins, equal keeps the lower id
            sel.append((best_id, best_m))
            remaining.remove(best_id)
        qval = key[0]
        return pd.DataFrame(
            [(qval, i, r + 1, sc) for r, (i, sc) in enumerate(sel)],
            columns=cols,
        )

    # cand and psim usually derive from the SAME candidate frame; rename
    # the right side's key so the cogroup key resolution never sees two
    # lineage-identical attributes (ambiguous-self-join guard)
    right = psim.select(
        F.col(qk).alias("__pqk"), "a", "b", "sim"
    )
    out = (
        cand.select(qk, ik, "qs")
        .groupBy(qk)
        .cogroup(right.groupBy("__pqk"))
        .applyInPandas(_greedy, out_schema)
    )
    return out.withColumn(
        "mmr_score", F.round(F.col("__mscore"), 6)
    ).drop("__mscore")
