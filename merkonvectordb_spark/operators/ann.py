"""Approximate nearest-neighbor search via deterministic random-hyperplane
LSH (sign-random-projection), plus embedding-cosine near-dup pairing.

The index is a materialized DataFrame ``(id, table_id, bucket)`` — no
custom Catalyst strategy (SURVEY §4.2): a query probes its own buckets
with an equi-join, then exact cosine re-ranks the candidates.  Every
stage is a hash-join on (table_id, bucket) or id — never an all-pairs
scan — which is what carries a 100 TB corpus: per-table bucket counts
scale with 2^n_bits, so candidate sets stay |corpus| / 2^n_bits per
table regardless of total size.

Hyperplanes are fixed constants (seeded Gaussian, rounded to 6dp) so the
whole pipeline is deterministic and the DuckDB oracle (queries_ann) can
replay it bit-for-bit: bucket ids depend only on the sign of
left-to-right double dot products, which both engines compute
identically.

Recall economics (honest numbers): on ISOTROPIC random vectors (the
synthetic fixture — the theoretical worst case for LSH, nearest
neighbors sit at ~68°) recall@3 with 8 tables × 6 bits is ~0.4 while
scanning ~10% of the corpus.  On clustered embeddings (every real
text/image corpus; near-neighbors within a few degrees) the same
parameters give recall ≈ 1.0 — ``tests/test_ann.py`` demonstrates both
regimes.  Exact ``operators.search.knn_batch`` remains the fallback when
recall must be 1.0.
"""

from __future__ import annotations

import random
from collections.abc import Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from merkonvectordb_spark.functions.vector import (
    cosine_similarity,
    dot_product,
)

DIM = 64  # fixture embedding dimensionality
N_TABLES = 8
N_BITS = 6
_SEED = 7


def random_hyperplanes(
    dim: int = DIM,
    n_tables: int = N_TABLES,
    n_bits: int = N_BITS,
    seed: int = _SEED,
) -> list[list[list[float]]]:
    """``planes[table][bit]`` = dim-long Gaussian direction, rounded to 6dp
    (short SQL literals; rounding a direction vector doesn't bias signs)."""
    rng = random.Random(seed)
    return [
        [[round(rng.gauss(0.0, 1.0), 6) for _ in range(dim)] for _ in range(n_bits)]
        for _ in range(n_tables)
    ]


HYPERPLANES = random_hyperplanes()

# near-dup pairing wants FINER buckets than top-k search: candidates must
# be near-identical (θ a few degrees), so 12 bits/table still catches them
# (P(pair misses all 8 tables) ~ 1e-6 at cos ≥ 0.999) while bucket
# population — and with it the Σ|bucket|² pair count — drops 64×.
DEDUP_N_BITS = 12
DEDUP_PLANES = random_hyperplanes(n_bits=DEDUP_N_BITS, seed=13)


def bucket_array(emb: Column, planes: list[list[list[float]]]) -> Column:
    """Per-table LSH bucket ids: bit h of table t is ``sign(emb · plane)``;
    bucket = Σ bit·2^h.

    The planes ship as ONE nested array literal with the per-bit dot
    products computed by nested higher-order functions — not as
    tables×bits separate expression subtrees, whose thousands of literal
    nodes blow codegen method sizes (measured several-× slower at
    sf0.1)."""
    n_bits = len(planes[0])
    pows = F.lit([1 << h for h in range(n_bits)])
    tables = F.lit(planes)  # array<array<array<double>>> — one literal node
    return F.transform(
        tables,
        lambda table: F.aggregate(
            F.zip_with(
                table,
                pows,
                lambda plane, pw: F.when(
                    dot_product(emb, plane) >= 0.0, pw
                ).otherwise(F.lit(0)),
            ),
            F.lit(0),
            lambda acc, v: acc + v,
        ),
    )


def bucket_array_pandas(planes: list[list[list[float]]]):
    """Arrow-vectorized bucket computation: one ``(batch × dim) @
    (dim × tables·bits)`` numpy matmul per Arrow batch, then sign →
    bit-pack.  This is the designed fast path: higher-order-function
    expressions are CodegenFallback (interpreted per element), so the
    expression form pays boxed per-element evaluation PLUS a
    3000-literal plan — measured ~10 s for 2k rows vs milliseconds here.

    Parity note: numpy's dot uses SIMD/pairwise summation while the
    expression path (and the DuckDB oracle) folds left-to-right; a sign
    can only differ when a dot product sits within float error of zero
    (probability ~1e-7 per corpus; the oracle run pins it for the
    fixtures).  ``bucket_array`` remains the fold-exact reference.
    """
    import numpy as np

    P = np.asarray(planes, dtype=np.float64)  # (tables, bits, dim)
    n_tables, n_bits, _ = P.shape
    M = P.reshape(n_tables * n_bits, -1)
    pows = (1 << np.arange(n_bits)).astype(np.int64)

    @F.pandas_udf("array<int>")
    def _buckets(embs: pd.Series) -> pd.Series:
        if len(embs) == 0:
            return pd.Series([], dtype=object)
        x = np.stack([np.asarray(e, dtype=np.float64) for e in embs])
        signs = (x @ M.T) >= 0.0  # (n, tables·bits)
        buckets = (signs.reshape(len(x), n_tables, n_bits) * pows).sum(axis=2)
        return pd.Series(list(buckets.astype(np.int32)))

    return _buckets


def ann_index(
    df: DataFrame,
    id_col: str,
    emb_col: str = "embedding",
    planes: list[list[list[float]]] | None = None,
    vectorized: bool = True,
) -> DataFrame:
    """Materializable LSH index: ``(id, table_id, bucket)`` — n_tables rows
    per input row.  At scale, write this out partitioned/bucketed by
    (table_id, bucket) so probes are partition-pruned scans."""
    planes = planes or HYPERPLANES
    dim = len(planes[0][0])
    bucket_fn = (
        bucket_array_pandas(planes)(F.col(emb_col))
        if vectorized
        else bucket_array(F.col(emb_col), planes)
    )
    return (
        df.where(F.size(F.col(emb_col)) == dim)
        .select(
            F.col(id_col),
            F.posexplode(bucket_fn).alias("table_id", "bucket"),
        )
    )


def _ann_candidates(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    emb_col: str,
    query_id_col: str,
    planes: list[list[list[float]]],
    extra_cols: Sequence[str],
    probe_hamming1: bool,
) -> DataFrame:
    """Shared LSH candidate generation for the single- and multi-probe
    search paths (ONE definition — a fix to the index build or the
    candidate join can never reach one path and miss the other).
    ``probe_hamming1`` expands each query bucket with its n_bits
    one-bit-flip neighbors (integer XOR)."""
    # bucket computation is CPU-bound: spread it across all cores even when
    # the corpus arrives as 1-2 scan splits (small-file fixture artifact; a
    # many-file 100 TB table parallelizes naturally and skips this shuffle)
    par = corpus.sparkSession.sparkContext.defaultParallelism
    cidx = ann_index(corpus.repartition(par), id_col, emb_col, planes)
    qidx = ann_index(
        queries.select(F.col(query_id_col), F.col(emb_col)),
        query_id_col,
        emb_col,
        planes,
    ).withColumnRenamed(query_id_col, "__qid")
    if probe_hamming1:
        n_bits = len(planes[0])
        probe_arr = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << b))
                for b in range(n_bits)
            ],
        )
        qidx = qidx.select(
            "__qid", "table_id", F.explode(probe_arr).alias("bucket")
        )
    return (
        qidx.join(cidx, ["table_id", "bucket"])
        .select("__qid", id_col)
        .distinct()
        .join(corpus.select(id_col, emb_col, *extra_cols), id_col)
    )


def knn_batch_ann(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    min_score: float = 0.0,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
    planes: list[list[list[float]]] | None = None,
    extra_cols: Sequence[str] = (),
) -> DataFrame:
    """Batch ANN top-k: probe the LSH index with the query set's own
    buckets, union candidates over tables, exact-cosine re-rank.

    Plan: index join on (table_id, bucket) → distinct (query, candidate)
    → candidate join back to corpus embeddings (hash join on id) →
    broadcast query vectors → WindowGroupLimit top-k.  The corpus is
    touched only at its candidate rows — the full-scan cross product of
    ``knn_batch`` never materializes.
    """
    planes = planes or HYPERPLANES
    cand = _ann_candidates(
        corpus, queries, id_col, emb_col, query_id_col, planes,
        extra_cols, probe_hamming1=False,
    )
    return rerank_topk(
        cand, queries, k, min_score, id_col, emb_col, query_id_col
    )


def knn_batch_ann_multiprobe(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    min_score: float = 0.0,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
    planes: list[list[list[float]]] | None = None,
    extra_cols: Sequence[str] = (),
) -> DataFrame:
    """Multi-probe LSH (Lv et al., VLDB 2007): probe each query's exact
    bucket AND every Hamming-distance-1 neighbor (flip one hyperplane
    bit) — near-misses on a single plane are the dominant LSH failure
    mode, so (1+n_bits)× probes buys most of the recall extra tables
    would, WITHOUT growing the index (same ``ann_index``, same storage,
    same bucketed layout).

    Scale shape: identical to ``knn_batch_ann`` (one shared candidate
    builder) except the probe side carries (1+n_bits)·n_tables rows per
    query — still query-set-sized; the candidate set grows to the
    probed buckets' union, and the exact re-rank stays candidate-bound."""
    planes = planes or HYPERPLANES
    cand = _ann_candidates(
        corpus, queries, id_col, emb_col, query_id_col, planes,
        extra_cols, probe_hamming1=True,
    )
    return rerank_topk(
        cand, queries, k, min_score, id_col, emb_col, query_id_col
    )


def embedding_near_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "id",
    emb_col: str = "emb",
    planes: list[list[list[float]]] | None = None,
    max_candidates: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs ``(a, b, score)`` with a < b:
    same-bucket LSH candidates → exact cosine ≥ threshold.  The bucket
    self-join bounds comparisons like the MinHash banding in
    ``operators.dedup`` — Σ|bucket|², never |corpus|².

    Σ|bucket|² is NOT a guarantee against a DENSE cluster: vectors a
    few degrees apart agree on almost every hyperplane, so a tight
    embedding cluster lands in ONE bucket per table and the verify
    stage goes quadratic in the cluster — even when the cluster sits
    just BELOW ``threshold`` and contributes nothing to the output
    (measured round 8 on the planted 25 % mega-cluster fixture: 205 M
    candidate pairs → 2,313 output rows at sf10, candidate slope 1.34).
    ``max_candidates`` is the loud guard for that case: one
    aggregation over bucket sizes (Σ n·(n−1)/2, an upper bound on the
    candidate join — cheap, nothing join-sized materializes) and a
    ``PairExplosionError`` instead of a silent quadratic verify.  The
    bound runs as its OWN aggregation plan — one extra scan of ``df``,
    no persist — so the success path leaves nothing pinned in executor
    storage (ADVICE r8: a persisted index with a lazy result frame has
    no owner to unpersist it).  For corpora WITH dense clusters, route
    through ``semantic_dedup`` with ``max_cluster_size`` (cap-bounded,
    measured slope 0.53) instead of pair semantics."""
    planes = planes or DEDUP_PLANES
    par = df.sparkSession.sparkContext.defaultParallelism
    idx = ann_index(df.repartition(par), id_col, emb_col, planes)
    if max_candidates is not None:
        from merkonvectordb_spark.operators.dedup import PairExplosionError

        bound = (
            ann_index(df, id_col, emb_col, planes)
            .groupBy("table_id", "bucket")
            .agg(F.count(F.lit(1)).alias("__n"))
            .agg(
                F.coalesce(
                    F.sum(F.expr("__n * (__n - 1) div 2")), F.lit(0)
                ).alias("c")
            )
            .first()["c"]
        )
        if int(bound) > max_candidates:
            raise PairExplosionError(
                f"embedding_near_pairs: bucket self-join would verify up "
                f"to {bound} candidate pairs > max_candidates="
                f"{max_candidates}.  A dense embedding cluster collides "
                "into one LSH bucket per table regardless of threshold — "
                "use semantic_dedup(max_cluster_size=...) for dense-"
                "cluster corpora, or raise max_candidates."
            )
    l, r = idx.alias("l"), idx.alias("r")
    pairs = (
        l.join(r, ["table_id", "bucket"])
        .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b")
        )
        .distinct()
    )
    a_e = df.select(F.col(id_col).alias("a"), F.col(emb_col).alias("__ea"))
    b_e = df.select(F.col(id_col).alias("b"), F.col(emb_col).alias("__eb"))
    raw = cosine_similarity(F.col("__ea"), F.col("__eb"))
    return (
        pairs.join(a_e, "a")
        .join(b_e, "b")
        .withColumn("__raw", raw)
        .where(
            F.col("__raw").isNotNull()
            & (~F.isnan("__raw"))
            & (F.col("__raw") >= F.lit(float(threshold)))
        )
        .select("a", "b", F.round(F.col("__raw"), 6).alias("score"))
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the list-probing alternative to hyperplane LSH.
# Coarse quantizer: a FIXED-size deterministic centroid set (k-means would
# refine it; the assignment/probe machinery is identical).  Assignment is
# corpus × K (K fixed, linear in corpus, broadcast + map-side combine —
# no window shuffle); queries probe their n_probe nearest lists.
# ---------------------------------------------------------------------------

IVF_K = 16
IVF_N_PROBE = 4


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str,
    emb_col: str = "embedding",
    n_best: int = 1,
    carry: Sequence[str] = (),
) -> DataFrame:
    """Assign every row to its ``n_best`` highest-cosine centroids
    (ties → lowest centroid id).  ``centroids`` carries (cid, cv).

    n_best=1 (corpus assignment) uses a partial-aggregable max-of-struct
    — the corpus×K scored rows combine map-side, nothing shuffles but
    one struct per row.  n_best>1 (query probing) ranks via a window
    over the (tiny) query set.

    ``carry`` (n_best=1 only) threads extra payload columns of ``df``
    through the aggregate via ``first()`` — deterministic because every
    pre-agg row of an id holds the identical payload (the kmeans_refine
    pattern).  Callers that persist the assignment WITH its payload
    (operators.index) thereby skip the assignment⋈source re-join and
    its second source scan (guide §2.4): shuffle volume is unchanged —
    the payload crossed the join's source-side exchange before."""
    out_carry = [c for c in carry if c != id_col]
    extra = [c for c in out_carry if c != emb_col]
    scored = (
        df.select(F.col(id_col), F.col(emb_col), *[F.col(c) for c in extra])
        .crossJoin(F.broadcast(centroids))
        .withColumn("__cos", cosine_similarity(F.col(emb_col), F.col("cv")))
        .where(F.col("__cos").isNotNull() & (~F.isnan("__cos")))
    )
    if n_best == 1:
        best = (
            scored.groupBy(id_col)
            .agg(
                F.max(
                    F.struct(
                        F.col("__cos").alias("c"),
                        (-F.col("cid")).alias("nc"),
                        F.col("cid").alias("cid"),
                    )
                ).alias("__b"),
                *[F.first(F.col(c)).alias(c) for c in out_carry],
            )
            .select(F.col(id_col), F.col("__b.cid").alias("cid"), *out_carry)
        )
        return best
    if carry:
        raise ValueError("carry is only supported with n_best=1")
    w = Window.partitionBy(id_col).orderBy(F.desc("__cos"), F.asc("cid"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_best)
        .select(F.col(id_col), "cid")
    )


def rerank_topk(
    cand: DataFrame,
    queries: DataFrame,
    k: int,
    min_score: float,
    id_col: str,
    emb_col: str,
    query_id_col: str,
) -> DataFrame:
    """THE exact re-rank tail shared by the in-memory and persisted IVF
    search paths (``knn_batch_ivf`` / ``operators.index.search_ivf_index``
    promise bit-identical semantics — one definition makes that true by
    construction): broadcast query vectors, exact cosine, NaN-safe
    inclusive threshold, bounded per-query top-k, 6dp output rounding.

    ``cand`` carries ``__qid`` plus the candidate rows WITH their
    ``emb_col`` (and any extra columns, which pass through).
    """
    qvecs = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("__qid"), F.col(emb_col).alias("__qvec")
        )
    )
    scored = (
        cand.join(qvecs, "__qid")
        .withColumn("__raw", cosine_similarity(F.col(emb_col), F.col("__qvec")))
        .where(
            F.col("__raw").isNotNull()
            & (~F.isnan("__raw"))
            & (F.col("__raw") >= F.lit(float(min_score)))
        )
    )
    w = Window.partitionBy("__qid").orderBy(F.desc("__raw"), F.asc(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .withColumn("score", F.round(F.col("__raw"), 6))
        .drop("__rn", "__raw", "__qvec", emb_col)
        .withColumnRenamed("__qid", query_id_col)
    )


def knn_batch_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    centroids: DataFrame,
    n_probe: int = IVF_N_PROBE,
    min_score: float = 0.0,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
    extra_cols: Sequence[str] = (),
) -> DataFrame:
    """Batch ANN top-k via IVF: corpus rows live in their best-centroid
    list; each query probes its n_probe nearest lists; candidates
    exact-cosine re-rank.  Scan cost per query ≈ n_probe/K of the
    corpus — the scale dial is (K, n_probe), both fixed constants."""
    par = corpus.sparkSession.sparkContext.defaultParallelism
    assign = ivf_assign(corpus.repartition(par), centroids, id_col, emb_col, 1)
    probes = ivf_assign(
        queries.select(F.col(query_id_col), F.col(emb_col)),
        centroids,
        query_id_col,
        emb_col,
        n_probe,
    ).withColumnRenamed(query_id_col, "__qid")
    cand = (
        probes.join(assign, "cid")
        .select("__qid", id_col)
        .distinct()
        .join(corpus.select(id_col, emb_col, *extra_cols), id_col)
    )
    return rerank_topk(
        cand, queries, k, min_score, id_col, emb_col, query_id_col
    )


def kmeans_refine(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    iterations: int = 2,
    round_dp: int = 6,
) -> DataFrame:
    """Lloyd's k-means as dataflow, refining the IVF coarse quantizer:
    per iteration, assign every vector to its max-cosine centroid
    (partial-agg max-of-struct — no window over the corpus), then the
    new centroid is the element-wise mean of its members.

    Components round to ``round_dp`` after each iteration — this pins
    cross-engine float parity (mean summation order differs between
    engines) and is also the right production choice: quantizer
    centroids don't need 52 mantissa bits.  Empty clusters die (standard
    Lloyd behavior), deterministically.  Each iteration is one
    assign-join + one (cid, pos) aggregation: shuffle volume is
    corpus-linear per iteration, K·dim rows afterwards."""
    # the corpus×K scoring is CPU-bound fold arithmetic: spread it over
    # all cores once up front (small-file scans arrive as 1-2 splits)
    par = corpus.sparkSession.sparkContext.defaultParallelism
    corpus = corpus.select(F.col(id_col), F.col(emb_col)).repartition(par)
    cents = centroids

    # each Lloyd iteration is THREE shuffles: the argmax-assignment
    # carries the member embedding inside the aggregate (max-of-struct +
    # first(emb) — every row in the group holds the same vector, so
    # first() is deterministic), killing the assignment⋈corpus re-join
    # the naive formulation needs; then the element-wise means go
    # posexplode → (cid, pos) partial-agg → collect_list.  (A fused
    # applyInPandas mean was tried and measured SLOWER at bench scale —
    # the Python exchange costs more than the saved JVM shuffle.)
    for _ in range(iterations):
        scored = (
            corpus.crossJoin(F.broadcast(cents))
            .withColumn(
                "__cos", cosine_similarity(F.col(emb_col), F.col("cv"))
            )
            .where(F.col("__cos").isNotNull() & (~F.isnan("__cos")))
        )
        assigned = (
            scored.groupBy(id_col)
            .agg(
                F.max(
                    F.struct(
                        F.col("__cos").alias("c"),
                        (-F.col("cid")).alias("nc"),
                        F.col("cid").alias("cid"),
                    )
                ).alias("__b"),
                F.first(F.col(emb_col)).alias("__e"),
            )
            .select(F.col("__b.cid").alias("cid"), "__e")
        )
        means = (
            assigned.select(
                "cid", F.posexplode(F.col("__e")).alias("pos", "val")
            )
            .groupBy("cid", "pos")
            .agg(
                F.round(F.avg(F.col("val").cast("double")), round_dp).alias("v")
            )
        )
        cents = means.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "v"))),
                lambda x: x["v"],
            ).alias("cv")
        )
    return cents


# ---------------------------------------------------------------------------
# SQ8 scalar quantization: int8 codes + exact re-rank (the storage/IO
# scale path — codes are 8x smaller than the raw DOUBLE vectors)
# ---------------------------------------------------------------------------

SQ8_LEVELS = 255.0
SQ8_REFINE = 4  # approx pass keeps k*refine candidates per query


def sq8_stats(
    corpus: DataFrame, emb_col: str = "embedding"
) -> tuple[list[float], list[float]]:
    """Per-dimension (min, max) over the corpus — the SQ8 codebook.

    One distributed pass (posexplode → partial min/max agg, d rows out);
    the d-row result is collected as index METADATA, the same class of
    driver-side artifact as IVF centroids — not data through the driver.
    At 100 TB this is the one-time index-build scan (or an incremental
    merge of per-partition min/max, since min/max are mergeable).
    """
    emb_d = F.transform(F.col(emb_col), lambda x: x.cast("double"))
    rows = (
        corpus.select(F.posexplode(emb_d).alias("pos", "v"))
        .groupBy("pos")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    )
    by = {r["pos"]: r for r in rows}
    mn = [float(by[i]["mn"]) for i in range(len(by))]
    mx = [float(by[i]["mx"]) for i in range(len(by))]
    return mn, mx


def sq8_codes(emb: Column, mn: list[float], mx: list[float]) -> Column:
    """Quantize to [0, 255] codes: floor((x - mn) * 255 / (mx - mn)),
    clamped; constant dimensions (mx == mn) map to code 0.  Kept in
    DOUBLE here for expression-level parity with the oracle — a
    materialized codes column would CAST to TINYINT at write time."""
    mn_l = F.lit([float(v) for v in mn])
    rng_l = F.lit([float(b) - float(a) for a, b in zip(mn, mx)])
    diffs = F.zip_with(emb, mn_l, lambda x, m: x.cast("double") - m)
    return F.zip_with(
        diffs,
        rng_l,
        lambda d, r: F.when(
            r > 0.0,
            F.least(
                F.lit(SQ8_LEVELS),
                F.greatest(
                    F.lit(0.0),
                    F.floor(d * F.lit(SQ8_LEVELS) / r).cast("double"),
                ),
            ),
        ).otherwise(F.lit(0.0)),
    )


def sq8_dequant(codes: Column, mn: list[float], mx: list[float]) -> Column:
    """Midpoint dequantization: mn + (code + 0.5) * (mx - mn) / 255."""
    mn_l = F.lit([float(v) for v in mn])
    rng_l = F.lit([float(b) - float(a) for a, b in zip(mn, mx)])
    scaled = F.zip_with(
        codes, rng_l, lambda c, r: ((c + F.lit(0.5)) * r) / F.lit(SQ8_LEVELS)
    )
    return F.zip_with(scaled, mn_l, lambda s, m: m + s)


def knn_batch_sq8(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    refine: int = SQ8_REFINE,
    min_score: float = 0.0,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
    extra_cols: Sequence[str] = (),
) -> DataFrame:
    """Batch top-k via SQ8 rescoring: the approx pass scores DEQUANTIZED
    corpus vectors (in production: a materialized int8 codes column, 8x
    fewer bytes scanned than raw DOUBLE) against the raw query, keeps
    k*refine candidates per query, then exact-cosine re-ranks only those.

    Unlike the LSH/IVF paths this still touches every corpus row — its
    scale lever is BYTES (scan 1/8th the data, burn cheap arithmetic),
    the FAISS SQ8-flat trade.  Compose with IVF list-pruning when both
    levers are needed.  Whole pipeline is deterministic IEEE-double
    arithmetic, so the DuckDB oracle replays it bit-for-bit.
    """
    mn, mx = sq8_stats(corpus, emb_col)
    par = corpus.sparkSession.sparkContext.defaultParallelism
    dq = corpus.repartition(par).select(
        id_col,
        emb_col,
        *extra_cols,
        sq8_dequant(
            sq8_codes(F.col(emb_col), mn, mx), mn, mx
        ).alias("__dq"),
    )
    qvecs = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("__qid"),
            F.transform(
                F.col(emb_col), lambda x: x.cast("double")
            ).alias("__qvec"),
        )
    )
    approx = (
        dq.join(qvecs)
        .withColumn("__araw", cosine_similarity(F.col("__dq"), F.col("__qvec")))
        .where(F.col("__araw").isNotNull() & (~F.isnan("__araw")))
    )
    aw = Window.partitionBy("__qid").orderBy(F.desc("__araw"), F.asc(id_col))
    cand = (
        approx.withColumn("__arn", F.row_number().over(aw))
        .where(F.col("__arn") <= k * refine)
        .drop("__arn", "__araw", "__dq")
    )
    rescored = cand.withColumn(
        "__raw", cosine_similarity(F.col(emb_col), F.col("__qvec"))
    ).where(
        F.col("__raw").isNotNull()
        & (~F.isnan("__raw"))
        & (F.col("__raw") >= F.lit(float(min_score)))
    )
    w = Window.partitionBy("__qid").orderBy(F.desc("__raw"), F.asc(id_col))
    return (
        rescored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .withColumn("score", F.round(F.col("__raw"), 6))
        .drop("__rn", "__raw", "__qvec", emb_col)
        .withColumnRenamed("__qid", query_id_col)
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    m: int,
    lo: float,
    hi: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
    planes: list[list[list[float]]] | None = None,
    extra_cols: Sequence[str] = (),
) -> DataFrame:
    """Contrastive-training hard-negative mining: for each query
    (anchor), the top-m corpus rows that share an LSH bucket — so they
    LOOK similar to the retrieval index — but whose exact cosine lands
    in [lo, hi): similar enough to be hard, below the near-duplicate
    line.  The self-match (score ≈ 1) and anything above ``hi`` is
    excluded; random easy negatives never enter the candidate set at
    all, which is the point.

    Same bucketed plan as ``knn_batch_ann`` — candidates, not the
    corpus, flow through exact scoring — so mining scales with bucket
    occupancy, not corpus size.
    """
    planes = planes or HYPERPLANES
    par = corpus.sparkSession.sparkContext.defaultParallelism
    cidx = ann_index(corpus.repartition(par), id_col, emb_col, planes)
    qidx = ann_index(
        queries.select(F.col(query_id_col), F.col(emb_col)),
        query_id_col,
        emb_col,
        planes,
    ).withColumnRenamed(query_id_col, "__qid")
    cand = (
        qidx.join(cidx, ["table_id", "bucket"])
        .select("__qid", id_col)
        .distinct()
    )
    qvecs = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("__qid"), F.col(emb_col).alias("__qvec")
        )
    )
    scored = (
        cand.join(corpus.select(id_col, emb_col, *extra_cols), id_col)
        .join(qvecs, "__qid")
        .withColumn("__raw", cosine_similarity(F.col(emb_col), F.col("__qvec")))
        .where(
            F.col("__raw").isNotNull()
            & (~F.isnan("__raw"))
            & (F.col("__raw") >= F.lit(float(lo)))
            & (F.col("__raw") < F.lit(float(hi)))
        )
    )
    w = Window.partitionBy("__qid").orderBy(F.desc("__raw"), F.asc(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= m)
        .withColumn("score", F.round(F.col("__raw"), 6))
        .drop("__rn", "__raw", "__qvec", emb_col)
        .withColumnRenamed("__qid", query_id_col)
    )


SEMDEDUP_MAX_SUBCENTROIDS = 64  # literal cap keeps seed scoring O(64·|c|)


def _split_oversized_clusters(
    assigned: DataFrame, id_col: str, cap: int
) -> DataFrame:
    """Skew guard for ``semantic_dedup``'s pairwise stage: re-bucket any
    cluster larger than ``cap`` so no self-join partition goes quadratic.

    Input ``assigned`` carries (id, cid, __csim, __e, __eu — unit
    vectors).  Output adds ``__sub`` (sub-centroid id) and ``__hsp``
    (residual hash split), both 0 for clusters within the cap.

    Mechanics, all deterministic dataflow:
      1. per-cluster counts → the |oversized-clusters|-row frame
         broadcasts (index-metadata-sized);
      2. each oversized cluster takes ``min(ceil(n/cap), 64)``
         sub-centroids — its lowest-id members (the IVF seeding scheme);
         the seed pick is a per-cluster window with a LITERAL rank bound
         so Spark plans a partial WindowGroupLimit, not a full sort of
         the mega-cluster;
      3. members score against ONLY their own cluster's seeds (hash
         join on cid — never a corpus × seeds cross) and take the
         argmax dot (unit vectors: dot ≡ cosine) via the same
         partial-agg max-of-struct as the coarse assignment; exact dot
         TIES break by a per-(member, seed) hash, so a cluster of
         byte-identical embeddings spreads uniformly across its seeds
         instead of collapsing into one sub-bucket;
      4. clusters beyond 64·cap get a residual deterministic
         ``xxhash64 % ceil(n/(64·cap))`` split so the bound holds for
         ANY skew, not just 64×.
    """
    sizes = assigned.groupBy("cid").agg(F.count(F.lit(1)).alias("__n"))
    over = sizes.where(F.col("__n") > cap).select(
        "cid",
        F.least(
            F.ceil(F.col("__n") / cap),
            F.lit(SEMDEDUP_MAX_SUBCENTROIDS),
        )
        .cast("int")
        .alias("__ncent"),
        F.greatest(
            F.ceil(
                F.col("__n") / (cap * SEMDEDUP_MAX_SUBCENTROIDS)
            ),
            F.lit(1),
        )
        .cast("bigint")
        .alias("__hfan"),
    )
    over_members = assigned.join(F.broadcast(over), "cid")
    wseed = Window.partitionBy("cid").orderBy(id_col)
    seeds = (
        over_members.withColumn("__rk", F.row_number().over(wseed))
        # literal bound first: enables the partial WindowGroupLimit
        # rewrite (each map task forwards ≤64 rows per cid)
        .where(
            (F.col("__rk") <= SEMDEDUP_MAX_SUBCENTROIDS)
            & (F.col("__rk") <= F.col("__ncent"))
        )
        .select(
            F.col("cid").alias("__scid"),
            F.col("__rk").alias("__seed_idx"),
            F.col("__eu").alias("__sv"),
        )
    )
    sub_assigned = (
        over_members.join(
            seeds, over_members["cid"] == seeds["__scid"]
        )
        .withColumn(
            "__sc", dot_product(F.col("__eu"), F.col("__sv"))
        )
        .groupBy(id_col)
        .agg(
            F.max(
                F.struct(
                    F.col("__sc").alias("c"),
                    # tie-break by a per-(member, seed) hash, NOT by
                    # seed index: a cluster of byte-identical embeddings
                    # (the common boilerplate-dup pattern) ties on EVERY
                    # seed dot, and an index tie-break would send the
                    # whole cluster to one sub-bucket — the exact
                    # quadratic blowup this guard exists to prevent.
                    # The hash spreads exact ties uniformly over the
                    # ceil(n/cap) seeds; non-tied rows are unaffected.
                    F.xxhash64(F.col(id_col), F.col("__seed_idx")).alias(
                        "hj"
                    ),
                    F.col("__seed_idx").alias("idx"),
                )
            ).alias("__bb"),
            F.first("__hfan").alias("__hf"),
        )
        .select(
            F.col(id_col),
            F.col("__bb.idx").alias("__sub_over"),
            F.col("__hf"),
        )
    )
    return (
        assigned.join(sub_assigned, id_col, "left")
        .withColumn(
            "__sub", F.coalesce(F.col("__sub_over"), F.lit(0))
        )
        .withColumn(
            "__hsp",
            F.when(
                F.col("__hf").isNull() | (F.col("__hf") <= 1), F.lit(0)
            ).otherwise(
                F.pmod(F.xxhash64(F.col(id_col)), F.col("__hf"))
            ),
        )
        .drop("__sub_over", "__hf")
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: DataFrame,
    tau: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_cluster_size: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the embedding space, then
    drop semantic duplicates WITHIN each cluster — pairs whose cosine
    exceeds ``tau`` — keeping, per the paper, the member with the LOWEST
    similarity to its own centroid (the "edge" example carries the most
    marginal information; the near-centroid copies are redundant).

    Returns every assignable corpus row with its cluster id, centroid
    similarity (6dp, output-only rounding), and a ``kept`` flag.  The
    removal rule is per-pair and deterministic: ``x`` is dropped iff
    some same-cluster ``y`` has ``cos(x, y) > tau`` and a strictly
    better keep-priority (lower raw centroid-sim, then lower id) — no
    union-find, no iteration, identical in any engine.

    Scale shape: this is the published algorithm's cost model — the
    pairwise stage runs per cluster, so work is Σ|cluster|², bounded by
    (N/K)·N when K grows with the corpus; never an all-pairs N².  The
    assignment reuses the partial-agg argmax (no window over the
    corpus); both sides of the pair join arrive hash-partitioned on
    ``cid`` — one exchange feeds the self-join.

    ``max_cluster_size`` is the SKEW GUARD (VERDICT r5 #6): K ∝ N bounds
    the *average* cluster, but one degenerate hot cluster (boilerplate,
    empty-ish embeddings) still goes quadratic.  When set, clusters over
    the cap are re-clustered before the pairwise stage: up to
    ``SEMDEDUP_MAX_SUBCENTROIDS`` deterministic sub-centroids (lowest-id
    members, the IVF seeding scheme) keep genuinely diverse content
    grouped with its near-duplicates, and a residual deterministic hash
    split covers clusters beyond 64× the cap — so per-bucket size is
    ~cap and pair work is Σ|c|·cap instead of Σ|c|².  Cost of the guard
    itself: one |oversized|-row broadcast, ≤64 dot folds per overflow
    member, zero extra work for clusters under the cap.  Trade-off: a
    duplicate pair split across buckets is missed — in a degenerate
    near-identical mega-cluster that leaves ~one extra survivor per
    bucket (the bucket-best), a vanishing fraction of the removals.
    Default ``None`` preserves exact published semantics (and the
    registered oracle's replay).
    """
    from merkonvectordb_spark.operators.skew import spread_small_scan

    # corpus×K scoring is CPU-bound interpreted fold arithmetic; a
    # narrow scan (small file = 1-2 splits) would run it serially
    # (measured round 10: 4.0 s on 2 tasks = 40 % of the query wall).
    # spread_small_scan is a no-op once the scan arrives wider than the
    # core count, so nothing changes at cluster scale.
    scored = (
        spread_small_scan(corpus.select(F.col(id_col), F.col(emb_col)))
        .crossJoin(F.broadcast(centroids))
        .withColumn("__cos", cosine_similarity(F.col(emb_col), F.col("cv")))
        .where(F.col("__cos").isNotNull() & (~F.isnan("__cos")))
    )
    assigned = (
        scored.groupBy(id_col)
        .agg(
            F.max(
                F.struct(
                    F.col("__cos").alias("c"),
                    (-F.col("cid")).alias("nc"),
                    F.col("cid").alias("cid"),
                )
            ).alias("__b"),
            F.first(F.col(emb_col)).alias("__e"),
        )
        .select(
            F.col(id_col),
            F.col("__b.cid").alias("cid"),
            F.col("__b.c").alias("__csim"),
            "__e",
        )
    )
    # three consumers (both sides of the pair self-join + the final
    # left join) — without persist each re-runs the corpus×K scoring.
    # persist, not checkpoint: the consumers live inside ONE returned
    # lazy plan, and only persist gives intra-job subtree sharing; the
    # blocks free via GC after the caller drops the returned frame.
    # The pair stage is the dominant Σ|cluster|² term, so embeddings are
    # unit-normalized ONCE here (3 folds per ROW) and each pair scores
    # with a single dot fold instead of cosine's three — the
    # pre-normalized-corpus trick from operators.search.  Zero-norm rows
    # can't reach this point (their centroid score is NULL-filtered).
    from merkonvectordb_spark.functions.vector import dot_product, l2_normalize

    assigned = assigned.withColumn(
        "__eu", l2_normalize(F.col("__e"))
    ).persist()
    if max_cluster_size is not None:
        assigned = _split_oversized_clusters(
            assigned, id_col, int(max_cluster_size)
        ).persist()
        pair_keys = ("cid", "__sub", "__hsp")
    else:
        pair_keys = ("cid",)
    x = assigned.alias("x")
    y = assigned.alias("y")
    xid, yid = F.col(f"x.{id_col}"), F.col(f"y.{id_col}")
    beaten = (F.col("y.__csim") < F.col("x.__csim")) | (
        (F.col("y.__csim") == F.col("x.__csim")) & (yid < xid)
    )
    same_bucket = (xid != yid)
    for kcol in pair_keys:
        same_bucket = same_bucket & (
            F.col(f"x.{kcol}") == F.col(f"y.{kcol}")
        )
    removed = (
        x.join(y, same_bucket)
        .where(
            (dot_product(F.col("x.__eu"), F.col("y.__eu")) > F.lit(float(tau)))
            & beaten
        )
        .select(xid.alias(id_col))
        .distinct()
        .withColumn("__rm", F.lit(True))
    )
    return (
        assigned.join(removed, id_col, "left")
        .select(
            F.col(id_col),
            "cid",
            F.round(F.col("__csim"), 6).alias("cent_sim"),
            (~F.coalesce(F.col("__rm"), F.lit(False))).alias("kept"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) with asymmetric-distance search (ADC)
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces (DIM/PQ_M dims each)
PQ_K = 16  # centroids per subspace → codes are 4-bit, vectors 8 bytes
PQ_REFINE = 4  # exact re-rank width multiplier


def pq_codebook(
    corpus: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    m: int = PQ_M,
    ksub: int = PQ_K,
    dim: int = DIM,
) -> list[list[list[float]]]:
    """``[m][j][dsub]`` codebook from the ``ksub`` lowest-id vectors'
    subvectors (deterministic seeding, the same scheme as the IVF coarse
    quantizer; compose with ``kmeans_refine`` per subspace when trained
    centroids are wanted — the search below is codebook-agnostic).

    Driver-side artifact class: index METADATA (m·ksub·dsub doubles =
    1 KB here), like IVF centroids and SQ8 stats — not data through the
    driver.  The seed pick is a ``TakeOrderedAndProject`` heap."""
    rows = (
        corpus.where(F.size(F.col(emb_col)) == dim)
        .orderBy(F.col(id_col).asc())
        .limit(ksub)
        .select(emb_col)
        .collect()
    )
    if not rows:
        raise ValueError(f"no {dim}-dim rows to seed the codebook from")
    dsub = dim // m
    return [
        [
            [float(rows[j][0][mm * dsub + t]) for t in range(dsub)]
            for j in range(len(rows))
        ]
        for mm in range(m)
    ]


def _sql_arr(vals: list[float]) -> str:
    return "array(" + ",".join(f"{float(v)!r}D" for v in vals) + ")"


def pq_codes(emb_col: str, cb: list[list[list[float]]]) -> Column:
    """Per-subspace nearest-centroid codes (1-based, ARRAY<BIGINT>).

    argmin = first index attaining the minimal squared L2 distance
    (``array_position`` of ``array_min`` — ties resolve to the lowest
    j, mirrored by the oracle's (dist, j) row_number).  The fold
    ``acc + z·z`` over the subvector difference is the same sequential
    double chain the cosine parity rests on.

    The whole expression is built as ONE parsed SQL string: the
    Column-API construction (128 ``lit``/``zip_with``/``aggregate``
    arms) costs ~7 s of py4j round-trips at plan-build time; the parser
    ingests the same tree in milliseconds.  Per-m distance arrays bind
    once through a lambda variable (single-element transform wrap)."""
    dsub = len(cb[0][0])
    e = f"`{emb_col}`"
    arms = []
    for mm, cm in enumerate(cb):
        off = mm * dsub + 1
        dists = ",".join(
            f"aggregate(zip_with(slice({e}, {off}, {dsub}), {_sql_arr(cj)},"
            " (x, y) -> CAST(x AS DOUBLE) - y),"
            " CAST(0.0 AS DOUBLE), (acc, z) -> acc + z * z)"
            for cj in cm
        )
        arms.append(
            f"element_at(transform(array(array({dists})),"
            " da -> array_position(da, array_min(da))), 1)"
        )
    return F.expr("array(" + ",".join(arms) + ")")


def pq_query_tables(emb_col: str, cb: list[list[list[float]]]) -> Column:
    """ADC lookup tables for one query: ``tab[m][j] = <q_m, c_mj>``
    (ARRAY<ARRAY<DOUBLE>>, m·ksub entries — computed once per query
    row, broadcast with it).  Parsed-SQL construction for the same
    plan-build-cost reason as ``pq_codes``."""
    dsub = len(cb[0][0])
    e = f"`{emb_col}`"
    tabs = []
    for mm, cm in enumerate(cb):
        off = mm * dsub + 1
        dots = ",".join(
            f"aggregate(zip_with(slice({e}, {off}, {dsub}), {_sql_arr(cj)},"
            " (x, y) -> CAST(x AS DOUBLE) * y),"
            " CAST(0.0 AS DOUBLE), (acc, z) -> acc + z)"
            for cj in cm
        )
        tabs.append(f"array({dots})")
    return F.expr("array(" + ",".join(tabs) + ")")


def knn_batch_pq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    cb: list[list[list[float]]] | None = None,
    refine: int = PQ_REFINE,
    min_score: float = 0.0,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
    extra_cols: Sequence[str] = (),
) -> DataFrame:
    """Batch top-k via PQ/ADC (Jégou et al. 2011): corpus vectors encode
    to M codes; each query's approximate inner product is M table
    lookups summed in subspace order (deterministic fold); the top
    k·refine per query exact-cosine re-rank.

    Scale levers: a materialized codes column is M bytes per vector
    (64× fewer than raw DOUBLE dims here) and the approx pass does M
    lookups instead of DIM multiplies — the byte-AND-flop compression
    point in the FAISS family, between SQ8 (bytes only) and IVF (rows
    only); compose with IVF list-pruning for both.  Like SQ8 it still
    touches every row — honesty about the scan is the point of this
    variant."""
    if cb is None:
        cb = pq_codebook(corpus, id_col, emb_col)
    m = len(cb)
    dim = m * len(cb[0][0])  # the codebook implies the dimensionality
    par = corpus.sparkSession.sparkContext.defaultParallelism
    coded = (
        corpus.where(F.size(F.col(emb_col)) == dim)
        .repartition(par)
        .select(
            id_col,
            emb_col,
            *extra_cols,
            pq_codes(emb_col, cb).alias("__codes"),
        )
    )
    qtabs = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("__qid"),
            F.transform(F.col(emb_col), lambda x: x.cast("double")).alias(
                "__qvec"
            ),
            pq_query_tables(emb_col, cb).alias("__qtab"),
        )
    )
    approx = coded.join(qtabs).withColumn(
        "__araw",
        F.aggregate(
            F.sequence(F.lit(0), F.lit(m - 1)),
            F.lit(0.0),
            lambda acc, mm: acc
            + F.element_at(
                F.element_at(F.col("__qtab"), (mm + 1).cast("int")),
                F.element_at(F.col("__codes"), (mm + 1).cast("int")).cast(
                    "int"
                ),
            ),
        ),
    )
    aw = Window.partitionBy("__qid").orderBy(F.desc("__araw"), F.asc(id_col))
    cand = (
        approx.withColumn("__arn", F.row_number().over(aw))
        .where(F.col("__arn") <= k * refine)
        .drop("__arn", "__araw", "__codes", "__qtab")
    )
    rescored = cand.withColumn(
        "__raw", cosine_similarity(F.col(emb_col), F.col("__qvec"))
    ).where(
        F.col("__raw").isNotNull()
        & (~F.isnan("__raw"))
        & (F.col("__raw") >= F.lit(float(min_score)))
    )
    w = Window.partitionBy("__qid").orderBy(F.desc("__raw"), F.asc(id_col))
    return (
        rescored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .withColumn("score", F.round(F.col("__raw"), 6))
        .drop("__rn", "__raw", "__qvec", emb_col)
        .withColumnRenamed("__qid", query_id_col)
    )


def knn_batch_ivfpq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    centroids: DataFrame,
    cb: list[list[list[float]]] | None = None,
    n_probe: int = IVF_N_PROBE,
    refine: int = PQ_REFINE,
    min_score: float = 0.0,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
    extra_cols: Sequence[str] = (),
) -> DataFrame:
    """IVF-PQ: BOTH scale levers composed — IVF list pruning cuts the
    ROWS touched to ~n_probe/K of the corpus, PQ/ADC cuts the BYTES and
    FLOPs per touched row to M lookups; the survivors exact-cosine
    re-rank.  This is the FAISS ``IVFx,PQy`` index as a dataflow: at
    100 TB the coded+assigned corpus is the materialized index
    (M bytes + a list id per vector), and a query reads only its probed
    lists' codes.
    """
    if cb is None:
        cb = pq_codebook(corpus, id_col, emb_col)
    m = len(cb)
    par = corpus.sparkSession.sparkContext.defaultParallelism
    corpus = corpus.repartition(par)
    # a REAL dimension guard (matching knn_batch_pq): wrong-dim rows
    # must not reach the parsed-SQL code evaluation — they'd only drop
    # implicitly later, after paying full PQ encoding
    dim = m * len(cb[0][0])
    corpus = corpus.where(F.size(F.col(emb_col)) == dim)
    assign = ivf_assign(corpus, centroids, id_col, emb_col, 1)
    coded = corpus.select(
        id_col,
        emb_col,
        *extra_cols,
        pq_codes(emb_col, cb).alias("__codes"),
    ).join(assign, id_col)
    probes = ivf_assign(
        queries.select(F.col(query_id_col), F.col(emb_col)),
        centroids,
        query_id_col,
        emb_col,
        n_probe,
    ).withColumnRenamed(query_id_col, "__qid")
    qmeta = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("__qid"),
            F.transform(F.col(emb_col), lambda x: x.cast("double")).alias(
                "__qvec"
            ),
            pq_query_tables(emb_col, cb).alias("__qtab"),
        )
    )
    cand = probes.join(coded, "cid").join(qmeta, "__qid")
    approx = cand.withColumn(
        "__araw",
        F.aggregate(
            F.sequence(F.lit(0), F.lit(m - 1)),
            F.lit(0.0),
            lambda acc, mm: acc
            + F.element_at(
                F.element_at(F.col("__qtab"), (mm + 1).cast("int")),
                F.element_at(F.col("__codes"), (mm + 1).cast("int")).cast(
                    "int"
                ),
            ),
        ),
    )
    aw = Window.partitionBy("__qid").orderBy(F.desc("__araw"), F.asc(id_col))
    pool = (
        approx.withColumn("__arn", F.row_number().over(aw))
        .where(F.col("__arn") <= k * refine)
        .drop("__arn", "__araw", "__codes", "__qtab", "cid")
    )
    rescored = pool.withColumn(
        "__raw", cosine_similarity(F.col(emb_col), F.col("__qvec"))
    ).where(
        F.col("__raw").isNotNull()
        & (~F.isnan("__raw"))
        & (F.col("__raw") >= F.lit(float(min_score)))
    )
    w = Window.partitionBy("__qid").orderBy(F.desc("__raw"), F.asc(id_col))
    return (
        rescored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .withColumn("score", F.round(F.col("__raw"), 6))
        .drop("__rn", "__raw", "__qvec", emb_col)
        .withColumnRenamed("__qid", query_id_col)
    )
