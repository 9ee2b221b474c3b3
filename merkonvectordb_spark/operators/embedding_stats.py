"""Embedding-space diagnostics: per-group centroids and outlier mining.

Training-data curation over an embedded corpus routinely asks two
questions the relational surface can answer without any index:

* what does each class/label/source look like on average? — the
  per-group centroid (element-wise mean vector), the building block of
  class prototypes, drift monitoring, and duplicate-cluster summaries;
* which examples sit FURTHEST from their own group's centroid? — the
  classic mislabeled/noisy-example screen (a "cat" embedding far from
  the cat centroid is a label to audit).

Plan shapes (both 100 TB-safe):

* centroid: posexplode → (group, pos) partial-agg mean → collect the
  dim-length array per group.  Shuffle volume is |corpus|·dim value
  rows with map-side combine; the result is groups × dim — tiny.
  Components round to a fixed dp (same argument as
  ``operators.ann.kmeans_refine``: cross-engine mean-order parity, and
  prototypes don't need 52 mantissa bits).
* outliers: broadcast the (tiny) centroid table back, score each row's
  cosine against its OWN group centroid scan-locally, bottom-k per
  group via a per-group window (WindowGroupLimit — ≤ groups·k rows
  shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from merkonvectordb_spark.functions.vector import cosine_similarity


def grouped_centroids(
    df: DataFrame,
    group_col: str,
    emb_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """``(group_col, centroid)`` — element-wise mean vector per group."""
    means = (
        df.select(
            F.col(group_col),
            F.posexplode(F.col(emb_col)).alias("pos", "val"),
        )
        .groupBy(group_col, "pos")
        .agg(F.round(F.avg(F.col("val").cast("double")), round_dp).alias("v"))
    )
    return means.groupBy(group_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "v"))),
            lambda x: x["v"],
        ).alias("centroid")
    )


def centroid_outliers(
    df: DataFrame,
    group_col: str,
    id_col: str,
    emb_col: str = "embedding",
    k: int = 5,
    round_dp: int = 6,
) -> DataFrame:
    """Bottom-``k`` rows per group by cosine to their own group's
    centroid: ``(group_col, id_col, cos_to_centroid)``, deterministic
    tie-break on ``id_col``.  NaN/zero-norm rows are excluded (they have
    no direction to compare)."""
    cents = grouped_centroids(df, group_col, emb_col, round_dp)
    scored = (
        df.select(group_col, id_col, emb_col)
        .join(F.broadcast(cents), group_col)
        .withColumn(
            "__cos", cosine_similarity(F.col(emb_col), F.col("centroid"))
        )
        .where(F.col("__cos").isNotNull() & (~F.isnan("__cos")))
    )
    w = Window.partitionBy(group_col).orderBy(
        F.asc("__cos"), F.asc(id_col)
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(
            group_col,
            id_col,
            F.round("__cos", round_dp).alias("cos_to_centroid"),
        )
    )


def pca_power_iteration(
    df: DataFrame,
    emb_col: str = "embedding",
    dim: int = 64,
    iters: int = 3,
    unit_scale: int = 10_000,
) -> DataFrame:
    """Top principal component of the embedding cloud by ``iters``
    unrolled power iterations over the exactly-computed covariance —
    the anisotropy diagnostic (Ethayarajh 2019: contextual embeddings
    collapse toward a dominant direction; a high λ₁/trace ratio says
    cosine similarities are inflated by a common component).

    Returns ONE row: ``n_vecs, lambda1, total_var, anisotropy``
    (an EMPTY input returns zero rows — there is no cloud to measure;
    note a plain-SQL mirror's ungrouped aggregates would instead emit
    one all-NULL row, so callers comparing engines must feed ≥1 vector).

    Determinism (every stage exact or fixed-order):
    * elements quantize ONCE to ``unit_scale`` integer units, so the
      second-moment matrix ``Cjk = Σ yj·yk``, column sums ``Sj``, and
      the centered scatter ``n·Cjk − Sj·Sk`` are exact BIGINT;
    * each iteration's matrix-vector product folds arrays in fixed
      index order (``aggregate(zip_with(...))`` ≡ DuckDB
      ``list_dot_product`` — the sq8/maxsim precedent), never a float
      aggregation over shuffled rows;
    * the new vector micro-rounds after an integer max-abs rescale and
      an IEEE-exact sqrt normalization, so both engines carry the
      identical v into the next iteration;
    * λ₁ is the Rayleigh fold v·(Cv); the trace comes from the exact
      BIGINT diagonal.

    Scale shape: the scatter builds as a per-partition INTEGER
    outer-product accumulation in one mapInPandas pass (int64 matmul —
    exact arithmetic, so the result is bit-identical to the explode
    formulation the oracle replays); each task emits d²+d+1 partial
    rows regardless of its data, and the (j, k) aggregation shuffles
    ≤ P·d² partials.  Everything after runs on d-row / 1-row frames.
    C is symmetric, so a bandwidth-tight build could halve the emit.
    """
    us = float(unit_scale)
    vecs = df.where(F.size(emb_col) == dim).select(F.col(emb_col).alias("e"))

    def _scatter(batches):
        import numpy as np
        import pandas as pd

        c_acc = np.zeros((dim, dim), dtype=np.int64)
        s_acc = np.zeros(dim, dtype=np.int64)
        n_acc = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["e"].to_numpy()).astype(np.float64)
            # the SAME quantization expression the oracle replays:
            # floor(float64(e) * unit_scale + 0.5) — exact int64 after
            yq = np.floor(x * us + 0.5).astype(np.int64)
            c_acc += yq.T @ yq  # int64 matmul: exact, no float sum
            s_acc += yq.sum(axis=0)
            n_acc += yq.shape[0]
        if n_acc == 0:
            return
        jj, kk = np.meshgrid(
            np.arange(dim, dtype=np.int32),
            np.arange(dim, dtype=np.int32),
            indexing="ij",
        )
        out = pd.DataFrame(
            {
                "j": np.concatenate([jj.ravel(), np.arange(dim, dtype=np.int32), [-1]]),
                "k": np.concatenate([kk.ravel(), np.full(dim, -1, dtype=np.int32), [-1]]),
                "c": np.concatenate([c_acc.ravel(), s_acc, [n_acc]]),
            }
        )
        yield out

    partials = (
        vecs.mapInPandas(_scatter, "j INT, k INT, c LONG")
        .groupBy("j", "k")
        .agg(F.sum("c").alias("c"))
        .localCheckpoint(eager=True)  # c/s/nrow all slice this frame
    )
    c = partials.where((F.col("j") >= 0) & (F.col("k") >= 0))
    s = partials.where((F.col("j") >= 0) & (F.col("k") == -1)).select(
        "j", F.col("c").alias("s")
    )
    nrow = partials.where((F.col("j") == -1) & (F.col("k") == -1)).select(
        F.col("c").alias("n")
    )
    cov = (
        c.join(s.select(F.col("j").alias("__j"), F.col("s").alias("sj")),
               F.col("j") == F.col("__j"))
        .join(s.select(F.col("j").alias("__k"), F.col("s").alias("sk")),
              F.col("k") == F.col("__k"))
        .crossJoin(F.broadcast(nrow))
        .select(
            "j", "k", "n",
            # the centering products run in DECIMAL(38,0) (HUGEINT in
            # the oracle): n·C and Sj·Sk reach n²·unit_scale², which
            # leaves BIGINT near n ≈ 3·10⁵ — and this frame is only d²
            # rows, so the wide type costs nothing.  The scatter SUMS
            # above stay BIGINT (bounded by n·unit_scale² ≈ 10⁸·n).
            (
                F.col("n").cast("decimal(38,0)") * F.col("c").cast("decimal(38,0)")
                - F.col("sj").cast("decimal(38,0)") * F.col("sk").cast("decimal(38,0)")
            ).alias("cv"),
        )
    )
    cov = cov.localCheckpoint(eager=True)  # 3 iterations + trace re-read it
    covd = cov.select(
        "j", "k",
        (F.col("cv").cast("double")
         / (F.col("n") * F.col("n")).cast("double")).alias("cvn"),
    )
    rows = covd.groupBy("j").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("k", "cvn"))),
            lambda x: x["cvn"],
        ).alias("row")
    )
    rows = rows.localCheckpoint(eager=True)

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, v: x * v),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    vf = nrow.select(
        F.transform(F.sequence(F.lit(1), F.lit(dim)), lambda _: F.lit(1.0))
        .alias("v")
    )
    for _ in range(iters):
        w = rows.crossJoin(F.broadcast(vf)).select(
            "j",
            F.floor(_dot(F.col("row"), F.col("v")) * F.lit(1e6) + F.lit(0.5))
            .cast("long")
            .alias("wm"),
        )
        warr = w.agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "wm"))),
                lambda x: x["wm"],
            ).alias("warr")
        )
        # mx/n2 guards: a w-vector of exact zeros (v orthogonal to the
        # column space, or rank-0 scatter) must yield a zero iterate,
        # not an ANSI DIVIDE_BY_ZERO (Spark 4 ANSI throws even for
        # double/0 — the conf an external harness session may pin)
        mx = F.greatest(
            F.aggregate(
                F.col("warr"),
                F.lit(0).cast("long"),
                lambda acc, x: F.greatest(acc, F.abs(x)),
            ),
            F.lit(1).cast("long"),
        )
        r = F.transform(F.col("warr"), lambda x: x.cast("double") / F.col("__mx").cast("double"))
        vf = (
            warr.withColumn("__mx", mx)
            .withColumn("__r", r)
            .withColumn(
                "__n2",
                F.greatest(_dot(F.col("__r"), F.col("__r")), F.lit(1e-300)),
            )
            .select(
                F.transform(
                    F.col("__r"),
                    lambda x: F.floor(
                        x / F.sqrt(F.col("__n2")) * F.lit(1e6) + F.lit(0.5)
                    ) / F.lit(1e6),
                ).alias("v")
            )
        )
    # Rayleigh fold: λ₁ = v·(Cv) with Cv kept double (no micro-round on
    # the last product), trace from the exact integer diagonal
    wlast = rows.crossJoin(F.broadcast(vf)).select(
        "j", _dot(F.col("row"), F.col("v")).alias("wd")
    )
    wdarr = wlast.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "wd"))),
            lambda x: x["wd"],
        ).alias("wdarr")
    )
    tr = cov.where(F.col("j") == F.col("k")).agg(
        F.sum("cv").alias("trint"), F.max("n").alias("n")
    )
    us2 = us * us
    return (
        wdarr.crossJoin(F.broadcast(vf))
        .crossJoin(F.broadcast(tr))
        .select(
            F.col("n").alias("n_vecs"),
            F.round(_dot(F.col("wdarr"), F.col("v")) / F.lit(us2), 6)
            .alias("lambda1"),
            F.round(
                F.col("trint").cast("double")
                / (F.col("n") * F.col("n")).cast("double")
                / F.lit(us2),
                6,
            ).alias("total_var"),
            # nullif: a rank-0 scatter (trace 0) reports NULL anisotropy
            # instead of an ANSI DIVIDE_BY_ZERO
            F.round(
                _dot(F.col("wdarr"), F.col("v"))
                / F.nullif(
                    F.col("trint").cast("double")
                    / (F.col("n") * F.col("n")).cast("double"),
                    F.lit(0.0),
                ),
                6,
            ).alias("anisotropy"),
        )
    )
