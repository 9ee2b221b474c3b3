"""Driver-facing query for the KMV distinct-count sketch
(``operators.sketch``): per-column estimated AND exact distinct counts
over the relational fixtures, oracle-checked bit-for-bit because the
sketch hash (md5-derived 60-bit integer) is identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from merkonvectordb_spark.operators.sketch import kmv_distinct
from merkonvectordb_spark.registry import register
from merkonvectordb_spark.schema import load_table

_K = 256


def _kmv_oracle(table: str, column: str, k: int = _K) -> str:
    return f"""
  SELECT '{column}' AS col_name,
         (SELECT CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
                      ELSE {float(k - 1)} * 1152921504606846976.0
                           / CAST(max(h) AS DOUBLE) END
          FROM (SELECT DISTINCT CAST(('0x' || substring(md5(CAST({column} AS VARCHAR)), 1, 15)) AS BIGINT) AS h
                FROM {table} WHERE {column} IS NOT NULL
                ORDER BY h LIMIT {k})) AS est_distinct,
         (SELECT CAST(count(DISTINCT {column}) AS BIGINT) FROM {table}) AS exact_distinct
""".strip()


@register(
    "sketch_distinct",
    "\nUNION ALL\n".join(
        [
            _kmv_oracle("lineitem", "l_partkey"),
            _kmv_oracle("orders", "o_custkey"),
            _kmv_oracle("events", "user_id"),
        ]
    ),
)
def q_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV estimate next to the exact distinct for three key columns.
    The sketch path shuffles only per-partition-distinct 8-byte hashes
    and heap-merges k rows; the exact path is the full distinct — at
    100 TB you run the first and drop the second (it is here so the
    oracle records the sketch's accuracy, not just its value)."""
    out = None
    for table, column in (
        ("lineitem", "l_partkey"),
        ("orders", "o_custkey"),
        ("events", "user_id"),
    ):
        df = load_table(spark, sf_dir, table)
        est = kmv_distinct(df, column, _K)
        exact = df.agg(
            F.countDistinct(column).cast("bigint").alias("exact_distinct")
        )
        row = (
            est.crossJoin(F.broadcast(exact))
            .select(
                F.lit(column).alias("col_name"), "est_distinct", "exact_distinct"
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "heavy_hitters",
    """
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                            x -> x <> '')) AS item
  FROM documents
),
counts AS (SELECT item, count(*) AS cnt FROM toks GROUP BY 1),
n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM counts)
SELECT item, cnt FROM counts CROSS JOIN n WHERE cnt * 100 >= n
""".strip(),
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terms covering ≥ 1% of the corpus token stream, computed in
    bounded memory: per-partition Misra-Gries summaries (O(m) state per
    task, nothing shuffles) propose candidates whose completeness the MG
    bound guarantees, then one exact counting pass over the broadcast-
    pruned candidate set.  The oracle is the unbounded formulation
    (full GROUP BY ... HAVING) — the hash match proves the sketch path
    loses nothing.  Integer threshold arithmetic on both sides."""
    from merkonvectordb_spark.functions.text import tokenize
    from merkonvectordb_spark.operators.sketch import exact_heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokenize(F.col("text"))).alias("term"))
    return exact_heavy_hitters(toks, "term", phi_num=1, phi_den=100, m=200)


_GK = 64  # small enough that the estimator (not the exact branch) engages


@register(
    "sketch_distinct_grouped",
    f"""
WITH hs AS (
  SELECT event_type,
         CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM events WHERE user_id IS NOT NULL
  GROUP BY event_type, h
),
topk AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM hs) WHERE rn <= {_GK}
),
est AS (
  SELECT event_type, count(*) AS n, max(h) AS mx FROM topk GROUP BY event_type
),
exact AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       CASE WHEN e.n < {_GK} THEN CAST(e.n AS DOUBLE)
            ELSE {float(_GK - 1)} * 1152921504606846976.0 / CAST(e.mx AS DOUBLE)
       END AS est_distinct,
       x.exact_distinct
FROM est e JOIN exact x USING (event_type)
""".strip(),
)
def q_sketch_distinct_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED KMV: distinct users per event type as ≤ k-row per-group
    sketches built in one pass (distinct (group, hash) → per-group rank
    keep) — the GROUP BY twin of `sketch_distinct`, with the exact
    count alongside to record accuracy.  At 100 TB only the sketch path
    runs; its shuffle carries per-partition-distinct hashes, never rows."""
    from merkonvectordb_spark.operators.sketch import kmv_distinct_grouped

    ev = load_table(spark, sf_dir, "events")
    est = kmv_distinct_grouped(ev, "event_type", "user_id", _GK)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct")
    )
    return est.join(exact, "event_type")


# ---------------------------------------------------------------------------
# fixed-grid histogram quantiles — deterministic approximate quantiles,
# oracle-replayed arithmetic step by step
# ---------------------------------------------------------------------------

_HQ_BINS = 128
_HQ_QS = (0.25, 0.5, 0.9, 0.99)

_HIST_QUANT_ORACLE = f"""
WITH v AS (
  SELECT CAST(value AS DOUBLE) AS x FROM events
  WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
),
mm AS (SELECT min(x) AS mn, max(x) AS mx, count(*) AS n FROM v),
b AS (
  SELECT CASE WHEN mm.mx = mm.mn THEN 0
              ELSE LEAST({_HQ_BINS - 1}, GREATEST(0,
                   CAST(floor((x - mn) / ((mx - mn) / {_HQ_BINS})) AS INT)))
         END AS bin,
         count(*) AS c
  FROM v, mm GROUP BY 1
),
cum AS (
  SELECT bin, c,
         sum(c) OVER (ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM b
),
qs AS (
  -- CAST: a bare 0.25 literal is DECIMAL in DuckDB; the engine side
  -- computes in DOUBLE, so the oracle must too
  SELECT CAST(unnest([{", ".join(str(q) for q in _HQ_QS)}]) AS DOUBLE) AS q
),
cand AS (
  SELECT qs.q, cum.bin, cum.c, cum.cum, mm.mn, mm.mx, mm.n,
         row_number() OVER (PARTITION BY qs.q ORDER BY cum.bin ASC) AS rn
  FROM qs CROSS JOIN mm JOIN cum ON cum.cum >= qs.q * mm.n
)
SELECT q,
       round(CASE WHEN mx = mn THEN mn
             ELSE mn + ((mx - mn) / {_HQ_BINS})
                       * (bin + (q * n - (cum - c)) / c) END, 6) AS est
FROM cand WHERE rn = 1
""".strip()


@register("hist_quantiles", _HIST_QUANT_ORACLE)
def q_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch quantiles of ``events.value`` (128 bins,
    p25/p50/p90/p99): two corpus-linear passes whose shuffle payload is
    ≤ bins rows, then interpolation arithmetic the oracle replays
    exactly.  The deterministic, mergeable alternative to
    ``approx_percentile`` — and the ≤-one-bin-width error contract is
    pinned against the exact quantiles in ``tests/test_sketch.py``."""
    from merkonvectordb_spark.operators.sketch import histogram_quantiles

    events = load_table(spark, sf_dir, "events")
    return histogram_quantiles(events, "value", _HQ_QS, bins=_HQ_BINS)


# ---------------------------------------------------------------------------
# count-min sketch: bounded-memory point-frequency estimation
# ---------------------------------------------------------------------------

from merkonvectordb_spark.operators.sketch import CMS_DEPTH, CMS_WIDTH  # noqa: E402

_CMS_FOLD = (
    "list_reduce(list_transform(regexp_split_to_array(substr(md5({e}), 1, 15),"
    " ''), ch -> CAST(strpos('0123456789abcdef', ch) AS BIGINT) - 1),"
    " (acc, d) -> acc * 16 + d)"
)


def _cms_cell_sql(val_expr: str) -> str:
    e = f"'cms' || CAST(r AS VARCHAR) || ':' || CAST({val_expr} AS VARCHAR)"
    return f"{_CMS_FOLD.format(e=e)} % {CMS_WIDTH}"


_CMS_ROWS = "[" + ", ".join(str(r) for r in range(CMS_DEPTH)) + "]"

_CMS_ORACLE = f"""
WITH cells AS (
  SELECT r AS row_id, {_cms_cell_sql("user_id")} AS col_id
  FROM events, unnest({_CMS_ROWS}) AS t(r)
),
sketch AS (
  SELECT row_id, col_id, CAST(count(*) AS BIGINT) AS cnt
  FROM cells GROUP BY row_id, col_id
),
probes AS (SELECT DISTINCT user_id FROM events WHERE user_id < 25),
pcells AS (
  SELECT user_id AS probe, r AS row_id, {_cms_cell_sql("user_id")} AS col_id
  FROM probes, unnest({_CMS_ROWS}) AS t(r)
),
est AS (
  SELECT probe, CAST(min(COALESCE(s.cnt, 0)) AS BIGINT) AS est_count
  FROM pcells LEFT JOIN sketch s USING (row_id, col_id)
  GROUP BY probe
),
truth AS (
  SELECT user_id AS probe, CAST(count(*) AS BIGINT) AS true_count
  FROM events GROUP BY user_id
)
SELECT e.probe, e.est_count, COALESCE(t.true_count, 0) AS true_count
FROM est e LEFT JOIN truth t USING (probe)
""".strip()


@register("cms_freq_estimate", _CMS_ORACLE)
def q_cms_freq_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min point-frequency estimates for 25 probe users, exact
    counts alongside.  The sketch is a d×w counter grid (4×64 = 256
    rows) — the shuffled state is INDEPENDENT of input size, counters
    merge by addition (shard-parallel / streamable), and the estimate
    ≥ truth always (upper-bound property; both columns under the
    oracle hash prove the estimator and its bias).  The deliberately
    narrow width forces real collisions so the min-over-rows branch is
    exercised, not just the exact path."""
    from merkonvectordb_spark.operators.sketch import cms_build, cms_estimate

    events = load_table(spark, sf_dir, "events")
    sketch = cms_build(events, "user_id")
    probes = events.where(F.col("user_id") < 25).select("user_id").distinct()
    est = cms_estimate(sketch, probes, "user_id")
    truth = events.groupBy(F.col("user_id").alias("probe")).agg(
        F.count(F.lit(1)).cast("bigint").alias("true_count")
    )
    return est.join(truth, "probe", "left").select(
        "probe",
        "est_count",
        F.coalesce("true_count", F.lit(0)).alias("true_count"),
    )


# ---------------------------------------------------------------------------
# KMV join-cardinality estimation: |A ∩ B| from two mergeable sketches
# ---------------------------------------------------------------------------

_JC_PRICE = 200000
_JC_HASH = (
    "CAST(('0x' || substring(md5(CAST({c} AS VARCHAR)), 1, 15)) AS BIGINT)"
)

_JC_ORACLE = f"""
WITH sa AS (
  SELECT DISTINCT {_JC_HASH.format(c="l_orderkey")} AS h
  FROM lineitem WHERE l_orderkey IS NOT NULL
  ORDER BY h LIMIT {_K}
),
sb AS (
  SELECT DISTINCT {_JC_HASH.format(c="o_orderkey")} AS h
  FROM orders WHERE o_totalprice > {_JC_PRICE} AND o_orderkey IS NOT NULL
  ORDER BY h LIMIT {_K}
),
merged AS (
  SELECT DISTINCT h FROM (SELECT h FROM sa UNION ALL SELECT h FROM sb)
  ORDER BY h LIMIT {_K}
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_x,
         CASE WHEN count(*) < {_K} THEN CAST(count(*) AS DOUBLE)
              ELSE {float(_K - 1)} * 1152921504606846976.0
                   / CAST(max(h) AS DOUBLE) END AS est_union
  FROM merged
),
nb AS (
  SELECT CAST(count(*) AS BIGINT) AS n_both FROM merged m
  WHERE EXISTS (SELECT 1 FROM sa WHERE sa.h = m.h)
    AND EXISTS (SELECT 1 FROM sb WHERE sb.h = m.h)
),
exact_i AS (
  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_inter
  FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                       WHERE o_totalprice > {_JC_PRICE})
),
exact_u AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_union FROM (
    SELECT l_orderkey AS k FROM lineitem
    UNION
    SELECT o_orderkey FROM orders WHERE o_totalprice > {_JC_PRICE})
)
SELECT s.n_x, b.n_both,
       round(s.est_union, 6) AS est_union,
       round(CAST(b.n_both AS DOUBLE) * s.est_union / s.n_x, 6)
         AS est_inter,
       i.exact_inter, u.exact_union
FROM stats s CROSS JOIN nb b CROSS JOIN exact_i i CROSS JOIN exact_u u
""".strip()


@register("kmv_join_cardinality", _JC_ORACLE)
def q_kmv_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from two KMV sketches — the
    optimizer-statistics use of mergeable sketches: estimate
    |keys(lineitem) ∩ keys(high-value orders)| WITHOUT running the
    join.  X = bottom-k of the union (sketch merge); any X member that
    belongs to a side is necessarily in that side's bottom-k, so
    membership tests are ≤k-row semi-joins; est_inter =
    (|X∩A∩B|/|X|)·est_union.  Exact counts ride along so the oracle
    hash records the estimator's accuracy.  At 100 TB both sketches
    come from shard-parallel partial aggs; this query's heavy exact
    branch exists only for verification."""
    from merkonvectordb_spark.operators.sketch import (
        kmv_bottom_k,
        kmv_merge,
    )

    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > _JC_PRICE
    )
    sa = kmv_bottom_k(li, "l_orderkey", _K).persist()
    sb = kmv_bottom_k(od, "o_orderkey", _K).persist()
    merged = kmv_merge(sa, sb, k=_K).persist()
    stats = merged.agg(
        F.count("h").cast("bigint").alias("n_x"),
        F.when(
            F.count("h") < _K, F.count("h").cast("double")
        )
        .otherwise(
            F.lit(float(_K - 1))
            * F.lit(1152921504606846976.0)
            / F.max("h").cast("double")
        )
        .alias("est_union"),
    )
    both = (
        merged.join(sa, "h", "semi")
        .join(sb, "h", "semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    exact_i = (
        li.join(
            od.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "semi",
        )
        .agg(
            F.countDistinct("l_orderkey").cast("bigint").alias("exact_inter")
        )
    )
    exact_u = (
        li.select(F.col("l_orderkey").alias("k"))
        .unionByName(od.select(F.col("o_orderkey").alias("k")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_union"))
    )
    out = (
        stats.crossJoin(F.broadcast(both))
        .crossJoin(F.broadcast(exact_i))
        .crossJoin(F.broadcast(exact_u))
        .select(
            "n_x",
            "n_both",
            F.round("est_union", 6).alias("est_union"),
            F.round(
                F.col("n_both").cast("double")
                * F.col("est_union")
                / F.col("n_x"),
                6,
            ).alias("est_inter"),
            "exact_inter",
            "exact_union",
        )
    )
    # one row: collect eagerly so the persisted sketches can be released
    # (a lazy return would pin them for the session's lifetime)
    rows = out.collect()
    for df in (sa, sb, merged):
        df.unpersist()
    return spark.createDataFrame(
        rows,
        "n_x LONG, n_both LONG, est_union DOUBLE, est_inter DOUBLE,"
        " exact_inter LONG, exact_union LONG",
    )


# ---------------------------------------------------------------------------
# HyperLogLog: the constant-state distinct sketch next to KMV — same
# shared hash, register table + estimator replayed exactly in SQL.
# ---------------------------------------------------------------------------

# every literal cast to DOUBLE explicitly: DuckDB parses bare numeric
# literals as DECIMAL, and a decimal-typed 1.079/256.0 would divide
# under decimal rounding rules, not the IEEE tree the Spark side builds
_HLL_RAW = (
    "((CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)"
    " + CAST(1.079 AS DOUBLE) / CAST(256.0 AS DOUBLE)))"
    " * CAST(65536.0 AS DOUBLE) * CAST(9007199254740992.0 AS DOUBLE))"
    " / CAST(f.sum_pow AS DOUBLE)"
)


def _hll_oracle(table: str, column: str) -> str:
    return f"""
  SELECT '{column}' AS col_name,
         round(CASE WHEN f.vz > 0 AND {_HLL_RAW} <= 640.0
                    THEN 256.0 * ln(256.0 / CAST(f.vz AS DOUBLE))
                    ELSE {_HLL_RAW} END, 6) AS est_distinct,
         f.sum_pow,
         CAST(f.vz AS BIGINT) AS n_zero_regs,
         (SELECT CAST(count(DISTINCT {column}) AS BIGINT) FROM {table})
           AS exact_distinct
  FROM (
    SELECT CAST(coalesce(sum(CAST(1 AS BIGINT) << (53 - mj)), 0)
                + CAST(256 - count(*) AS BIGINT)
                  * (CAST(1 AS BIGINT) << 53) AS BIGINT) AS sum_pow,
           256 - count(*) AS vz
    FROM (
      SELECT idx, max(rho) AS mj FROM (
        SELECT h & 255 AS idx,
               CASE WHEN (h >> 8) = 0 THEN 53
                    ELSE 53 - length(bin(h >> 8)) END AS rho
        FROM (SELECT CAST(('0x' || substring(md5(CAST({column} AS VARCHAR)), 1, 15)) AS BIGINT) AS h
              FROM {table} WHERE {column} IS NOT NULL)
      ) GROUP BY idx
    )
  ) f
""".strip()


@register(
    "hll_distinct",
    "\nUNION ALL\n".join(
        [
            _hll_oracle("lineitem", "l_partkey"),
            _hll_oracle("orders", "o_custkey"),
            _hll_oracle("events", "user_id"),
        ]
    ),
)
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog estimate next to the exact distinct for the same
    three key columns ``sketch_distinct`` (KMV) profiles — the two
    mergeable estimators are directly comparable row for row.

    The output carries the INTEGER sketch state (``sum_pow``, the
    power-of-two harmonic denominator; ``n_zero_regs``) so the oracle
    hash pins the registers exactly, not just the rounded estimate.
    Scale shape: per-task fold into 256 registers before the exchange —
    the shuffle is 256 rows per partition regardless of input size,
    and day/partition sketches merge by max(mj) (``hll_merge``)."""
    from merkonvectordb_spark.operators.sketch import hll_distinct

    out = None
    for table, column in (
        ("lineitem", "l_partkey"),
        ("orders", "o_custkey"),
        ("events", "user_id"),
    ):
        df = load_table(spark, sf_dir, table)
        est = hll_distinct(df, column)
        exact = df.agg(
            F.countDistinct(column).cast("bigint").alias("exact_distinct")
        )
        row = est.crossJoin(F.broadcast(exact)).select(
            F.lit(column).alias("col_name"),
            "est_distinct",
            "sum_pow",
            "n_zero_regs",
            "exact_distinct",
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# Sliding-window distinct users over merged daily sketches — the HLL
# cube: sketch once at day grain, answer every 7-day window by merging
# ≤7 register tables (max per cell) instead of re-scanning events.
# The exact recount rides along as the verification rail.
# ---------------------------------------------------------------------------

_SLIDING_ORACLE = f"""
WITH du AS (
  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day, user_id
  FROM events WHERE user_id IS NOT NULL
),
regs AS (
  SELECT day, h & 255 AS idx,
         max(CASE WHEN (h >> 8) = 0 THEN 53
                  ELSE 53 - length(bin(h >> 8)) END) AS mj
  FROM (SELECT day,
               CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS h
        FROM du)
  GROUP BY 1, 2
),
days AS (SELECT DISTINCT day FROM regs),
merged AS (
  SELECT d.day, idx, max(mj) AS mj
  FROM days d JOIN regs r ON r.day BETWEEN d.day - 6 AND d.day
  GROUP BY 1, 2
),
f AS (
  SELECT day,
         CAST(coalesce(sp, 0) + CAST(256 - np AS BIGINT)
              * (CAST(1 AS BIGINT) << 53) AS BIGINT) AS sum_pow,
         256 - np AS vz
  FROM (SELECT day, count(*) AS np,
               sum(CAST(1 AS BIGINT) << (53 - mj)) AS sp
        FROM merged GROUP BY day)
),
est AS (
  SELECT day,
         round(CASE WHEN f.vz > 0 AND {_HLL_RAW} <= 640.0
                    THEN 256.0 * ln(256.0 / CAST(f.vz AS DOUBLE))
                    ELSE {_HLL_RAW} END, 6) AS est_distinct,
         f.sum_pow,
         CAST(f.vz AS BIGINT) AS n_zero_regs
  FROM f
),
exact AS (
  SELECT d.day, CAST(count(DISTINCT p.user_id) AS BIGINT) AS exact_distinct
  FROM days d JOIN (SELECT DISTINCT day, user_id FROM du) p
    ON p.day BETWEEN d.day - 6 AND d.day
  GROUP BY 1
)
SELECT CAST(est.day AS BIGINT) AS day, est_distinct, sum_pow, n_zero_regs,
       exact_distinct
FROM est JOIN exact ON est.day = exact.day
""".strip()


@register("sliding_distinct_users", _SLIDING_ORACLE)
def q_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day, twice: the HLL-cube way
    (day-grain register tables, each window = a max-merge of ≤7 sketch
    tables — `operators.sketch.hll_registers_grouped/hll_estimate_grouped`)
    and the exact recount.  At 100 TB only the sketch path is sane —
    the exact side re-associates every (day, user) pair with 7 windows
    — but at fixture scale it rides along so the driver hash verifies
    BOTH, including the integer register state.

    The day key is INTEGER division of epoch micros (UTC day number) —
    no calendar/zone function anywhere.  Scale shape: one scan builds
    the daily registers (map-side fold to ≤256 rows/day/task); the
    window merge and estimator run on |days|·256 rows; the exact rail
    shrinks to distinct (day, user) BEFORE fanning out ×7."""
    from merkonvectordb_spark.operators.sketch import (
        hll_estimate_grouped,
        hll_registers_grouped,
    )

    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    du = ev.select(
        F.expr("unix_micros(ts) div 86400000000").alias("day"), "user_id"
    )
    daily = hll_registers_grouped(du, "user_id", "day").localCheckpoint(
        eager=True
    )
    days = daily.select("day").distinct()
    merged = (
        F.broadcast(days.select(F.col("day").alias("wday")))
        .join(
            daily,
            (F.col("day") >= F.col("wday") - 6)
            & (F.col("day") <= F.col("wday")),
        )
        .groupBy(F.col("wday").alias("day"), F.col("idx"))
        .agg(F.max("mj").alias("mj"))
    )
    est = hll_estimate_grouped(merged, "day")
    pairs = du.distinct()
    exact = (
        F.broadcast(days.select(F.col("day").alias("wday")))
        .join(
            pairs,
            (F.col("day") >= F.col("wday") - 6)
            & (F.col("day") <= F.col("wday")),
        )
        .groupBy(F.col("wday").alias("day"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("exact_distinct"))
    )
    return est.join(exact, "day").select(
        F.col("day").cast("bigint").alias("day"),
        "est_distinct",
        "sum_pow",
        "n_zero_regs",
        "exact_distinct",
    )


@register(
    "sampled_global_quantiles",
    """
WITH sample AS (
  SELECT l_extendedprice AS v,
         CAST(('0x' || substring(md5(CAST(l_orderkey AS VARCHAR) || ':'
                || CAST(l_linenumber AS VARCHAR) || 'sq'), 1, 15))
              AS BIGINT) AS h
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL
  ORDER BY h ASC, v ASC
  LIMIT 1024
), ranked AS (
  SELECT v, row_number() OVER (ORDER BY v ASC, h ASC) AS rn,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM sample
)
SELECT CAST(count(*) AS BIGINT) AS sample_n,
       max(CASE WHEN rn <= (25 * n + 99) // 100 THEN v END) AS p25,
       max(CASE WHEN rn <= (50 * n + 99) // 100 THEN v END) AS p50,
       max(CASE WHEN rn <= (75 * n + 99) // 100 THEN v END) AS p75,
       max(CASE WHEN rn <= (90 * n + 99) // 100 THEN v END) AS p90,
       max(CASE WHEN rn <= (99 * n + 99) // 100 THEN v END) AS p99
FROM ranked
""".strip(),
)
def q_sampled_global_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state global quantile estimation from a deterministic
    bottom-k hash sample (`operators.sketch.sampled_quantiles`, k=1024)
    — the rank-error-bounded third quantile path next to the exact
    range-partition shuffle (`global_quantiles`) and the value-error
    histogram (`hist_quantiles`); heavy tails can't hurt a rank bound.
    Content-addressed sample ⇒ the exact member set (and thus every
    estimate) is engine-independent; each estimate is a value the data
    actually contains.  Plan: heap top-k (TakeOrderedAndProject), then
    window + fold over the 1024-row sample frame."""
    from merkonvectordb_spark.operators.sketch import sampled_quantiles

    li = load_table(spark, sf_dir, "lineitem")
    return sampled_quantiles(
        li,
        "l_extendedprice",
        F.concat(
            F.col("l_orderkey").cast("string"),
            F.lit(":"),
            F.col("l_linenumber").cast("string"),
        ),
        (25, 50, 75, 90, 99),
        k=1024,
        salt="sq",
    )
