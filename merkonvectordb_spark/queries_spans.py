"""Exact duplicated-span (substring-dedup) queries with fully-mirrored
DuckDB oracles.

Substring dedup à la Lee et al. 2022 ("Deduplicating Training Data Makes
Language Models Better"): a token n-gram occurring ≥2 times anywhere in
the corpus marks a duplicated span; consecutive duplicated positions
merge into maximal runs (gaps-and-islands); run token-intervals are
union-merged for exact coverage; removal drops every non-first
occurrence's coverage.  The oracle replays the ENTIRE pipeline — same
tokenizer, same md5-fold gram hash, same windows — so the driver hash
verifies every stage.

The fixture corpus is random text (almost no natural 8-gram collisions),
so the query corpus plants shared spans deterministically in both
engines: 20 mutant docs, each the concatenation of two neighbouring
originals — every original span inside a mutant is a cross-document
duplicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from merkonvectordb_spark.operators import dedup as D
from merkonvectordb_spark.registry import register
from merkonvectordb_spark.schema import load_table

_N = D.DUPSPAN_N

# ---------------------------------------------------------------------------
# shared corpus: documents ∪ neighbour-concat mutants (planted shared spans)
# ---------------------------------------------------------------------------

_SPAN_CORPUS_CTE = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT a.doc_id + 30000 AS doc_id, a.text || ' ' || b.text AS text
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
  WHERE a.doc_id < 20
)
""".strip()


def span_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = docs.alias("a")
    b = docs.alias("b")
    mut = (
        a.where(F.col("a.doc_id") < 20)
        .join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .select(
            (F.col("a.doc_id") + 30000).alias("doc_id"),
            F.concat(
                F.col("a.text"), F.lit(" "), F.col("b.text")
            ).alias("text"),
        )
    )
    return docs.unionByName(mut)


# ---------------------------------------------------------------------------
# DuckDB mirrors of operators.dedup span helpers (same codec/windows)
# ---------------------------------------------------------------------------

from merkonvectordb_spark.queries_dedup import _TOKS_SQL  # noqa: E402



def _fold60(expr: str) -> str:
    """md5-fold of ``expr`` to a 60-bit BIGINT — byte-for-byte the Spark
    ``conv(substr(md5(e),1,15),16,10)`` codec, in the repo's ONE
    canonical DuckDB form (functions/hashing.py documents it; the
    pipeline/sketch/streaming oracles all use this same hex-literal
    cast — a hand-rolled char fold here was a third copy to keep in
    sync)."""
    return f"CAST(('0x' || substring(md5({expr}), 1, 15)) AS BIGINT)"


_GRAM_CTES = f"""
{_SPAN_CORPUS_CTE},
tok AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM corpus),
grams AS (
  SELECT doc_id, i AS pos,
         {_fold60(f"array_to_string(toks[i:i+{_N - 1}], ' ')")} AS gh
  FROM tok,
       unnest(generate_series(1, greatest(len(toks) - {_N - 1}, 0))) AS t(i)
)
""".strip()

_RUNS_SQL = f"""
isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM marked
),
runs AS (
  SELECT doc_id, grp, count(*) AS run_grams,
         min(pos) AS start_pos, max(pos) + {_N - 1} AS end_pos
  FROM isl GROUP BY doc_id, grp
)
""".strip()

_DUP_SPAN_STATS_ORACLE = f"""
WITH {_GRAM_CTES},
marked AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos, count(*) OVER (PARTITION BY gh) AS occ FROM grams
  ) WHERE occ > 1
),
{_RUNS_SQL},
uni AS (
  SELECT doc_id, start_pos, end_pos,
         sum(CASE WHEN prev_end IS NULL OR start_pos > prev_end
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY start_pos
                 ROWS UNBOUNDED PRECEDING) AS cover_grp
  FROM (
    SELECT doc_id, start_pos, end_pos,
           max(end_pos) OVER (PARTITION BY doc_id ORDER BY start_pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
    FROM runs)
),
cov AS (
  SELECT doc_id, CAST(sum(cov_tokens) AS BIGINT) AS dup_tokens FROM (
    SELECT doc_id, cover_grp,
           max(end_pos) - min(start_pos) + 1 AS cov_tokens
    FROM uni GROUP BY doc_id, cover_grp)
  GROUP BY doc_id
),
per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_runs,
         CAST(sum(run_grams) AS BIGINT) AS n_dup_grams,
         CAST(max(end_pos - start_pos) + 1 AS BIGINT) AS max_run_tokens
  FROM runs GROUP BY doc_id
),
base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM tok)
SELECT b.doc_id, b.n_tokens,
       COALESCE(p.n_dup_grams, 0) AS n_dup_grams,
       COALESCE(p.n_runs, 0) AS n_runs,
       COALESCE(p.max_run_tokens, 0) AS max_run_tokens,
       COALESCE(c.dup_tokens, 0) AS dup_tokens
FROM base b
LEFT JOIN per_doc p USING (doc_id)
LEFT JOIN cov c USING (doc_id)
""".strip()


@register("dup_span_stats", _DUP_SPAN_STATS_ORACLE)
def q_dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span screening over the planted-span corpus.

    Scale shape (the 100 TB property): ONE corpus-wide shuffle on the
    gram hash; every later stage is per-document.  Output integers only
    — hash-stable under any partitioning.
    """
    return D.duplicated_span_stats(
        span_corpus(spark, sf_dir), "doc_id", "text", _N
    )


_DUP_SPAN_REMOVAL_ORACLE = f"""
WITH {_GRAM_CTES},
marked AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           count(*) OVER (PARTITION BY gh) AS occ,
           row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rk
    FROM grams
  ) WHERE occ > 1 AND rk > 1
),
{_RUNS_SQL},
covered AS (
  SELECT DISTINCT doc_id, p AS pos
  FROM runs, unnest(generate_series(start_pos, end_pos)) AS t(p)
),
toksrows AS (
  SELECT doc_id, i AS pos, toks[i] AS tok
  FROM tok, unnest(generate_series(1, len(toks))) AS t(i)
),
kept AS (
  SELECT tr.doc_id, tr.pos, tr.tok
  FROM toksrows tr
  LEFT JOIN covered c ON c.doc_id = tr.doc_id AND c.pos = tr.pos
  WHERE c.pos IS NULL
),
re AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens_after,
         string_agg(tok, ' ' ORDER BY pos) AS text_dedup
  FROM kept GROUP BY doc_id
),
base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM tok)
SELECT b.doc_id, b.n_tokens AS n_tokens_before,
       COALESCE(re.n_tokens_after, 0) AS n_tokens_after,
       COALESCE(re.text_dedup, '') AS text_dedup
FROM base b LEFT JOIN re USING (doc_id)
""".strip()


@register("dup_span_removal", _DUP_SPAN_REMOVAL_ORACLE)
def q_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring dedup REMOVAL: non-first occurrences of every duplicated
    span are cut at token granularity; first occurrences survive.  The
    full rewritten text is under the driver hash — reassembly order and
    coverage are verified, not just counts."""
    return D.remove_duplicated_spans(
        span_corpus(spark, sf_dir), "doc_id", "text", _N
    )
