"""Near-dup dedup query with a fully-mirrored DuckDB oracle.

The oracle replays the ENTIRE pipeline — same shingles, same md5-derived
base hashes, same (a_i, b_i) MinHash constants, same banding, same exact
Jaccard threshold, and connected components via a recursive CTE — so the
driver's hash-compare verifies every stage, not just the final shape.
Constants are interpolated from ``operators.dedup`` at import time; the
two engines cannot drift apart silently.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from merkonvectordb_spark.operators import dedup as D
from merkonvectordb_spark.registry import register
from merkonvectordb_spark.schema import load_table


def pair_bound() -> int | None:
    """Optional pair/candidate guard for harness runs (VERDICT r8 #7).
    The driver never sets ``SPARK_GRAFT_PAIR_BOUND``, so registered
    oracle behavior is bit-identical by default (``None`` = unguarded,
    zero cost); ``tools/scale_probe.py`` sets it so a quadratic pair
    explosion at a probed scale raises ``PairExplosionError`` in
    seconds instead of burning hours."""
    v = os.environ.get("SPARK_GRAFT_PAIR_BOUND", "")
    return int(v) if v not in ("", "0") else None


def band_cap() -> int | None:
    """Optional LSH hot-bucket density lever for harness runs (VERDICT
    r9 #2), mirroring :func:`pair_bound`'s opt-in contract.  The driver
    never sets ``SPARK_GRAFT_BAND_CAP``, so registered oracle behavior
    is bit-identical by default (``None`` = exact LSH, zero cost);
    scale probes export it so degenerate-vocabulary corpora (band-key
    candidate density slope 2.0 on the 33-word fixture) keep ANSWERING
    with bounded, corpus-linear pair work instead of tripping
    ``PairExplosionError`` or burning hours — see
    ``operators.dedup.candidate_pairs_from_sets`` for the keep-rule and
    SCALING.md round 10 for measured recall deltas."""
    v = os.environ.get("SPARK_GRAFT_BAND_CAP", "")
    return int(v) if v not in ("", "0") else None

# ---------------------------------------------------------------------------
# corpus: fixture documents + appended-token mutants (high-Jaccard near-dups
# of doc_id < 30) — derived identically in both engines.
# ---------------------------------------------------------------------------

_NEAR_CORPUS_CTE = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 20000, text || ' zig zag zoom' FROM documents WHERE doc_id < 30
)
""".strip()


def near_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mut = docs.where(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zig zag zoom")).alias("text"),
    )
    return docs.select("doc_id", "text").unionByName(mut)


# ---------------------------------------------------------------------------
# DuckDB mirrors of operators.dedup, generated from the same constants
# ---------------------------------------------------------------------------

_TOKS_SQL = (
    r"list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '')"
)
_SHINGLES_SQL = f"""
  (CASE WHEN len({_TOKS_SQL}) >= {D.SHINGLE_N}
        THEN list_distinct(list_transform(
               generate_series(1, len({_TOKS_SQL}) - {D.SHINGLE_N - 1}),
               i -> array_to_string(({_TOKS_SQL})[i:i+{D.SHINGLE_N - 1}], ' ')))
        ELSE [] END)
""".strip()

# 15 hex chars of md5 folded to BIGINT, then into the 31-bit prime field —
# byte-for-byte the same as conv(substr(md5(s),1,15),16,10) % P in Spark.
_BASE_HASH_SQL = (
    "list_reduce(list_transform(regexp_split_to_array(substr(md5(s), 1, 15), ''),"
    " ch -> CAST(strpos('0123456789abcdef', ch) AS BIGINT) - 1),"
    f" (acc, d) -> acc * 16 + d) % {D.MINHASH_P}"
)

_SIG_SQL = "[" + ", ".join(
    f"list_min(list_transform(bases, x -> ({a} * x + {b}) % {D.MINHASH_P}))"
    for a, b in zip(D.MINHASH_A, D.MINHASH_B)
) + "]"

_ROWS_PER_BAND = D.NUM_HASHES // D.LSH_BANDS
_BAND_STRUCTS_SQL = "[" + ", ".join(
    "struct_pack(band_id := {b}, band_key := {key})".format(
        b=b,
        key=" || ':' || ".join(
            f"CAST(sig[{b * _ROWS_PER_BAND + r + 1}] AS VARCHAR)"
            for r in range(_ROWS_PER_BAND)
        ),
    )
    for b in range(D.LSH_BANDS)
) + "]"

# CTE block shared by dedup_near and dedup_quality_survivors: corpus →
# shingles → signatures → bands → verified edges → recursive-CTE
# components → per-doc group labels (CTE name: final)
_NEAR_DEDUP_CTES = f"""
{_NEAR_CORPUS_CTE},
shingled AS (
  SELECT doc_id, {_SHINGLES_SQL} AS sh FROM corpus
),
based AS (
  SELECT doc_id, sh,
         list_transform(sh, s -> {_BASE_HASH_SQL}) AS bases
  FROM shingled WHERE len(sh) > 0
),
sigs AS (
  SELECT doc_id, {_SIG_SQL} AS sig FROM based
),
bands AS (
  SELECT doc_id, u.band_id AS band_id, u.band_key AS band_key
  FROM (SELECT doc_id, unnest({_BAND_STRUCTS_SQL}) AS u FROM sigs)
),
pairs AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bands l JOIN bands r
    ON l.band_id = r.band_id AND l.band_key = r.band_key AND l.doc_id < r.doc_id
),
edges AS (
  SELECT p.a, p.b
  FROM pairs p
  JOIN based sa ON sa.doc_id = p.a
  JOIN based sb ON sb.doc_id = p.b
  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
        / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE) >= 0.6
),
sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
),
labels AS (
  SELECT a AS doc_id, min(least(a, b)) AS group_id FROM reach GROUP BY a
),
final AS (
  SELECT c.doc_id, COALESCE(l.group_id, c.doc_id) AS group_id
  FROM corpus c LEFT JOIN labels l USING (doc_id)
)
""".strip()

_NEAR_DEDUP_ORACLE = f"""
WITH RECURSIVE {_NEAR_DEDUP_CTES}
SELECT doc_id, group_id,
       count(*) OVER (PARTITION BY group_id) AS group_sz
FROM final
""".strip()


@register("dedup_near", _NEAR_DEDUP_ORACLE)
def q_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup dedup: MinHash(16) → LSH(8 bands × 2 rows) → exact
    shingle-Jaccard ≥ 0.6 → connected components.  Bucketed end to end —
    the comparison count is Σ|bucket|², never |corpus|² (the 100 TB
    property), and the iterative CC touches only verified-edge nodes."""
    return D.near_dedup(near_corpus(spark, sf_dir), "doc_id", "text", 0.6)


# ---------------------------------------------------------------------------
# incremental near-dup: probe a PERSISTED MinHash store with a new batch.
# The oracle replays both sides' shingle→signature→band pipelines and the
# cross-join banding — same constants, so the persisted-store probe must
# produce exactly the cross-pairs a one-shot run would.
# ---------------------------------------------------------------------------


def _side_ctes(tag: str, src: str) -> str:
    """shingle/sig/band CTEs for one side (columns: doc_id, text)."""
    return f"""
sh_{tag} AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM {src}),
b_{tag} AS (
  SELECT doc_id, sh, list_transform(sh, s -> {_BASE_HASH_SQL}) AS bases
  FROM sh_{tag} WHERE len(sh) > 0
),
g_{tag} AS (SELECT doc_id, sh, {_SIG_SQL} AS sig FROM b_{tag}),
bands_{tag} AS (
  SELECT doc_id, u.band_id AS band_id, u.band_key AS band_key
  FROM (SELECT doc_id, unnest({_BAND_STRUCTS_SQL}) AS u FROM g_{tag})
)""".strip()


_INCR_DEDUP_ORACLE = f"""
WITH {_NEAR_CORPUS_CTE},
hist AS (SELECT doc_id, text FROM corpus WHERE doc_id < 20000),
newb AS (SELECT doc_id, text FROM corpus WHERE doc_id >= 20000),
{_side_ctes("h", "hist")},
{_side_ctes("n", "newb")},
cand AS (
  SELECT DISTINCT n.doc_id AS new_id, h.doc_id AS hist_id
  FROM bands_n n JOIN bands_h h USING (band_id, band_key)
),
verified AS (
  SELECT c.new_id, c.hist_id,
         CAST(len(list_intersect(sn.sh, sh2.sh)) AS DOUBLE)
         / CAST(len(list_distinct(list_concat(sn.sh, sh2.sh))) AS DOUBLE) AS jac
  FROM cand c
  JOIN b_n sn ON sn.doc_id = c.new_id
  JOIN b_h sh2 ON sh2.doc_id = c.hist_id
)
SELECT new_id, hist_id, round(jac, 6) AS jaccard
FROM verified WHERE jac >= 0.6
""".strip()


@register("dedup_incremental", _INCR_DEDUP_ORACLE)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup screening (operators.fingerprint_store): the
    historical corpus' MinHash bands + shingle sets are PERSISTED once
    (band_id-partitioned VersionedTable), then the new batch — here the
    mutant docs — is shingled alone and probed against the store.  The
    oracle replays both pipelines in SQL, so the hash match proves the
    persisted probe finds exactly the cross-pairs a from-scratch run
    would: history is never re-shingled, which is the 100 TB/day ingest
    property."""
    import shutil
    import tempfile

    from merkonvectordb_spark.operators.fingerprint_store import (
        build_minhash_store,
        probe_minhash_store,
    )

    corpus = near_corpus(spark, sf_dir)
    hist = corpus.where(F.col("doc_id") < 20000)
    newb = corpus.where(F.col("doc_id") >= 20000)
    root = tempfile.mkdtemp(prefix="minhash_store_")
    try:
        store = build_minhash_store(spark, hist, root)
        # band_freq_cap: same opt-in density lever as the leakage
        # queries — the driver never sets it, so oracle behavior is
        # bit-identical by default; scale probes engage it against
        # template-heavy histories (probe-side keep-rule documented in
        # operators.fingerprint_store.probe_minhash_store)
        out = probe_minhash_store(
            store, newb, threshold=0.6, band_freq_cap=band_cap()
        )
        return spark.createDataFrame(
            out.select("new_id", "hist_id", "jaccard").collect(),
            "new_id LONG, hist_id LONG, jaccard DOUBLE",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup pairs — prefix filtering (exact, no recall knob)
# ---------------------------------------------------------------------------

_NG = D.NGRAM_N
_TN, _TD = D.NGRAM_T_NUM, D.NGRAM_T_DEN

# same 60-bit md5 fold as the MinHash/SimHash oracles, applied to each gram
_GKEY_SQL = (
    "list_reduce(list_transform(regexp_split_to_array(substr(md5(s), 1, 15), ''),"
    " ch -> CAST(strpos('0123456789abcdef', ch) AS BIGINT) - 1),"
    " (acc, d) -> acc * 16 + d)"
)

_NGRAM_ORACLE = f"""
WITH {_NEAR_CORPUS_CTE},
normd AS (
  -- replace FIRST, trim (spaces) LAST — mirrors char_ngram_key_rows:
  -- trim() strips only spaces, so trimming before the replace leaves a
  -- trailing newline to become a trailing space and an extra gram
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM corpus
),
grams AS (
  SELECT DISTINCT doc_id, {_GKEY_SQL} AS gkey
  FROM (
    SELECT doc_id, unnest(list_transform(
             generate_series(1, length(t) - {_NG - 1}),
             i -> t[i:i+{_NG - 1}])) AS s
    FROM normd WHERE length(t) >= {_NG}
  )
),
dfreq AS (SELECT gkey, count(*) AS df FROM grams GROUP BY gkey),
ranked AS (
  SELECT g.doc_id, g.gkey,
         row_number() OVER (PARTITION BY g.doc_id ORDER BY d.df, g.gkey) AS rn,
         count(*) OVER (PARTITION BY g.doc_id) AS s
  FROM grams g JOIN dfreq d USING (gkey)
),
prefix AS (
  SELECT doc_id, gkey FROM ranked
  WHERE rn <= s - (({_TN} * s + {_TD - 1}) // {_TD}) + 1
),
pairs AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM prefix l JOIN prefix r ON l.gkey = r.gkey AND l.doc_id < r.doc_id
),
sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
inter AS (
  SELECT p.a, p.b, count(*) AS it
  FROM pairs p
  JOIN grams ga ON ga.doc_id = p.a
  JOIN grams gb ON gb.doc_id = p.b AND gb.gkey = ga.gkey
  GROUP BY p.a, p.b
)
SELECT i.a, i.b,
       round(CAST(i.it AS DOUBLE) / (sa.sz + sb.sz - i.it), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.a
JOIN sizes sb ON sb.doc_id = i.b
WHERE i.it * {_TD} >= {_TN} * (sa.sz + sb.sz - i.it)
""".strip()


@register("dedup_ngram", _NGRAM_ORACLE)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-15-gram Jaccard >= 0.8 pairs via prefix filtering: rarest-first
    gram ranking, prefix truncation at s - ceil(t*s) + 1, candidate
    equi-join on prefix gram keys, exact integer-arithmetic verify.
    EXACT output (prefix filtering is lossless, the md5 gram fold is
    mirrored) — the third dedup family next to MinHash-LSH and SimHash."""
    return D.ngram_jaccard_pairs(
        near_corpus(spark, sf_dir), "doc_id", "text", _NG, _TN, _TD,
        max_pairs=pair_bound(),
    )


# ---------------------------------------------------------------------------
# SimHash near-dup pairs — mirrored oracle
# ---------------------------------------------------------------------------

_FOLD60_SQL = (
    "list_reduce(list_transform(regexp_split_to_array(substr(md5(t), 1, 15), ''),"
    " ch -> CAST(strpos('0123456789abcdef', ch) AS BIGINT) - 1),"
    " (acc, d) -> acc * 16 + d)"
)

_FP_EXPR_SQL = " + ".join(
    f"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h // {1 << i}) % 2 = 1"
    f" THEN 1 ELSE -1 END)) > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
    for i in range(D.SIMHASH_BITS)
)

_CHUNK_W = D.SIMHASH_BITS // D.SIMHASH_CHUNKS
_CHUNK_STRUCTS_SQL = "[" + ", ".join(
    f"struct_pack(chunk_id := {c},"
    f" chunk_key := (fp // {1 << (c * _CHUNK_W)}) % {1 << _CHUNK_W})"
    for c in range(D.SIMHASH_CHUNKS)
) + "]"

_SIMHASH_ORACLE = f"""
WITH {_NEAR_CORPUS_CTE},
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x <> '') AS tk
  FROM corpus
),
hashed AS (
  SELECT doc_id, list_transform(tk, t -> {_FOLD60_SQL}) AS hs
  FROM toks WHERE len(tk) > 0
),
fps AS (SELECT doc_id, ({_FP_EXPR_SQL}) AS fp FROM hashed),
chunks AS (
  SELECT doc_id, u.chunk_id AS chunk_id, u.chunk_key AS chunk_key
  FROM (SELECT doc_id, unnest({_CHUNK_STRUCTS_SQL}) AS u FROM fps)
),
pairs AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM chunks l JOIN chunks r
    ON l.chunk_id = r.chunk_id AND l.chunk_key = r.chunk_key AND l.doc_id < r.doc_id
),
verified AS (
  SELECT p.a, p.b, CAST(bit_count(xor(fa.fp, fb.fp)) AS BIGINT) AS hamming
  FROM pairs p JOIN fps fa ON fa.doc_id = p.a JOIN fps fb ON fb.doc_id = p.b
)
SELECT a, b, hamming FROM verified WHERE hamming <= 7
""".strip()


@register("dedup_simhash", _SIMHASH_ORACLE)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 60-bit TF-weighted fingerprints → 6×10-bit
    chunk banding (pigeonhole: Hamming < 6 is guaranteed a shared chunk)
    → exact Hamming ≤ 7 verify.  The cheap near-dup detector next to
    MinHash — one BIGINT per doc instead of a 16-long signature."""
    out = D.simhash_near_pairs(
        near_corpus(spark, sf_dir), "doc_id", "text", max_hamming=7,
        max_pairs=pair_bound(),
    )
    return out.select("a", "b", F.col("hamming").cast("long").alias("hamming"))


@register(
    "fuzzy_vocab_join",
    """
WITH w AS (
  SELECT DISTINCT unnest(list_filter(
    string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS t
  FROM documents
)
SELECT a.t AS s1, b.t AS s2,
       CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
FROM w a JOIN w b ON a.t < b.t
WHERE levenshtein(a.t, b.t) <= 2
""".strip(),
)
def q_fuzzy_vocab_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance ≤ 2 pairs over the corpus vocabulary.  The engine
    runs the length-banded blocking join (operators.dedup
    .fuzzy_self_join); the oracle is the BRUTE-FORCE all-pairs
    formulation — the hash match proves the blocking is lossless, the
    same verification pattern as dedup_ngram."""
    from merkonvectordb_spark.functions.text import tokenize
    from merkonvectordb_spark.operators.dedup import fuzzy_self_join

    docs = load_table(spark, sf_dir, "documents")
    vocab = docs.select(
        F.explode(tokenize(F.col("text"))).alias("term")
    ).distinct()
    return fuzzy_self_join(vocab, "term", max_dist=2)


# ---------------------------------------------------------------------------
# Eval-set decontamination: the first 25 docs act as the "benchmark",
# the rest as the training corpus; flag shared-shingle contamination.
# ---------------------------------------------------------------------------

_DECON_EVAL_MAX = 25
_DECON_MIN_HITS = 2

_DECONTAMINATE_ORACLE = f"""
WITH tr AS (
  SELECT doc_id AS train_id, unnest({_SHINGLES_SQL}) AS gram
  FROM documents WHERE doc_id >= {_DECON_EVAL_MAX}
),
ev AS (
  SELECT doc_id AS eval_id, unnest({_SHINGLES_SQL}) AS gram
  FROM documents WHERE doc_id < {_DECON_EVAL_MAX}
),
evn AS (SELECT eval_id, count(*) AS n_ev FROM ev GROUP BY eval_id),
hits AS (
  SELECT t.train_id, e.eval_id, count(*) AS shared_ngrams
  FROM tr t JOIN ev e USING (gram)
  GROUP BY t.train_id, e.eval_id
)
SELECT h.train_id, h.eval_id, h.shared_ngrams,
       round(CAST(h.shared_ngrams AS DOUBLE) / n.n_ev, 6) AS containment
FROM hits h JOIN evn n USING (eval_id)
WHERE h.shared_ngrams >= {_DECON_MIN_HITS}
""".strip()


@register("decontaminate", _DECONTAMINATE_ORACLE)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus contamination scan: training docs sharing ≥2 distinct
    3-word shingles with an eval doc, with per-pair containment.  The
    eval side broadcasts, so the exploded training grams never shuffle
    for the join — the 100 TB-train shape."""
    docs = load_table(spark, sf_dir, "documents")
    ev = docs.where(F.col("doc_id") < _DECON_EVAL_MAX)
    tr = docs.where(F.col("doc_id") >= _DECON_EVAL_MAX)
    return D.decontaminate(
        tr, ev, n=D.SHINGLE_N, min_hits=_DECON_MIN_HITS
    )


# ---------------------------------------------------------------------------
# best-of-cluster survivor selection: near-dup groups keep their
# highest-QUALITY member (what production pipelines actually retain),
# not the min-id placeholder.
# ---------------------------------------------------------------------------


def _quality_survivors_oracle() -> str:
    from merkonvectordb_spark.queries_text import _quality_sql

    return f"""
WITH RECURSIVE {_NEAR_DEDUP_CTES},
sized AS (
  SELECT doc_id, group_id,
         count(*) OVER (PARTITION BY group_id) AS group_sz
  FROM final
),
scored AS (
  SELECT s.doc_id, s.group_id, s.group_sz,
         {_quality_sql("c.text")} AS quality
  FROM sized s JOIN corpus c USING (doc_id)
),
ranked AS (
  SELECT doc_id, group_id, group_sz, quality,
         row_number() OVER (PARTITION BY group_id
                            ORDER BY quality DESC, doc_id ASC) AS rn
  FROM scored
)
SELECT doc_id, group_id, CAST(group_sz AS BIGINT) AS group_sz,
       round(quality, 6) AS quality,
       CAST(rn = 1 AS BOOLEAN) AS kept
FROM ranked
""".strip()


@register("dedup_quality_survivors", _quality_survivors_oracle())
def q_dedup_quality_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering + best-of-cluster retention: each MinHash/LSH
    component keeps its highest-quality member (ties → lowest doc_id);
    every doc is returned with its group, size, quality, and kept flag.

    Ranking compares RAW quality doubles — both engines evaluate the
    same closed-form score from the same text, so the order (and the
    hash) agrees; rounding is output-only.  The per-group window input
    is group-sized, never corpus-sized in one partition.
    """
    from pyspark.sql import Window

    from merkonvectordb_spark.functions.text import quality_score

    corpus = near_corpus(spark, sf_dir)
    groups = D.near_dedup(corpus, "doc_id", "text", 0.6)
    scored = corpus.select(
        "doc_id", quality_score(F.col("text")).alias("__q")
    )
    j = groups.join(scored, "doc_id")
    w = Window.partitionBy("group_id").orderBy(
        F.desc("__q"), F.asc("doc_id")
    )
    return j.withColumn("__rn", F.row_number().over(w)).select(
        "doc_id",
        "group_id",
        F.col("group_sz").cast("bigint").alias("group_sz"),
        F.round("__q", 6).alias("quality"),
        (F.col("__rn") == 1).alias("kept"),
    )


# ---------------------------------------------------------------------------
# Cross-source duplication matrix — which sources carry the same content
# (mirror/scrape forensics).  The fixture corpus has no natural exact
# dups, so — per this module's seeding convention — a mirror slice is
# derived identically in both engines: every doc_id < 40 reappears under
# a 'mirror:'-prefixed source.
# ---------------------------------------------------------------------------

# the ONE fingerprint definition (functions.text.doc_fingerprint's
# mirror) — imported, not re-quoted, so the engines can't drift
from merkonvectordb_spark.queries_text import _FP_SQL as _XS_FP_SQL

_XSOURCE_FP = _XS_FP_SQL.format(c="text")

_XSOURCE_ORACLE = f"""
WITH corpus AS (
  SELECT source, text FROM documents
  UNION ALL
  SELECT 'mirror:' || source, text FROM documents WHERE doc_id < 40
),
fps AS (SELECT DISTINCT source, {_XSOURCE_FP} AS fp FROM corpus),
tot AS (SELECT source, count(*) AS n FROM fps GROUP BY source),
shared AS (
  SELECT l.source AS source_a, r.source AS source_b, count(*) AS n_shared
  FROM fps l JOIN fps r ON l.fp = r.fp AND l.source < r.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, n_shared, ta.n AS n_fps_a, tb.n AS n_fps_b
FROM shared
JOIN tot ta ON ta.source = shared.source_a
JOIN tot tb ON tb.source = shared.source_b
""".strip()


@register("cross_source_overlap", _XSOURCE_ORACLE)
def q_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source exact-duplication matrix: distinct (source,
    fingerprint) pairs self-join on fingerprint across source pairs —
    the corpus-forensics report that finds mirrored/scraped slices
    before a mixture is weighted (per-pair shared-fingerprint counts
    plus each side's distinct-content size, ready for Jaccard).

    Scale shape: the distinct and the self-join both shuffle on the
    fingerprint key — corpus-linear, no all-pairs blowup (a fingerprint
    joins only its own duplicates); per-source totals broadcast into
    the final tiny join.  All BIGINT/STRING output."""
    from merkonvectordb_spark.functions.text import doc_fingerprint

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select("source", "text").unionByName(
        docs.where(F.col("doc_id") < 40).select(
            F.concat(F.lit("mirror:"), F.col("source")).alias("source"),
            "text",
        )
    )
    fps = corpus.select(
        "source", doc_fingerprint(F.col("text")).alias("fp")
    ).distinct()
    tot = fps.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    left = fps.select(F.col("source").alias("source_a"), "fp")
    right = fps.select(F.col("source").alias("source_b"), "fp")
    shared = (
        left.join(right, "fp")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(
            F.broadcast(tot.select(F.col("source").alias("source_a"), F.col("n").alias("n_fps_a"))),
            "source_a",
        )
        .join(
            F.broadcast(tot.select(F.col("source").alias("source_b"), F.col("n").alias("n_fps_b"))),
            "source_b",
        )
        .select("source_a", "source_b", "n_shared", "n_fps_a", "n_fps_b")
    )


# ---------------------------------------------------------------------------
# MinHash calibration — estimator-vs-truth on the LSH candidate pairs.
# The near-dup family trusts sig-agreement/16 as a Jaccard proxy; this
# report measures that proxy against the exact shingle Jaccard pair by
# pair (the ann_recall_report pattern, applied to MinHash).
# ---------------------------------------------------------------------------

_MINHASH_CALIB_ORACLE = f"""
WITH {_NEAR_CORPUS_CTE},
shingled AS (
  SELECT doc_id, {_SHINGLES_SQL} AS sh FROM corpus
),
based AS (
  SELECT doc_id, sh,
         list_transform(sh, s -> {_BASE_HASH_SQL}) AS bases
  FROM shingled WHERE len(sh) > 0
),
sigs AS (
  SELECT doc_id, sh, {_SIG_SQL} AS sig FROM based
),
bands AS (
  SELECT doc_id, u.band_id AS band_id, u.band_key AS band_key
  FROM (SELECT doc_id, unnest({_BAND_STRUCTS_SQL}) AS u FROM sigs)
),
pairs AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bands l JOIN bands r
    ON l.band_id = r.band_id AND l.band_key = r.band_key AND l.doc_id < r.doc_id
),
scored AS (
  SELECT p.a, p.b,
         CAST(len(list_filter(range(1, {D.NUM_HASHES} + 1),
                              i -> sa.sig[i] = sb.sig[i])) AS DOUBLE)
           / {D.NUM_HASHES}.0 AS est,
         CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
           / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE)
           AS exact
  FROM pairs p
  JOIN sigs sa ON sa.doc_id = p.a
  JOIN sigs sb ON sb.doc_id = p.b
)
SELECT a, b, round(est, 6) AS est_jaccard, round(exact, 6) AS exact_jaccard,
       round(abs(est - exact), 6) AS abs_err
FROM scored
""".strip()


@register("minhash_calibration", _MINHASH_CALIB_ORACLE)
def q_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-candidate-pair MinHash calibration: signature-agreement
    fraction (the estimator every banding decision rides on) vs the
    exact shingle Jaccard, plus the absolute error.  Candidates come
    from the SAME banded LSH as ``dedup_near`` — Σ|bucket|² pairs, not
    all-pairs — and both scores are two hash-joins against the
    shingle-set/signature table: corpus-linear end to end.  Thresholds
    act on raw doubles; ``round(…, 6)`` is output-only (house rule)."""
    from merkonvectordb_spark.operators.dedup import (
        candidate_pairs_from_sets,
        collapse_identical_sets,
        shingle_analysis,
    )

    # Round 9: score REPRESENTATIVES only, then star-expand.  Identical
    # shingle sets have identical signatures, so every within-group
    # pair is (est=1, exact=1, err=0) and every cross-group member pair
    # carries its reps' scores bit-for-bit — the output (one row per
    # candidate pair, true-answer-sized: an identical g-group owes
    # g²/2 rows) is unchanged, but the array-intersection scoring runs
    # per rep pair, not per member pair (the sf10 fixture's ~10k-doc
    # identical group: 50M scored joins → 50M cheap expansion rows;
    # 302 s → output-emit-bound, round 9).
    sets_all = shingle_analysis(near_corpus(spark, sf_dir), "doc_id", "text")
    # the collapse returns eager checkpoints (one fused Arrow pass);
    # rep_sets carries the pass's __sig through, so no recompute here
    membership, rep_sets = collapse_identical_sets(sets_all)
    sigs = rep_sets.select("__id", "__sh", "__sig")
    pairs = candidate_pairs_from_sets(rep_sets, band_cap())
    sa = sigs.select(
        F.col("__id").alias("a"),
        F.col("__sh").alias("sh_a"),
        F.col("__sig").alias("sig_a"),
    )
    sb = sigs.select(
        F.col("__id").alias("b"),
        F.col("__sh").alias("sh_b"),
        F.col("__sig").alias("sig_b"),
    )
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda v: v,
        )
    ).cast("double") / F.lit(float(D.NUM_HASHES))
    exact = F.size(F.array_intersect("sh_a", "sh_b")).cast(
        "double"
    ) / F.size(F.array_union("sh_a", "sh_b")).cast("double")
    scored_reps = (
        pairs.join(sa, "a")
        .join(sb, "b")
        .select(
            F.col("a").alias("ra"),
            F.col("b").alias("rb"),
            est.alias("__est"),
            exact.alias("__exact"),
        )
    )
    ma = membership.select(
        F.col("__rep").alias("ra"), F.col("__id").alias("ia")
    )
    mb = membership.select(
        F.col("__rep").alias("rb"), F.col("__id").alias("ib")
    )
    cross = (
        scored_reps.join(ma, "ra")
        .join(mb, "rb")
        .select(
            F.least("ia", "ib").alias("a"),
            F.greatest("ia", "ib").alias("b"),
            "__est",
            "__exact",
        )
    )
    wa = membership.select(
        F.col("__rep").alias("__r"), F.col("__id").alias("a")
    )
    wb = membership.select(
        F.col("__rep").alias("__r"), F.col("__id").alias("b")
    )
    within = (
        wa.join(wb, "__r")
        .where(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.lit(1.0).alias("__est"),
            F.lit(1.0).alias("__exact"),
        )
    )
    return cross.unionByName(within).select(
        "a",
        "b",
        F.round("__est", 6).alias("est_jaccard"),
        F.round("__exact", 6).alias("exact_jaccard"),
        F.round(F.abs(F.col("__est") - F.col("__exact")), 6).alias(
            "abs_err"
        ),
    )


# ---------------------------------------------------------------------------
# Split-leakage audit — do near-duplicates straddle train/val/test?
# The QA gate every pretraining data pipeline needs between dedup and
# split assignment: a val/test document whose near-dup lives in train
# inflates eval scores (Lee et al. 2022 §6 measure this directly).
# Composes the two driver-verified pipelines: the MinHash-LSH verified
# edges of dedup_near and the content-addressed split of doc_hash_split.
# ---------------------------------------------------------------------------

_SPLIT_B_SQL = (
    "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    " % 100"
)

_SPLIT_LEAKAGE_ORACLE = f"""
WITH {_NEAR_CORPUS_CTE},
shingled AS (
  SELECT doc_id, {_SHINGLES_SQL} AS sh FROM corpus
),
based AS (
  SELECT doc_id, sh,
         list_transform(sh, s -> {_BASE_HASH_SQL}) AS bases
  FROM shingled WHERE len(sh) > 0
),
sigs AS (
  SELECT doc_id, {_SIG_SQL} AS sig FROM based
),
bands AS (
  SELECT doc_id, u.band_id AS band_id, u.band_key AS band_key
  FROM (SELECT doc_id, unnest({_BAND_STRUCTS_SQL}) AS u FROM sigs)
),
pairs AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bands l JOIN bands r
    ON l.band_id = r.band_id AND l.band_key = r.band_key AND l.doc_id < r.doc_id
),
edges AS (
  SELECT p.a, p.b
  FROM pairs p
  JOIN based sa ON sa.doc_id = p.a
  JOIN based sb ON sb.doc_id = p.b
  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
        / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE) >= 0.6
),
labeled AS (
  SELECT CASE WHEN {_SPLIT_B_SQL.replace("doc_id", "a")} < 90 THEN 'train'
              WHEN {_SPLIT_B_SQL.replace("doc_id", "a")} < 95 THEN 'val'
              ELSE 'test' END AS split_a,
         CASE WHEN {_SPLIT_B_SQL.replace("doc_id", "b")} < 90 THEN 'train'
              WHEN {_SPLIT_B_SQL.replace("doc_id", "b")} < 95 THEN 'val'
              ELSE 'test' END AS split_b
  FROM edges
)
SELECT least(split_a, split_b) AS split_lo,
       greatest(split_a, split_b) AS split_hi,
       count(*) AS n_pairs,
       (least(split_a, split_b) <> greatest(split_a, split_b)) AS leaked
FROM labeled
GROUP BY 1, 2, 4
""".strip()


@register("split_leakage_audit", _SPLIT_LEAKAGE_ORACLE)
def q_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split contamination audit: count verified near-dup pairs
    (MinHash-LSH candidates → exact shingle-Jaccard ≥ 0.6, the
    ``dedup_near`` edge stage) per unordered train/val/test split pair
    under the ``doc_hash_split`` assignment.  ``leaked`` rows are eval
    documents whose near-twin trains — the number this report exists to
    drive to zero (re-deal the split salt or drop the eval twin).

    Scale shape (round 9, ``operators.dedup.leakage_audit``): the pair
    list is never materialized — pairs factor through exact groups
    (identical sets always pair at Jaccard 1; cross-group member pairs
    carry their reps' Jaccard), so per-split-pair counts are PRODUCTS
    of per-group split histograms summed over groups and rep edges.
    Work = groups + rep edges; the split label stays a pure
    content-addressed hash of the endpoint id.  Output is ≤ 6 rows.
    All STRING/BIGINT/BOOLEAN."""
    return D.leakage_audit(
        near_corpus(spark, sf_dir),
        "doc_id",
        "text",
        {"train": 90, "val": 5, "test": 5},
        threshold=0.6,
        band_freq_cap=band_cap(),
    )



# ---------------------------------------------------------------------------
# Split-leakage REPAIR — the action on top of the audit: quarantine the
# lower-priority endpoint of every leaking pair (train > val > test), so
# eval scores stop being inflated by near-twins that train.
# ---------------------------------------------------------------------------

_SPLIT_RANK_SQL = "CASE {c} WHEN 'train' THEN 0 WHEN 'val' THEN 1 ELSE 2 END"

_SPLIT_A_SQL = _SPLIT_B_SQL.replace("doc_id", "a")
_SPLIT_BB_SQL = _SPLIT_B_SQL.replace("doc_id", "b")

_SPLIT_QUARANTINE_ORACLE = f"""
WITH {_NEAR_CORPUS_CTE},
shingled AS (
  SELECT doc_id, {_SHINGLES_SQL} AS sh FROM corpus
),
based AS (
  SELECT doc_id, sh,
         list_transform(sh, s -> {_BASE_HASH_SQL}) AS bases
  FROM shingled WHERE len(sh) > 0
),
sigs AS (
  SELECT doc_id, {_SIG_SQL} AS sig FROM based
),
bands AS (
  SELECT doc_id, u.band_id AS band_id, u.band_key AS band_key
  FROM (SELECT doc_id, unnest({_BAND_STRUCTS_SQL}) AS u FROM sigs)
),
pairs AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bands l JOIN bands r
    ON l.band_id = r.band_id AND l.band_key = r.band_key AND l.doc_id < r.doc_id
),
edges AS (
  SELECT p.a, p.b
  FROM pairs p
  JOIN based sa ON sa.doc_id = p.a
  JOIN based sb ON sb.doc_id = p.b
  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
        / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE) >= 0.6
),
labeled AS (
  SELECT a, b,
         CASE WHEN {_SPLIT_A_SQL} < 90 THEN 'train'
              WHEN {_SPLIT_A_SQL} < 95 THEN 'val' ELSE 'test' END AS split_a,
         CASE WHEN {_SPLIT_BB_SQL} < 90 THEN 'train'
              WHEN {_SPLIT_BB_SQL} < 95 THEN 'val' ELSE 'test' END AS split_b
  FROM edges
),
quarantined AS (
  SELECT CASE WHEN ({_SPLIT_RANK_SQL.format(c="split_a")})
                 > ({_SPLIT_RANK_SQL.format(c="split_b")})
              THEN a ELSE b END AS doc_id,
         CASE WHEN ({_SPLIT_RANK_SQL.format(c="split_a")})
                 > ({_SPLIT_RANK_SQL.format(c="split_b")})
              THEN split_a ELSE split_b END AS split
  FROM labeled WHERE split_a <> split_b
)
SELECT doc_id, split, CAST(count(*) AS BIGINT) AS n_leak_edges
FROM quarantined GROUP BY 1, 2
""".strip()


@register("split_leakage_quarantine", _SPLIT_QUARANTINE_ORACLE)
def q_split_leakage_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTION on `split_leakage_audit`'s finding: for every verified
    near-dup pair straddling splits, quarantine the LOWER-priority
    endpoint (train > val > test — training data is the scarce asset;
    a contaminated eval doc is replaceable), emitting (doc_id, split,
    n_leak_edges) for every document to pull.

    Round-9 plan: the pair list is NEVER materialized.  Identical
    shingle sets collapse to representatives
    (``D.collapse_identical_sets``) before banding/verify, and the
    per-document leak count derives ARITHMETICALLY: a doc's leak edges
    are exactly its lower-ranked partners, and within an exact group —
    or across a verified rep edge — every member of the other side is a
    partner, so the count is a per-group split HISTOGRAM lookup:
    ``n(doc) = H_train (if doc∉train) + H_val (if doc∈test)`` with H
    summed over the doc's own group and its verified-adjacent groups
    (identical sets ⇒ every within-group pair has Jaccard 1 ≥ 0.6 and
    always bands together; cross-group member pairs share their reps'
    Jaccard).  Work: members + rep-edges rows — the sf10 fixture's
    ~10k-doc identical boilerplate group costs 10k membership rows
    instead of 50M pairs (measured 246.6 s → linear; round 9).  Output
    values are bit-identical to the pair-materializing form (pinned in
    ``test_dedup``)."""
    return D.leakage_quarantine(
        near_corpus(spark, sf_dir),
        "doc_id",
        "text",
        {"train": 90, "val": 5, "test": 5},
        threshold=0.6,
        band_freq_cap=band_cap(),
    )


# ---------------------------------------------------------------------------
# Band-frequency-capped leakage audit — the driver-verified twin of the
# density lever (VERDICT r9 #2, mirroring round 9's semantic_dedup_capped
# pattern: the uncapped query stays the exact-semantics oracle; this one
# pins the CAPPED keep-rule bit-for-bit).
#
# _AUDIT_BAND_CAP = 2 is deliberately fixture-scaled: it is the only value
# that truncates a hot bucket at the sf0.01 driver gate (max rep bucket
# there is 3), so the gate verifies the keep-rule CHANGING the answer
# (train-train pair count 43 vs 48; 52 of 57 rep edges survive) and the
# oracle replaying it — not a no-op pass-through.  The AUDIT is the capped
# twin (not the quarantine) because its per-split-pair counts include
# same-split pairs, so ANY dropped rep edge perturbs the output — the
# quarantine's output at sf0.01 happens to be cap-invariant (the dropped
# edges are not split-straddling), which would verify nothing.  Production
# caps are corpus-scaled (cap 4 already keeps every verified edge at sf0.1
# while cutting candidates 35 %; see SCALING.md round 10 for the measured
# recall/cost curve).
# ---------------------------------------------------------------------------

_AUDIT_BAND_CAP = 2

_SPLIT_LEAKAGE_CAPPED_ORACLE = f"""
WITH {_NEAR_CORPUS_CTE},
shingled AS (
  SELECT doc_id, {_SHINGLES_SQL} AS sh FROM corpus
),
nonempty AS (
  SELECT doc_id, list_sort(sh) AS skey, sh FROM shingled WHERE len(sh) > 0
),
grp AS (SELECT skey, min(doc_id) AS rep FROM nonempty GROUP BY skey),
membership AS (
  SELECT n.doc_id, g.rep FROM nonempty n JOIN grp g ON n.skey = g.skey
),
rep_based AS (
  SELECT doc_id, sh, list_transform(sh, s -> {_BASE_HASH_SQL}) AS bases
  FROM nonempty WHERE doc_id IN (SELECT rep FROM grp)
),
rep_sigs AS (SELECT doc_id, {_SIG_SQL} AS sig FROM rep_based),
bands AS (
  SELECT doc_id, u.band_id AS band_id, u.band_key AS band_key
  FROM (SELECT doc_id, unnest({_BAND_STRUCTS_SQL}) AS u FROM rep_sigs)
),
capped AS (
  SELECT doc_id, band_id, band_key FROM (
    SELECT doc_id, band_id, band_key,
           row_number() OVER (PARTITION BY band_id, band_key
                              ORDER BY doc_id) AS slot
    FROM bands) WHERE slot <= {_AUDIT_BAND_CAP}
),
pairs AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM capped l JOIN capped r
    ON l.band_id = r.band_id AND l.band_key = r.band_key AND l.doc_id < r.doc_id
),
edges AS (
  SELECT p.a, p.b
  FROM pairs p
  JOIN rep_based sa ON sa.doc_id = p.a
  JOIN rep_based sb ON sb.doc_id = p.b
  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
        / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE) >= 0.6
),
member_pairs AS (
  SELECT m1.doc_id AS a, m2.doc_id AS b
  FROM membership m1 JOIN membership m2
    ON m1.rep = m2.rep AND m1.doc_id < m2.doc_id
  UNION ALL
  SELECT least(m1.doc_id, m2.doc_id) AS a, greatest(m1.doc_id, m2.doc_id) AS b
  FROM edges e
  JOIN membership m1 ON m1.rep = e.a
  JOIN membership m2 ON m2.rep = e.b
),
labeled AS (
  SELECT a, b,
         CASE WHEN {_SPLIT_A_SQL} < 90 THEN 'train'
              WHEN {_SPLIT_A_SQL} < 95 THEN 'val' ELSE 'test' END AS split_a,
         CASE WHEN {_SPLIT_BB_SQL} < 90 THEN 'train'
              WHEN {_SPLIT_BB_SQL} < 95 THEN 'val' ELSE 'test' END AS split_b
  FROM member_pairs
)
SELECT least(split_a, split_b) AS split_lo,
       greatest(split_a, split_b) AS split_hi,
       count(*) AS n_pairs,
       (least(split_a, split_b) <> greatest(split_a, split_b)) AS leaked
FROM labeled
GROUP BY 1, 2, 4
""".strip()


@register("split_leakage_audit_capped", _SPLIT_LEAKAGE_CAPPED_ORACLE)
def q_split_leakage_audit_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`split_leakage_audit` with the LSH hot-bucket density lever
    ENGAGED (``band_freq_cap=2``, fixture-scaled — see the module
    comment above the oracle): each (band_id, band_key) bucket keeps
    only its cap lowest representative ids before the candidate
    self-join, so banded pair work is bounded by #buckets·C(cap, 2) —
    corpus-linear on ANY vocabulary, including the degenerate
    template-heavy corpora where exact LSH candidate density grows at
    slope 2.0 (the 33-word scale fixture; SCALING.md rounds 9-10).

    Semantics the oracle replays bit-for-bit: identical shingle sets
    collapse to min-id representatives FIRST (exact-duplicate pairs are
    cap-immune — they never pass through banding); hot buckets are then
    deterministically sub-sampled (keep-lowest-id, one spillable
    row_number window); surviving rep pairs verify at exact Jaccard
    ≥ 0.6; per-split-pair counts expand through the same
    split-histogram products as the uncapped twin.  Recall statement
    at gate scale: 52 of 57 rep edges survive cap=2 at sf0.01 (the
    train-train count drops 48 → 43); cap=4 keeps all 274 edges at
    sf0.1 (lossless) while cutting candidates 35 %."""
    return D.leakage_audit(
        near_corpus(spark, sf_dir),
        "doc_id",
        "text",
        {"train": 90, "val": 5, "test": 5},
        threshold=0.6,
        band_freq_cap=_AUDIT_BAND_CAP,
    )
