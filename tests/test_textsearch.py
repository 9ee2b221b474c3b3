"""BM25 scoring, RRF fusion, and the retrieval plan shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from merkonvectordb_spark.operators.textsearch import (
    bm25_topk,
    doc_postings,
    rank_by,
    rrf_fuse,
)

CORPUS = [
    (1, "fast vector scan fast"),
    (2, "fast table join"),
    (3, "slow sort merge"),
    (4, "vector vector vector scan"),
    (5, "the quick brown fox"),
]


def _docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id LONG, text STRING")


def test_postings_counts(spark):
    rows = {
        (r.doc, r.term): (r.tf, r.dl)
        for r in doc_postings(_docs(spark)).collect()
    }
    assert rows[(1, "fast")] == (2, 4)
    assert rows[(4, "vector")] == (3, 4)
    assert (3, "fast") not in rows


def test_bm25_ranks_matching_docs_first(spark):
    out = bm25_topk(_docs(spark), ["fast", "vector", "scan"], k=10).collect()
    docs = [r.doc for r in out]
    # only docs containing a query term appear; non-matching docs never do
    assert set(docs) == {1, 2, 4}
    # doc 1 matches all three terms (two 'fast') — must outrank doc 2's
    # single 'fast'
    assert docs.index(1) < docs.index(2)
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_bm25_empty_query_and_k(spark):
    assert bm25_topk(_docs(spark), [], k=5).count() == 0
    assert bm25_topk(_docs(spark), ["fast"], k=0).count() == 0


def test_bm25_plan_is_heap_topk(spark):
    plan = bm25_topk(_docs(spark), ["fast"], k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # never a global sort


def test_tfidf_plan_bounds_pergroup_topk(spark):
    """The per-doc top-3 must plan as a partial WindowGroupLimit (map-side
    bounded heap), and postings must appear ONCE in the plan — the df
    window formulation shares the lineage the join form would duplicate."""
    from merkonvectordb_spark.queries_hybrid import q_doc_keywords_tfidf

    plan = (
        q_doc_keywords_tfidf(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan and "Partial" in plan
    # one postings aggregation, not two: a single exchange on the
    # (doc, dl, term) grouping key
    assert plan.count("hashpartitioning(doc#") <= 2  # term-window + rank


def test_rrf_rewards_agreement(spark):
    a = rank_by(
        spark.createDataFrame(
            [(10, 5.0), (11, 4.0), (12, 3.0)], "doc LONG, score DOUBLE"
        ),
        "score",
        "doc",
    )
    b = rank_by(
        spark.createDataFrame(
            [(10, 9.0), (13, 8.0)], "doc LONG, score DOUBLE"
        ),
        "score",
        "doc",
    )
    out = rrf_fuse([a, b], id_col="doc", k=10).collect()
    assert out[0].id == 10  # rank 1 in both rankers
    # present-in-one docs score exactly 1/(60+rank)
    got = {r.id: r.rrf for r in out}
    assert abs(got[13] - 1.0 / 62) < 1e-12
    assert abs(got[10] - 2.0 / 61) < 1e-12


def test_hashed_tf_vectors_count_tokens(spark):
    import hashlib

    from merkonvectordb_spark.operators.textsearch import (
        HASHTF_DIM,
        hashed_tf_vectors,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "")], "doc_id LONG, text STRING"
    )
    rows = {r.doc_id: r.tf_vec for r in hashed_tf_vectors(df).collect()}
    assert set(rows) == {1}  # token-free docs vectorize to nothing
    v = rows[1]
    assert len(v) == HASHTF_DIM and sum(v) == 3.0

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % HASHTF_DIM

    assert v[bucket("alpha")] == 2.0
    assert v[bucket("beta")] == 1.0


def test_hashtf_search_self_is_rank1(spark, sf_dir):
    from merkonvectordb_spark.queries_text import q_text_search_hashtf

    out = q_text_search_hashtf(spark, sf_dir).collect()
    top1 = {
        r.query_id: (r.doc_id, r.score)
        for r in out
        if (r.query_id, r.doc_id) in {(q, q) for q in (0, 1, 2)}
    }
    for q, (d, s) in top1.items():
        assert d == q and s == 1.0
