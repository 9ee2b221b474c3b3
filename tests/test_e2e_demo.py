"""E2E replay of the reference demo (Program.cs:14-69, SURVEY §5.2.2):
seed documents → embed (deterministic, no OpenAI) → upsert with
key←metadata.id → semantic search → assert exact top-k, all through the
public VectorStore + knn surface."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from merkonvectordb_spark.operators.search import knn
from merkonvectordb_spark.sources.ingest import (
    decode_embedding_json,
    deterministic_embedding,
    embed_query_text,
    encode_embedding_json,
    records_from_texts,
)
from merkonvectordb_spark.sources.vector_store import VectorStore

# the demo's corpus shape: (url, description) pairs (Program.cs:14-30)
DOCS = [
    ("https://example.test/readme", "README: what is this repo"),
    ("https://example.test/news", "news and announcements"),
    ("https://example.test/jupyter", "jupyter notebooks for starters"),
    ("https://example.test/chatcopilot", "sample chat copilot application"),
    ("https://example.test/docs", "documentation site"),
    ("https://example.test/plugins", "plugins repo readme"),
    ("https://example.test/website", "how to deploy the website"),
]


@pytest.fixture(scope="module")
def seeded_store(spark, tmp_path_factory):
    store = VectorStore(spark, str(tmp_path_factory.mktemp("e2e")))
    docs = spark.createDataFrame(DOCS, "id STRING, text STRING")
    recs = records_from_texts(docs, collection="SKGitHub", dim=32)
    store.upsert(recs)  # UpsertBatch, key←metadata.id (Program.cs:44-54)
    return store


def test_e2e_upsert_then_search_exact_topk(spark, seeded_store):
    corpus = seeded_store.scan("SKGitHub")
    assert corpus.count() == len(DOCS)
    # key took metadata.id (the url), not the placeholder column
    assert {r.key for r in corpus.collect()} == {u for u, _ in DOCS}

    # the demo query (Program.cs:55-59): embed text, search top-5, t=0.6 —
    # with pseudo-embeddings we use t=-1 so ranking itself is under test
    qvec = embed_query_text("jupyter notebooks for starters", dim=32)
    got = knn(corpus, qvec, k=5, min_score=-1.0).collect()

    # ground truth: exact numpy cosine over the same embeddings
    rows = corpus.select("key", "embedding").collect()
    def cos(a, b):
        a, b = np.asarray(a, float), np.asarray(b, float)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    expect = sorted(
        ((cos(r.embedding, qvec), r.key) for r in rows), reverse=True
    )[:5]
    assert [r.key for r in got] == [k for _, k in expect]
    # the query text IS a document text ⇒ identical pseudo-embedding ⇒ top hit
    assert got[0].key == "https://example.test/jupyter"
    assert got[0].score == pytest.approx(1.0, abs=1e-6)


def test_e2e_search_excludes_below_threshold(seeded_store):
    corpus = seeded_store.scan("SKGitHub")
    qvec = embed_query_text("jupyter notebooks for starters", dim=32)
    # hash-seeded embeddings of distinct texts are near-orthogonal: a high
    # threshold keeps only the exact-text match (the demo's 0.6 semantics)
    got = knn(corpus, qvec, k=5, min_score=0.9).collect()
    assert [r.key for r in got] == ["https://example.test/jupyter"]


def test_embedding_json_roundtrip(spark):
    """F2: encode→decode is lossless for float32 embeddings
    (ReadOnlyMemoryConverter.cs:15-31)."""
    df = spark.range(50).select(
        deterministic_embedding(F.col("id").cast("string"), 16).alias("e")
    )
    rt = df.select(
        "e", decode_embedding_json(encode_embedding_json(F.col("e"))).alias("r")
    )
    assert rt.where(F.col("e") != F.col("r")).count() == 0
    # malformed JSON ⇒ NULL, never a throw
    bad = spark.createDataFrame([("not json",), ("[1,2",), (None,)], "s STRING")
    out = bad.select(decode_embedding_json(F.col("s")).alias("d")).collect()
    assert all(r.d is None for r in out)
