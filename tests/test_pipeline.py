"""Training-pipeline operators: split determinism and chunk coverage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from merkonvectordb_spark.operators.pipeline import chunk_tokens, hash_split

SPLITS = {"train": 90, "val": 5, "test": 5}


def test_hash_split_is_partition_invariant(spark):
    """The property sample() lacks: repartitioning must not move any row
    between splits."""
    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    a = {r.doc_id: r.split for r in hash_split(df, "doc_id", SPLITS).collect()}
    b = {
        r.doc_id: r.split
        for r in hash_split(df.repartition(17), "doc_id", SPLITS).collect()
    }
    assert a == b


def test_hash_split_respects_weights(spark):
    df = spark.range(20_000).select(F.col("id").alias("doc_id"))
    counts = dict(
        hash_split(df, "doc_id", SPLITS)
        .groupBy("split")
        .count()
        .rdd.map(lambda r: (r["split"], r["count"]))
        .collect()
    )
    assert set(counts) == set(SPLITS)
    for name, w in SPLITS.items():
        assert abs(counts[name] / 20_000 - w / 100) < 0.02, (name, counts)


def test_hash_split_salt_redeals(spark):
    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    a = {r.doc_id: r.split for r in hash_split(df, "doc_id", SPLITS).collect()}
    b = {
        r.doc_id: r.split
        for r in hash_split(df, "doc_id", SPLITS, salt="v2").collect()
    }
    assert a != b  # a salt change re-deals ...
    assert set(a) == set(b)  # ... without gaining or losing rows


def test_hash_split_rejects_bad_weights(spark):
    df = spark.range(10).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", {"a": 0, "b": 0})
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", {"a": -1, "b": 2})


def test_chunks_cover_every_token_in_order(spark):
    """Concatenating each doc's stride-prefixes reconstructs the token
    stream: no token lost, none duplicated outside the overlap."""
    text = " ".join(f"tok{i}" for i in range(150))
    df = spark.createDataFrame([(1, text)], "doc_id LONG, text STRING")
    rows = (
        chunk_tokens(df, "text", window=64, stride=48)
        .orderBy("chunk_idx")
        .collect()
    )
    # starts advance by stride; last chunk may be short but never empty
    assert [r.chunk_idx for r in rows] == list(range(len(rows)))
    rebuilt = []
    for r in rows:
        toks = r.chunk_text.split(" ")
        assert len(toks) == r.chunk_tokens <= 64
        rebuilt.extend(toks[: 48 if len(toks) == 64 else len(toks)])
    # trailing overlap of the final full window duplicates nothing
    assert rebuilt[:150] == [f"tok{i}" for i in range(150)]


def test_chunking_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "just three tokens"), (2, "   "), (3, "")],
        "doc_id LONG, text STRING",
    )
    rows = chunk_tokens(df, "text", window=8, stride=4).collect()
    assert len(rows) == 1
    assert rows[0].doc_id == 1 and rows[0].chunk_tokens == 3
    with pytest.raises(ValueError):
        chunk_tokens(df, "text", window=4, stride=8)
