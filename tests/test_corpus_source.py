"""JSONL corpus source/sink: explicit-schema read, corrupt-record
quarantine, round-trip through the partitioned sink."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from merkonvectordb_spark.sources.corpus import (
    CORRUPT_COL,
    DOCUMENT_SCHEMA,
    read_jsonl,
    split_corrupt,
    write_jsonl,
)

GOOD = [
    {"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "s0", "n_chars": 10},
    {"doc_id": 2, "text": "gamma", "lang": "de", "source": "s1", "n_chars": 5},
    {"doc_id": 3, "text": "delta", "lang": "en", "source": "s0", "n_chars": 5},
]
BROKEN = ['{"doc_id": 4, "text": unquoted', "not json at all"]


def _write_fixture(tmp_path):
    p = tmp_path / "corpus.jsonl"
    lines = [json.dumps(g) for g in GOOD]
    lines[1:1] = BROKEN  # interleave the breakage
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_read_jsonl_captures_corrupt_lines(spark, tmp_path):
    path = _write_fixture(tmp_path)
    df = read_jsonl(spark, path)
    assert CORRUPT_COL in df.columns
    clean, corrupt = split_corrupt(df)
    assert CORRUPT_COL not in clean.columns
    assert clean.count() == 3
    assert corrupt.count() == 2
    # the raw broken line survives verbatim for repair
    raws = {r.raw_line for r in corrupt.collect()}
    assert "not json at all" in raws
    # clean rows parse into the documents shape
    got = {r.doc_id: r.text for r in clean.collect()}
    assert got == {1: "alpha beta", 2: "gamma", 3: "delta"}


def test_read_jsonl_schema_is_explicit_not_inferred(spark, tmp_path):
    path = _write_fixture(tmp_path)
    df = read_jsonl(spark, path, capture_corrupt=False)
    assert [f.name for f in df.schema.fields] == [
        f.name for f in DOCUMENT_SCHEMA.fields
    ]
    # type comes from the declared schema (LONG), not inference
    assert dict(df.dtypes)["doc_id"] == "bigint"


def test_jsonl_roundtrip_partitioned(spark, tmp_path):
    path = _write_fixture(tmp_path)
    clean, _ = split_corrupt(read_jsonl(spark, path))
    out = str(tmp_path / "out")
    write_jsonl(clean, out, partition_by=("source",))
    back = read_jsonl(spark, out, capture_corrupt=False)
    assert back.count() == 3
    # hive-style layout: reading one partition prunes the other
    one = back.where(F.col("source") == "s0")
    assert one.count() == 2
    assert sorted(r.doc_id for r in one.collect()) == [1, 3]
