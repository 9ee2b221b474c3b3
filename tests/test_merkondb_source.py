"""Migration path from the reference engine's native MessagePack
database file: the spec-derived codec, the Python DataSource, and the
end-to-end migrate-then-search flow."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from merkonvectordb_spark.sources.msgpackio import packb, unpackb


def _reference_doc(collections: dict) -> bytes:
    """A database file exactly as MessagePack-CSharp lays out the
    reference's classes: [ { collection: [ [key, meta, emb, ts], … ] } ]."""
    return packb(
        [
            {
                coll: [
                    [k, meta, emb, ts] for (k, meta, emb, ts) in entries
                ]
                for coll, entries in collections.items()
            }
        ]
    )


# -- codec ------------------------------------------------------------------


def test_codec_roundtrip_reference_shape():
    doc = [
        {
            "articles": [
                ["k1", '{"id": "k1"}', "[0.5, 1.0]", "2024-01-01 00:00:00Z"],
                ["k2", "{}", "[1.0, 0.0]", None],
            ],
            "empty_coll": [],
        }
    ]
    assert unpackb(packb(doc)) == doc


_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**64 - 1),
    st.floats(allow_nan=False, width=64),
    st.text(max_size=40),
    st.binary(max_size=40),
)
_value = st.recursive(
    _scalar,
    lambda children: st.one_of(
        st.lists(children, max_size=5),
        st.dictionaries(st.text(max_size=10), children, max_size=4),
    ),
    max_leaves=25,
)


@settings(max_examples=200, deadline=None)
@given(_value)
def test_codec_roundtrip_property(v):
    assert unpackb(packb(v)) == _tuples_to_lists(v)


def _tuples_to_lists(v):
    if isinstance(v, (list, tuple)):
        return [_tuples_to_lists(x) for x in v]
    if isinstance(v, dict):
        return {k: _tuples_to_lists(x) for k, x in v.items()}
    return v


def test_codec_rejects_truncation_and_trailing():
    buf = packb(["abc", 42])
    with pytest.raises(ValueError, match="truncated"):
        unpackb(buf[:-1])
    with pytest.raises(ValueError, match="trailing"):
        unpackb(buf + b"\x00")


def test_codec_wide_formats():
    # str8/16, array16, map16, bin16, every int width, both floats
    doc = {
        "s" * 40: ["x" * 300, b"\x00" * 300, 2**40, -(2**40), 1.5, -0.25],
        "arr": list(range(20)),
        "m": {str(i): i for i in range(17)},
    }
    assert unpackb(packb(doc)) == doc


# -- data source ------------------------------------------------------------


def test_datasource_reads_reference_file(spark, tmp_path):
    from merkonvectordb_spark.sources.merkondb import read_merkondb

    db = tmp_path / "old.db"
    db.write_bytes(
        _reference_doc(
            {
                "a": [
                    ("k1", '{"id": "k1", "text": "hello"}', "[1.0, 0.0]",
                     "2024-03-01 10:00:00Z"),
                    ("k2", "{}", "[0.0, 1.0]", None),
                ],
                "b": [("k3", "{}", "[0.5, 0.5]", "2024-03-02 11:30:00Z")],
            }
        )
    )
    rows = {
        (r.collection, r.key): r
        for r in read_merkondb(spark, str(db)).collect()
    }
    assert set(rows) == {("a", "k1"), ("a", "k2"), ("b", "k3")}
    assert rows[("a", "k1")].embedding_json == "[1.0, 0.0]"
    assert rows[("a", "k2")].ts_u is None
    assert json.loads(rows[("a", "k1")].metadata)["text"] == "hello"


def test_datasource_directory_partitions_per_file(spark, tmp_path):
    from merkonvectordb_spark.sources.merkondb import read_merkondb

    (tmp_path / "one.db").write_bytes(
        _reference_doc({"c1": [("k1", "{}", "[1.0]", None)]})
    )
    (tmp_path / "two.db").write_bytes(
        _reference_doc({"c2": [("k2", "{}", "[2.0]", None)]})
    )
    df = read_merkondb(spark, str(tmp_path))
    assert df.rdd.getNumPartitions() == 2
    assert {r.collection for r in df.collect()} == {"c1", "c2"}


def test_migrate_into_vector_store_and_search(spark, tmp_path):
    from merkonvectordb_spark.operators.search import knn
    from merkonvectordb_spark.sources.merkondb import migrate_merkondb
    from merkonvectordb_spark.sources.vector_store import VectorStore

    db = tmp_path / "old.db"
    db.write_bytes(
        _reference_doc(
            {
                "docs": [
                    ("d1", '{"id": "d1"}', "[1.0, 0.0, 0.0]",
                     "2024-03-01 10:00:00Z"),
                    ("d2", '{"id": "d2"}', "[0.0, 1.0, 0.0]",
                     "2024-03-01 10:00:01Z"),
                ],
                "was_empty": [],
            }
        )
    )
    store = VectorStore(spark, str(tmp_path / "warehouse"))
    store.create_table()
    n = migrate_merkondb(spark, str(db), store)
    assert n == 2
    # empty reference collections survive as registry entries
    assert store.collection_exists("was_empty")
    hits = knn(store.scan("docs"), [1.0, 0.0, 0.0], k=1).collect()
    assert [h.key for h in hits] == ["d1"]
    # timestamps came through the engine's own "u"-format parser
    got = {r.key: r.ts for r in store.scan("docs").select("key", "ts").collect()}
    assert got["d1"].year == 2024 and got["d1"].second == 0


def test_export_roundtrip_through_reference_format(spark, tmp_path):
    """migrate → export → re-read must reproduce every entry: the
    bidirectional interop contract (run at scale here, hand the file
    back to a single-node reference deployment)."""
    from merkonvectordb_spark.sources.merkondb import (
        migrate_merkondb,
        read_merkondb,
        write_merkondb,
    )
    from merkonvectordb_spark.sources.vector_store import VectorStore

    src = tmp_path / "in.db"
    src.write_bytes(
        _reference_doc(
            {
                "a": [
                    ("k1", '{"id": "k1"}', "[1.0,2.5]", "2024-03-01 10:00:00Z"),
                    ("k2", '{"id": "k2"}', "[0.5,0.25]", "2024-03-01 10:00:01Z"),
                ],
            }
        )
    )
    store = VectorStore(spark, str(tmp_path / "wh"))
    store.create_table()
    assert migrate_merkondb(spark, str(src), store) == 2
    out = tmp_path / "out.db"
    assert write_merkondb(store, str(out)) == 2
    back = {
        (r.collection, r.key): r
        for r in read_merkondb(spark, str(out)).collect()
    }
    assert set(back) == {("a", "k1"), ("a", "k2")}
    assert back[("a", "k1")].ts_u == "2024-03-01 10:00:00Z"
    import json as _json

    assert _json.loads(back[("a", "k1")].embedding_json) == [1.0, 2.5]
    assert _json.loads(back[("a", "k2")].embedding_json) == [0.5, 0.25]
