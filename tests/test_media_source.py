"""binaryFile media source: parallel file rows, extension-derived
modality/mime, glob pruning, mapping into the multimodal schema, and the
content-pruned parquet round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from merkonvectordb_spark.operators.multimodal import MULTIMODAL_DDL
from merkonvectordb_spark.sources.media import (
    demo_media_dir,
    read_media_dir,
    to_multimodal,
    write_media_parquet,
)


def test_read_media_dir_rows_and_modality(spark, tmp_path):
    d = demo_media_dir(str(tmp_path))
    df = read_media_dir(spark, d)
    rows = {r.path.split("/")[-1]: r for r in df.collect()}
    assert set(rows) == {"a.png", "b.wav", "c.mp4", "notes.txt"}
    assert rows["a.png"].modality == "image"
    assert rows["b.wav"].modality == "audio"
    assert rows["c.mp4"].modality == "video"  # recursive lookup found it
    assert rows["notes.txt"].modality is None  # unknown ext: quarantine, not guess
    assert rows["b.wav"].length == len(b"RIFF-fake-" + b"b" * 128)
    assert bytes(rows["a.png"].content).startswith(b"\x89PNG")


def test_glob_prunes_before_read(spark, tmp_path):
    d = demo_media_dir(str(tmp_path))
    only_png = read_media_dir(spark, d, glob="*.png")
    assert only_png.count() == 1


def test_to_multimodal_schema_and_roundtrip(spark, tmp_path):
    d = demo_media_dir(str(tmp_path))
    mm = to_multimodal(read_media_dir(spark, d))
    # unknown-extension file dropped; schema matches the package DDL
    assert mm.count() == 3
    want = spark.createDataFrame([], MULTIMODAL_DDL)
    assert [f.name for f in mm.schema.fields] == [
        f.name for f in want.schema.fields
    ]
    assert dict(mm.dtypes)["content"] == "binary"
    # content-addressed ids: deterministic across re-ingest
    ids1 = sorted(r.doc_id for r in mm.select("doc_id").collect())
    ids2 = sorted(
        r.doc_id
        for r in to_multimodal(read_media_dir(spark, d)).select("doc_id").collect()
    )
    assert ids1 == ids2 and len(set(ids1)) == 3

    out = str(tmp_path / "mmstore")
    write_media_parquet(mm, out)
    back = spark.read.parquet(out)
    assert back.count() == 3
    # modality partition prune + metadata query never touches content
    imgs = back.where(F.col("modality") == "image").select("doc_id", "meta.mime")
    got = imgs.collect()
    assert len(got) == 1 and got[0].mime == "image/png"
