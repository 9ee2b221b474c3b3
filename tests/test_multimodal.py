"""Multimodal plumbing tests: schema, frame planning, and the
mapInPandas decode path (deterministic fake decoder; the real decoder
slot is an explicit NotImplementedError stub)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from merkonvectordb_spark.operators.multimodal import (
    decode_content,
    default_decoder,
    derive_multimodal,
    fake_decoder,
    frame_sample_plan,
)
from merkonvectordb_spark.schema import load_table

SF = "/root/testdata/sf0.001"


def test_derive_schema_and_partitioned_modalities(spark):
    mm = derive_multimodal(load_table(spark, SF, "documents"))
    assert mm.schema.simpleString() == (
        "struct<doc_id:bigint,modality:string,content:binary,"
        "meta:struct<mime:string,width:int,height:int,duration_ms:int,"
        "sample_rate:int>>"
    )
    mods = {r.modality for r in mm.select("modality").distinct().collect()}
    assert mods == {"image", "audio", "video"}


def test_frame_plan_only_for_video(spark):
    mm = frame_sample_plan(derive_multimodal(load_table(spark, SF, "documents")))
    bad = mm.where(
        ((F.col("modality") != "video") & (F.size("frame_ms") != 0))
        | ((F.col("modality") == "video") & (F.size("frame_ms") == 0))
    ).count()
    assert bad == 0
    row = mm.where(F.col("modality") == "video").first()
    # frames are 0, 1000, 2000, ... strictly inside duration
    assert row.frame_ms[0] == 0
    assert all(b - a == 1000 for a, b in zip(row.frame_ms, row.frame_ms[1:]))
    assert row.frame_ms[-1] <= row.meta.duration_ms


def test_decode_with_fake_decoder_matches_python(spark):
    docs = load_table(spark, SF, "documents").limit(20)
    mm = derive_multimodal(docs)
    got = {r.doc_id: (r.n_bytes, r.checksum)
           for r in decode_content(mm, fake_decoder).collect()}
    want = {}
    for r in docs.collect():
        raw = r.text.encode("utf-8")
        want[r.doc_id] = (len(raw), sum(raw[:64]))
    assert got == want


def test_default_decoder_is_explicit_stub(spark):
    with pytest.raises(NotImplementedError, match="image/audio library"):
        default_decoder("image", b"\x89PNG")
    mm = derive_multimodal(load_table(spark, SF, "documents").limit(2))
    with pytest.raises(Exception, match="NotImplementedError|image/audio"):
        decode_content(mm).collect()
