"""Multimodal tests: schema, frame planning, the mapInPandas decode
path (deterministic fake decoder for opaque-bytes parity), and the REAL
codec path — spec-derived PNG/WAV/MP4 decode + patch/mel featurizers on
real fixtures built in-test (operators.media_codec)."""

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


def test_default_decoder_rejects_non_media_bytes(spark):
    # the default decoder is REAL now: text bytes are not a PNG/WAV/MP4,
    # so they must raise, never produce a plausible row
    with pytest.raises(ValueError, match="PNG"):
        default_decoder("image", b"\x89PNG but truncated")
    mm = derive_multimodal(load_table(spark, SF, "documents").limit(2))
    with pytest.raises(Exception, match="ValueError|not a|Error"):
        decode_content(mm).collect()


# ---------------------------------------------------------------------------
# the real codec path (VERDICT r5 next-round #7): decode real PNG/WAV/
# MP4 fixtures through the same mapInPandas slot
# ---------------------------------------------------------------------------


def _png_fixture():
    """4x3 RGB gradient PNG via the module's own writer."""
    import numpy as np

    from merkonvectordb_spark.operators import media_codec as mc

    px = np.zeros((3, 4, 3), dtype=np.uint8)
    for y in range(3):
        for x in range(4):
            px[y, x] = (10 * x, 20 * y, 5 * x * y)
    return px, mc.encode_png(px)


def test_png_roundtrip_and_all_filter_types():
    import struct
    import zlib

    import numpy as np

    from merkonvectordb_spark.operators import media_codec as mc

    px, blob = _png_fixture()
    got = mc.decode_png(blob)
    assert got.shape == (3, 4, 3)
    assert (got == px).all()

    # exercise every scanline filter type: forward-filter a known image
    # per the spec and hand-assemble the PNG, then decode
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    stride, bpp = 6 * 3, 3
    raw = bytearray()
    for y in range(5):
        ftype = y % 5  # None, Sub, Up, Average, Paeth — one row each
        line = img[y].reshape(-1).astype(np.int32)
        prev = (
            img[y - 1].reshape(-1).astype(np.int32)
            if y > 0
            else np.zeros(stride, dtype=np.int32)
        )
        filt = np.zeros(stride, dtype=np.int32)
        for i in range(stride):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[i] = (line[i] - pred) & 0xFF
        raw += bytes([ftype]) + bytes(filt.astype(np.uint8))

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    blob2 = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    got2 = mc.decode_png(blob2)
    assert (got2 == img).all()


def test_decode_quarantine_keeps_corrupt_rows(spark):
    """ADVICE r6: on_error='quarantine' turns a per-row decode failure
    into an error column instead of a stage failure — the 100 TB
    posture, where a few corrupt blobs must not kill the pass."""
    mm = derive_multimodal(load_table(spark, SF, "documents").limit(5))
    # text bytes are not real PNG/WAV/MP4 — every row quarantines
    rows = decode_content(mm, on_error="quarantine").collect()
    assert len(rows) == 5
    assert all(r.error is not None for r in rows)
    assert all(r.n_bytes is None and r.checksum is None for r in rows)
    # a decodable payload keeps NULL error alongside quarantined peers
    import numpy as np

    from merkonvectordb_spark.operators import media_codec as mc

    good = mc.encode_png(np.full((2, 2, 3), 7, dtype=np.uint8))
    mixed = spark.createDataFrame(
        [(1, "image", bytearray(good)), (2, "image", bytearray(b"junk"))],
        "doc_id LONG, modality STRING, content BINARY",
    )
    out = {r.doc_id: r for r in decode_content(mixed, on_error="quarantine").collect()}
    assert out[1].error is None and out[1].checksum == 7 * 12
    assert out[2].error is not None and out[2].n_bytes is None
    with pytest.raises(ValueError, match="on_error"):
        decode_content(mixed, on_error="skip")


def test_png_rejects_idat_before_ihdr_and_bad_crc():
    """ADVICE r6: IDAT before IHDR must be a clear structural error (it
    used to surface as a size mismatch), and a flipped payload bit must
    fail the chunk CRC, not the scanline reconstruction."""
    import struct
    import zlib

    import pytest as _pytest

    from merkonvectordb_spark.operators import media_codec as mc

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
    idat = chunk(b"IDAT", zlib.compress(b"\x00\x2a"))
    iend = chunk(b"IEND", b"")
    sig = b"\x89PNG\r\n\x1a\n"
    assert mc.decode_png(sig + ihdr + idat + iend)[0, 0, 0] == 0x2A
    with _pytest.raises(ValueError, match="IDAT before IHDR"):
        mc.decode_png(sig + idat + ihdr + iend)
    corrupt = bytearray(sig + ihdr + idat + iend)
    corrupt[len(sig) + 8] ^= 0x01  # flip a bit inside IHDR's payload
    with _pytest.raises(ValueError, match="CRC mismatch"):
        mc.decode_png(bytes(corrupt))


def test_wav_roundtrip_and_mel_features():
    import numpy as np

    from merkonvectordb_spark.operators import media_codec as mc

    t = np.arange(1600) / 16000.0
    sig = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    blob = mc.encode_wav(sig, rate=16000)
    samples, rate = mc.decode_wav(blob)
    assert rate == 16000 and samples.shape == (1600, 1)
    assert abs(samples[:, 0] - sig).max() < 1e-3  # 16-bit quantization

    feats = mc.mel_features(samples, rate, dim=8)
    assert len(feats) == 8 and max(feats) == 1.0
    # a 440 Hz tone concentrates energy in the lowest mel bands
    assert feats.index(1.0) <= 2
    # silence embeds to zeros, not NaNs
    assert mc.mel_features(np.zeros(512), 16000, 8) == [0.0] * 8


def _mp4_fixture(duration_ms=5000, timescale=1000):
    import struct

    def box(btype, payload):
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    mvhd = box(
        b"mvhd",
        b"\x00" * 12 + struct.pack(">II", timescale, duration_ms)
        + b"\x00" * 80,
    )
    hdlr_v = box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12)
    hdlr_s = box(b"hdlr", b"\x00" * 8 + b"soun" + b"\x00" * 12)
    trak_v = box(b"trak", box(b"mdia", hdlr_v))
    trak_s = box(b"trak", box(b"mdia", hdlr_s))
    moov = box(b"moov", mvhd + trak_v + trak_s)
    ftyp = box(b"ftyp", b"isom" + b"\x00" * 4)
    return ftyp + moov


def test_mp4_metadata_parse():
    from merkonvectordb_spark.operators import media_codec as mc

    meta = mc.parse_mp4(_mp4_fixture(duration_ms=5000))
    assert meta["brand"] == "isom"
    assert meta["duration_ms"] == 5000
    assert meta["n_tracks"] == 2
    assert set(meta["handlers"]) == {"vide", "soun"}
    with pytest.raises(ValueError):
        mc.parse_mp4(b"plain text, not a container")


def test_real_media_path_end_to_end(spark):
    """Real PNG/WAV/MP4 bytes through the SAME mapInPandas slots the
    registered queries use: default_decoder checksums come from decoded
    values, and extract_features(encoder='media') embeds each modality
    with its real featurizer."""
    import numpy as np

    from merkonvectordb_spark.operators import media_codec as mc
    from merkonvectordb_spark.operators.multimodal import extract_features

    px, png = _png_fixture()
    t = np.arange(800) / 16000.0
    wav = mc.encode_wav(0.25 * np.sin(2 * np.pi * 220.0 * t), 16000)
    mp4 = _mp4_fixture(duration_ms=7000)
    rows = [
        (1, "image", bytearray(png)),
        (2, "audio", bytearray(wav)),
        (3, "video", bytearray(mp4)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id LONG, modality STRING, content BINARY"
    )

    dec = {r.doc_id: r for r in decode_content(df, default_decoder).collect()}
    assert dec[1].checksum == int(px.astype(np.int64).sum())
    assert dec[2].checksum > 0  # scaled sample magnitude of a real tone
    assert dec[3].checksum == 7000 * 1000 + 2  # duration fold + tracks

    feats = {
        r.doc_id: r.feature
        for r in extract_features(df, dim=8, encoder="media").collect()
    }
    assert all(len(v) == 8 for v in feats.values())
    # image features are mean-luminance blocks in [-1, 1]
    assert all(-1.0 <= x <= 1.0 for x in feats[1])
    # audio: normalized mel bands, peak band == 1
    assert max(feats[2]) == 1.0
    # video: duration/track/handler indicators
    assert feats[3][2] == 1.0 and feats[3][3] == 1.0
    assert abs(feats[3][0] - 7000 / 3_600_000.0) < 1e-9
