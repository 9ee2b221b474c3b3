"""Structured Streaming tests: batch ≡ streaming for the windowed agg,
and foreachBatch → VectorStore upsert (incl. replay idempotence)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from merkonvectordb_spark.schema import load_table
from merkonvectordb_spark.sources.vector_store import VectorStore
from merkonvectordb_spark.streaming import (
    foreach_batch_upsert,
    stream_events,
    windowed_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events_dir(tmp_path):
    d = tmp_path / "events_src"
    d.mkdir()
    shutil.copy(f"{SF}/events.parquet", d / "part-0.parquet")
    return str(d)


def test_windowed_counts_matches_batch(spark, events_dir, tmp_path):
    stream = windowed_counts(stream_events(spark, events_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table("win_counts").collect()
    }
    ev = load_table(spark, SF, "events")
    want = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in ev.groupBy(
            F.window("ts", "1 hour").getField("start").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .collect()
    }
    assert got == want and len(got) > 0


def _event_records(df):
    """events → vector-store records (collection per event_type)."""
    return df.select(
        F.concat(F.lit("ev_"), F.col("event_type")).alias("collection"),
        F.col("event_id").cast("string").alias("key"),
        F.col("props").alias("metadata"),
        F.lit(None).cast("array<float>").alias("embedding"),
        F.col("ts"),
    )


def test_foreach_batch_upsert_idempotent(spark, events_dir, tmp_path):
    store = VectorStore(spark, str(tmp_path / "store"))
    total = 1000  # sf0.001 events rows

    def do_upsert(batch_df):
        store.upsert(_event_records(batch_df), key_from_metadata=False)

    q = foreach_batch_upsert(
        _event_records(stream_events(spark, events_dir)),
        lambda b: store.upsert(b, key_from_metadata=False),
        str(tmp_path / "ckpt1"),
    )
    q.awaitTermination(180)
    assert store.vectors().count() == total

    # replaying the same data through a fresh checkpoint re-upserts every
    # key — the store must not grow (upsert, not append)
    q2 = foreach_batch_upsert(
        _event_records(stream_events(spark, events_dir)),
        lambda b: store.upsert(b, key_from_metadata=False),
        str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(180)
    assert store.vectors().count() == total
    # spot-check one record kept its payload
    row = store.vectors().where(F.col("key") == "0").first()
    assert row is not None and row.metadata.startswith("{")


def test_dedup_within_watermark_matches_exact(spark, events_dir, tmp_path):
    """dropDuplicatesWithinWatermark (bounded state — the production
    mode for unbounded streams) must agree with exact DISTINCT when all
    data lands in one micro-batch."""
    keys = ["user_id", "event_type", "bucket_ts"]
    proj = (
        stream_events(spark, events_dir)
        .withWatermark("ts", "1 hour")
        .select(
            "user_id", "event_type", F.date_trunc("hour", "ts").alias("bucket_ts"), "ts"
        )
    )
    q = (
        proj.dropDuplicatesWithinWatermark(keys)
        .select(*keys)
        .writeStream.format("memory")
        .queryName("dedup_wm_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_wm"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {tuple(r) for r in spark.table("dedup_wm_test").collect()}
    want = {
        tuple(r)
        for r in load_table(spark, SF, "events")
        .select("user_id", "event_type", F.date_trunc("hour", "ts").alias("bucket_ts"))
        .distinct()
        .collect()
    }
    assert got == want


def test_stream_stream_join_matches_batch(spark, events_dir, tmp_path):
    """Watermarked stream-stream self-join (clicks ⋈ same-user views in
    the trailing 2 h) equals the batch join on a one-batch source."""
    ev = stream_events(spark, events_dir)
    clicks = (
        ev.where(F.col("event_type") == "click")
        .withWatermark("ts", "1 hour")
        .select(F.col("event_id").alias("cid"), F.col("user_id").alias("cu"),
                F.col("ts").alias("cts"))
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .withWatermark("ts", "1 hour")
        .select(F.col("event_id").alias("vid"), F.col("user_id").alias("vu"),
                F.col("ts").alias("vts"))
    )
    cond = (
        (F.col("cu") == F.col("vu"))
        & (F.col("vts") >= F.col("cts") - F.expr("INTERVAL 2 HOURS"))
        & (F.col("vts") <= F.col("cts"))
    )
    q = (
        clicks.join(views, cond)
        .select("cid", "vid")
        .writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {tuple(r) for r in spark.table("ssj_test").collect()}

    bev = load_table(spark, SF, "events")
    bc = bev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"), F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    bv = bev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("vid"), F.col("user_id").alias("vu"), F.col("ts").alias("vts")
    )
    want = {tuple(r) for r in bc.join(bv, cond).select("cid", "vid").collect()}
    assert got == want


def test_windowed_counts_append_mode_with_watermark(spark, events_dir, tmp_path):
    """Append mode REQUIRES the watermark to survive into the grouping
    key: grouping by window(...).getField('start') strips it and the
    query throws STREAMING_OUTPUT_MODE.UNSUPPORTED_OPERATION; grouping
    by the window struct keeps it, windows close as the watermark
    passes, and state is evictable."""
    stream = windowed_counts(
        stream_events(spark, events_dir), watermark="0 seconds"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("win_counts_append")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_app"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("win_counts_append").collect()
    # every window strictly before the final max event time is closed
    assert len(rows) > 0
