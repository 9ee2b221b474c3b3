"""applyInPandasWithState sessionization: cross-batch session merging
that a per-batch groupBy cannot express."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from merkonvectordb_spark.schema import load_table
from merkonvectordb_spark.streaming import stream_events
from merkonvectordb_spark.streaming.stateful import sessionize_stream

SF = "/root/testdata/sf0.001"
GAP = 1800


@pytest.fixture()
def events_dir(tmp_path):
    d = tmp_path / "src"
    d.mkdir()
    shutil.copy(f"{SF}/events.parquet", d / "part-0.parquet")
    return str(d)


def _batch_sessions(spark):
    """Ground truth via the batch sessionizer shape."""
    from pyspark.sql import Window

    ev = load_table(spark, SF, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_sess", F.when(gap_us > GAP * 1_000_000, 1).otherwise(0)
    )
    sess = flagged.withColumn("session_seq", F.sum("new_sess").over(w))
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.unix_micros(F.min("ts")).alias("start_us"),
            F.unix_micros(F.max("ts")).alias("end_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def test_stateful_sessions_match_batch_closed_set(spark, events_dir, tmp_path):
    stream = sessionize_stream(stream_events(spark, events_dir), gap_sec=GAP)
    q = (
        stream.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.start_us): (r.end_us, r.n_events, r.sum_value)
        for r in spark.table("sessions_out").collect()
    }

    batch = _batch_sessions(spark)
    # the stream emits CLOSED sessions only: every user's LAST session
    # stays open in state at end-of-input
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("start_us"))
    closed = (
        batch.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") > 1)
        .drop("__rn")
    )
    want = {
        (r.user_id, r.start_us): (r.end_us, r.n_events, r.sum_value)
        for r in closed.collect()
    }
    assert len(got) > 0
    assert got == want
