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


def test_event_time_timeout_flushes_idle_sessions(spark, tmp_path):
    """Two micro-batches; the watermark from batch 1 must flush users
    whose open sessions passed their gap deadline, at batch 2."""
    import time

    us = 1_000_000
    base = 1_700_000_000 * us  # epoch µs

    def write(path, rows):
        df = spark.createDataFrame(
            [(eid, t * 1000, uid, "t", val, "{}")
             for eid, t, uid, val in rows],  # ts in NANOS (raw file shape)
            "event_id LONG, ts LONG, user_id LONG, event_type STRING, "
            "value DOUBLE, props STRING",
        )
        df.coalesce(1).write.mode("overwrite").parquet(path)

    src = tmp_path / "src"
    src.mkdir()
    # batch 1: user1 two events 10s apart; user2 one event; user99 far in
    # the future (drives the watermark past everyone's gap deadline)
    write(str(src / "f1"), [
        (1, base, 1, 1.0),
        (2, base + 10 * us, 1, 2.0),
        (3, base, 2, 5.0),
        (4, base + 10_000 * us, 99, 0.5),
    ])
    time.sleep(1.1)  # file source orders batches by modification time
    # batch 2: user2 starts a NEW session far later (its own gap break)
    write(str(src / "f2"), [(5, base + 20_000 * us, 2, 7.0)])

    stream = sessionize_stream(
        stream_events(spark, str(src) + "/*", max_files_per_trigger=1),
        gap_sec=GAP,
        watermark="0 seconds",
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sessions_to")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {(r.user_id, r.start_us, r.end_us, r.n_events, r.sum_value)
           for r in spark.table("sessions_to").collect()}
    # every session whose gap deadline the FINAL watermark (base+20000s)
    # passed flushes via timeout — incl. user99, handled by the no-data
    # batch Spark runs after the last data batch.  user2's second
    # session (deadline base+21800s) is the only one still open.
    assert got == {
        (1, base, base + 10 * us, 2, 3.0),
        (2, base, base, 1, 5.0),
        (99, base + 10_000 * us, base + 10_000 * us, 1, 0.5),
    }
