"""Structured Streaming queries that REALLY execute as streams — and
still hash-match a DuckDB oracle.

Each query copies the events parquet into a temp dir (the file source
lists a directory), runs the streaming plan with an ``availableNow``
trigger into a memory sink, and returns the sink table as a batch
DataFrame.  Output is deterministic:

* ``streaming_window_agg`` uses COMPLETE mode — every window emits at
  end-of-input regardless of the watermark, so the result equals the
  batch tumbling-window aggregation exactly;
* ``streaming_sessionize_closed`` (applyInPandasWithState, append mode)
  emits CLOSED sessions only; the closed set — every session except each
  user's last — is invariant to micro-batch boundaries, so the oracle is
  the batch sessionizer minus each user's final session (QUALIFY).

This upgrades the streaming surface from pytest-only (batch ≡ streaming
assertions) to driver-verified oracle entries.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from merkonvectordb_spark.queries_events import SESSION_GAP_SEC
from merkonvectordb_spark.registry import register
from merkonvectordb_spark.streaming import stream_events
from merkonvectordb_spark.streaming.stateful import sessionize_stream


def _staged_events_dir(sf_dir: str, work: str) -> str:
    src = os.path.join(sf_dir, "events.parquet")
    d = os.path.join(work, "src")
    os.makedirs(d, exist_ok=True)
    shutil.copy(src, os.path.join(d, "part-0.parquet"))
    return d


def _run_to_memory(stream_df: DataFrame, mode: str, work: str) -> DataFrame:
    """availableNow → memory sink; returns the sink as a DataFrame.
    Unique sink names keep repeated invocations in one session (bench)
    independent."""
    name = f"strq_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return stream_df.sparkSession.table(name)


@register(
    "streaming_window_agg",
    """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
""".strip(),
)
def q_streaming_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows computed BY THE STREAMING ENGINE
    (readStream file source → windowed agg → availableNow → memory sink),
    hash-checked against the batch SQL.  COMPLETE mode so end-of-input
    emits every window; the production append+watermark variant is
    exercised in tests (its output set depends on the watermark cut,
    which a batch oracle can't mirror exactly)."""
    work = tempfile.mkdtemp(prefix="strq_win_")
    src = _staged_events_dir(sf_dir, work)
    ev = stream_events(spark, src)
    agg = ev.groupBy(
        F.window("ts", "1 hour").getField("start").alias("window_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    return _run_to_memory(agg, "complete", work)


@register(
    "streaming_sessionize_closed",
    f"""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_SEC} * 1000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts) AS session_seq
  FROM flagged
),
rolled AS (
  SELECT user_id, session_seq,
         epoch_us(min(ts)) AS start_us,
         epoch_us(max(ts)) AS end_us,
         count(*) AS n_events,
         round(sum(value), 2) AS sum_value
  FROM sessions GROUP BY user_id, session_seq
)
SELECT user_id, start_us, end_us, n_events, sum_value
FROM rolled
QUALIFY session_seq < max(session_seq) OVER (PARTITION BY user_id)
""".strip(),
)
def q_streaming_sessionize_closed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom stateful operator (applyInPandasWithState gap
    sessionizer) run END TO END as a stream; emits closed sessions.  The
    closed set is batch-boundary-invariant — each user's final session
    stays open in state — so the DuckDB oracle is the batch sessionizer
    QUALIFY-filtered to drop every user's last session."""
    work = tempfile.mkdtemp(prefix="strq_sess_")
    src = _staged_events_dir(sf_dir, work)
    stream = sessionize_stream(
        stream_events(spark, src), gap_sec=SESSION_GAP_SEC
    )
    out = _run_to_memory(stream, "append", work)
    return out.select(
        "user_id", "start_us", "end_us", "n_events", "sum_value"
    )
