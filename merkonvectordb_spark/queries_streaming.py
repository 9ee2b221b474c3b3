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


def _staged_events_dir(sf_dir: str, work: str) -> str:
    src = os.path.join(sf_dir, "events.parquet")
    d = os.path.join(work, "src")
    os.makedirs(d, exist_ok=True)
    shutil.copy(src, os.path.join(d, "part-0.parquet"))
    return d


def _run_to_memory(
    stream_df: DataFrame, mode: str, work: str, state_partitions: int = 8
) -> DataFrame:
    """availableNow → memory sink; returns the sink as a DataFrame.
    Unique sink names keep repeated invocations in one session (bench)
    independent.

    ``state_partitions`` pins the stateful-operator partition count at
    query start (it is then fixed for the checkpoint's lifetime).  It is
    a throughput-sizing dial, not a semantics dial: per micro-batch each
    state partition opens+commits a state store, so the fixture-scale
    floor is partitions × store-overhead — while at production scale you
    size it to hundreds for parallelism.  The session default (32) is
    restored immediately after start so batch plans are unaffected."""
    name = f"strq_{uuid.uuid4().hex[:12]}"
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        # the micro-batch thread reads the conf when it plans each batch,
        # so restore only after the stream has fully terminated
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError(
                "streaming query did not finish within 600s — a partial "
                "memory sink would be silently wrong"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # the sink holds the result in memory; the staged source copy and
    # checkpoint are dead weight once the stream terminated
    shutil.rmtree(work, ignore_errors=True)
    return spark.table(name)


@register(
    "streaming_window_agg",
    """
SELECT epoch_us(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))) AS window_start_us,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
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
    which a batch oracle can't mirror exactly).

    The window start ships as ``unix_micros`` BIGINT (r4 driver red,
    root-caused: a raw TIMESTAMP collects as a naive datetime in the
    HARNESS PROCESS's local zone — `collect()` rendering is a property
    of the collecting process that no session conf pins; every other
    registered query already shipped epochs — house style, cf.
    ``streaming_sessionize_closed``)."""
    work = tempfile.mkdtemp(prefix="strq_win_")
    src = _staged_events_dir(sf_dir, work)
    ev = stream_events(spark, src)
    agg = ev.groupBy(
        F.unix_micros(
            F.window("ts", "1 hour").getField("start")
        ).alias("window_start_us"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias(
            "sum_cents"
        ),
    )
    return _run_to_memory(agg, "complete", work)


@register(
    "streaming_sessionize_closed",
    f"""
WITH ev AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
),
flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= {SESSION_GAP_SEC} * 1000000
              THEN 1 ELSE 0 END AS new_sess
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS session_seq
  FROM flagged
),
rolled AS (
  SELECT user_id, session_seq,
         epoch_us(min(ts)) AS start_us,
         epoch_us(max(ts)) AS end_us,
         count(*) AS n_events,
         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
  FROM sessions GROUP BY user_id, session_seq
)
SELECT user_id, start_us, end_us, n_events, sum_cents
FROM rolled
WHERE end_us + {SESSION_GAP_SEC} * 1000000 <= (SELECT max(epoch_us(ts)) FROM ev)
""".strip(),
)
def q_streaming_sessionize_closed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization BY THE STREAMING ENGINE, emitting closed
    sessions: built-in ``session_window`` aggregation (JVM whole-stage,
    mergeable session state) + a 0-second watermark.  Append mode emits
    a session once the watermark passes its window end (= last event +
    gap), so the closed set is exactly the sessions whose gap deadline
    precedes the stream's max event time — deterministic and mirrored by
    the oracle's WHERE.  Session-merge semantics: an event extends a
    session iff it lands strictly inside (gap >= breaks), hence ``>=``
    in the oracle's new-session flag.

    The Python-side twin (``streaming.stateful.sessionize_stream``,
    applyInPandasWithState) expresses the same fold for semantics the
    built-in can't (custom merge logic, per-session payloads) and is
    oracle-verified separately (``streaming_sessionize_python``).  This
    registered path stays JVM-native — at 100 TB/day prefer the
    built-in whenever it can express the semantics."""
    work = tempfile.mkdtemp(prefix="strq_sess_")
    src = _staged_events_dir(sf_dir, work)
    ev = stream_events(spark, src).withWatermark("ts", "0 seconds")
    sess = ev.groupBy(
        F.session_window("ts", f"{SESSION_GAP_SEC} seconds"),
        "user_id",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias(
            "sum_cents"
        ),
    )
    out_stream = sess.select(
        "user_id",
        F.unix_micros(F.col("session_window.start")).alias("start_us"),
        (
            F.unix_micros(F.col("session_window.end"))
            - F.lit(SESSION_GAP_SEC * 1_000_000)
        ).alias("end_us"),
        "n_events",
        "sum_cents",
    )
    out = _run_to_memory(out_stream, "append", work)
    return out.select(
        "user_id", "start_us", "end_us", "n_events", "sum_cents"
    )


@register(
    "streaming_sessionize_python",
    f"""
WITH ev AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
),
flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_SEC} * 1000000
              THEN 1 ELSE 0 END AS new_sess
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_seq
  FROM flagged
),
rolled AS (
  SELECT user_id, session_seq,
         epoch_us(min(ts)) AS start_us,
         epoch_us(max(ts)) AS end_us,
         count(*) AS n_events,
         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
  FROM sessions GROUP BY user_id, session_seq
)
SELECT user_id, start_us, end_us, n_events, sum_cents
FROM rolled
QUALIFY session_seq < max(session_seq) OVER (PARTITION BY user_id)
""".strip(),
)
def q_streaming_sessionize_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUSTOM stateful operator end-to-end: gap sessionization via
    ``applyInPandasWithState`` (streaming/stateful.py — per-user open
    session in the state store, closed sessions emitted downstream),
    run BY THE STREAMING ENGINE and hash-checked against the batch
    sessionizer.  This is the north-star slot for semantics the built-in
    ``session_window`` can't express (custom merge logic, per-session
    payloads); the JVM-native twin is ``streaming_sessionize_closed``.

    Determinism: values are pre-scaled to integer cents BEFORE the fold
    (the Python accumulator then sums exact integers — no float-order
    hash risk), and with NoTimeout the emitted set is exactly every
    session except each user's LAST (still open in state at end-of-
    input), which the oracle mirrors with a QUALIFY.  The fold's
    cross-batch merge/timeout semantics are pinned function-level in
    ``test_stateful_streaming``; a runtime probe test keeps this path
    skip-marked on runtimes that drop Python micro-batch output."""
    from merkonvectordb_spark.streaming.stateful import sessionize_stream

    work = tempfile.mkdtemp(prefix="strq_pysess_")
    src = _staged_events_dir(sf_dir, work)
    ev = stream_events(spark, src).select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value") * 100).cast("double").alias("value"),
    )
    sess = sessionize_stream(ev, gap_sec=SESSION_GAP_SEC)
    out = _run_to_memory(sess, "append", work)
    return out.select(
        "user_id",
        "start_us",
        "end_us",
        "n_events",
        F.col("sum_value").cast("bigint").alias("sum_cents"),
    )


@register(
    "streaming_stream_join",
    """
SELECT c.event_id AS click_id, v.event_id AS view_id, c.user_id AS user_id
FROM events c
JOIN events v
  ON c.user_id = v.user_id
 AND c.event_type = 'click' AND v.event_type = 'view'
 AND v.ts BETWEEN c.ts - INTERVAL 2 HOUR AND c.ts
""".strip(),
)
def q_streaming_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream self-join executed BY THE STREAMING ENGINE: clicks
    joined to the same user's views in the preceding 2 hours, both sides
    watermarked so state for either stream is purged once event time
    passes watermark + range (that bound is what makes the operator
    viable on an unbounded 100 TB/day stream — without it both join
    buffers grow forever).  The staged source is a single file, so
    availableNow runs ONE micro-batch and the inner-join output equals
    the batch join exactly — hash-checked against the DuckDB twin."""
    work = tempfile.mkdtemp(prefix="strq_join_")
    src = _staged_events_dir(sf_dir, work)
    ev = stream_events(spark, src)
    clicks = (
        ev.where(F.col("event_type") == "click")
        .withWatermark("ts", "1 hour")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .withWatermark("ts", "1 hour")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
    )
    joined = clicks.join(
        views,
        (F.col("c_user") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("c_ts") - F.expr("INTERVAL 2 HOURS"))
        & (F.col("v_ts") <= F.col("c_ts")),
    ).select("click_id", "view_id", F.col("c_user").alias("user_id"))
    return _run_to_memory(joined, "append", work)


@register(
    "streaming_dedup",
    """
SELECT DISTINCT user_id, event_type,
       epoch_us(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))) AS bucket_us
FROM events
""".strip(),
)
def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication: first event per (user, type, hour) via
    dropDuplicates on exactly the key columns — projecting the keys
    BEFORE the dedup means the surviving-row choice (processing-order
    nondeterminism) is invisible, so the streamed output set equals
    DISTINCT.  This is the exact mode (state = one entry per live key,
    never purged); the watermark-bounded production variant
    (dropDuplicatesWithinWatermark, state purged after 1 hour of event
    time) is exercised in tests — on a single-batch fixture both agree."""
    work = tempfile.mkdtemp(prefix="strq_dedup_")
    src = _staged_events_dir(sf_dir, work)
    ev = stream_events(spark, src)
    keys = ev.select(
        "user_id",
        "event_type",
        # window(), not date_trunc(): pure epoch arithmetic, independent
        # of the session zone an external harness might re-pin
        F.unix_micros(F.window("ts", "1 hour").getField("start")).alias(
            "bucket_us"
        ),
    ).dropDuplicates(["user_id", "event_type", "bucket_us"])
    return _run_to_memory(keys, "append", work)


def _staged_events_split(sf_dir: str, work: str, n_files: int = 4) -> str:
    """Stage the events parquet as ``n_files`` row-slices (pyarrow, so
    the TIMESTAMP(NANOS) physical type survives verbatim) — with
    ``maxFilesPerTrigger=1`` the file source then replays the table as
    ``n_files`` distinct micro-batches."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    d = os.path.join(work, "src_split")
    os.makedirs(d, exist_ok=True)
    step = -(-t.num_rows // n_files)
    for i in range(n_files):
        sl = t.slice(i * step, step)
        if sl.num_rows:
            pq.write_table(sl, os.path.join(d, f"part-{i}.parquet"))
    return d


@register(
    "streaming_sketch_distinct",
    """
SELECT 'user_id' AS col_name,
       (SELECT CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
                    ELSE 255.0 * 1152921504606846976.0 / CAST(max(h) AS DOUBLE) END
        FROM (SELECT DISTINCT CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
              FROM events WHERE user_id IS NOT NULL
              ORDER BY h LIMIT 256)) AS est_distinct,
       (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events) AS exact_distinct
""".strip(),
)
def q_streaming_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental distinct-count maintenance: each micro-batch computes
    its bottom-k KMV sketch ON THE EXECUTORS (distributed distinct +
    heap top-k per batch), and the driver folds the k-hash summaries —
    state is k longs, the mergeable-summary contract in its purest
    form.  The oracle computes the sketch over the whole table in one
    shot; the hash match proves fold-over-micro-batches ≡ one-shot,
    i.e. the merge is lossless no matter how the stream is batched.
    The exact count rides along to document sketch accuracy."""
    from merkonvectordb_spark.operators.sketch import kmv_estimate

    k = 256
    work = tempfile.mkdtemp(prefix="strm_kmv_")
    src = _staged_events_split(sf_dir, work, n_files=4)
    ev = stream_events(spark, src, max_files_per_trigger=1)

    state: set[int] = set()

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        from merkonvectordb_spark.operators.sketch import kmv_bottom_k

        batch_hashes = [
            r.h for r in kmv_bottom_k(batch_df, "user_id", k).collect()
        ]
        state.update(batch_hashes)
        if len(state) > k:
            keep = sorted(state)[:k]
            state.clear()
            state.update(keep)

    q = (
        ev.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError("streaming sketch fold did not finish in 600s")
    shutil.rmtree(work, ignore_errors=True)

    sketch = spark.createDataFrame(
        [(h,) for h in sorted(state)[:k]], "h LONG"
    )
    est = kmv_estimate(sketch, k)
    from merkonvectordb_spark.schema import load_table

    exact = load_table(spark, sf_dir, "events").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct")
    )
    return est.crossJoin(F.broadcast(exact)).select(
        F.lit("user_id").alias("col_name"), "est_distinct", "exact_distinct"
    )


@register(
    "streaming_cms_freq",
    """
WITH cells AS (
  SELECT r AS row_id,
         list_reduce(list_transform(regexp_split_to_array(
           substr(md5('cms' || CAST(r AS VARCHAR) || ':'
                      || CAST(user_id AS VARCHAR)), 1, 15), ''),
           ch -> CAST(strpos('0123456789abcdef', ch) AS BIGINT) - 1),
           (acc, d) -> acc * 16 + d) % 64 AS col_id
  FROM events, unnest([0, 1, 2, 3]) AS t(r)
),
sketch AS (
  SELECT row_id, col_id, CAST(count(*) AS BIGINT) AS cnt
  FROM cells GROUP BY row_id, col_id
),
probes AS (SELECT DISTINCT user_id FROM events WHERE user_id < 10),
pcells AS (
  SELECT user_id AS probe, r AS row_id,
         list_reduce(list_transform(regexp_split_to_array(
           substr(md5('cms' || CAST(r AS VARCHAR) || ':'
                      || CAST(user_id AS VARCHAR)), 1, 15), ''),
           ch -> CAST(strpos('0123456789abcdef', ch) AS BIGINT) - 1),
           (acc, d) -> acc * 16 + d) % 64 AS col_id
  FROM probes, unnest([0, 1, 2, 3]) AS t(r)
)
SELECT probe, CAST(min(COALESCE(s.cnt, 0)) AS BIGINT) AS est_count
FROM pcells LEFT JOIN sketch s USING (row_id, col_id)
GROUP BY probe
""".strip(),
)
def q_streaming_cms_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental count-min maintenance: each micro-batch builds its
    d×w counter grid on the executors, and the driver folds the grids
    by CELL ADDITION — state is ≤ d·w longs regardless of stream
    length.  The oracle builds the sketch over the whole table in one
    shot; the hash match proves fold-over-micro-batches ≡ one-shot
    (counter merge is exact, not approximate — the approximation lives
    only in the grid width)."""
    from collections import defaultdict

    from merkonvectordb_spark.operators.sketch import (
        CMS_DEPTH,
        CMS_WIDTH,
        cms_build,
        cms_estimate,
    )

    work = tempfile.mkdtemp(prefix="strm_cms_")
    src = _staged_events_split(sf_dir, work, n_files=4)
    ev = stream_events(spark, src, max_files_per_trigger=1)

    state: dict[tuple[int, int], int] = defaultdict(int)

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        for r in cms_build(batch_df, "user_id").collect():
            state[(r.row_id, r.col_id)] += r.cnt

    q = (
        ev.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError("streaming CMS fold did not finish in 600s")
    shutil.rmtree(work, ignore_errors=True)

    sketch = spark.createDataFrame(
        [(rc[0], rc[1], n) for rc, n in sorted(state.items())],
        "row_id INT, col_id LONG, cnt LONG",
    )
    from merkonvectordb_spark.schema import load_table

    probes = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id") < 10)
        .select("user_id")
        .distinct()
    )
    return cms_estimate(
        sketch, probes, "user_id", CMS_DEPTH, CMS_WIDTH
    )


@register(
    "streaming_expectations",
    """
SELECT 'not_null' AS check_name, 'events.user_id' AS target,
       count(*) FILTER (WHERE user_id IS NULL) AS violations,
       count(*) AS total,
       count(*) FILTER (WHERE user_id IS NULL) <= 0 AS passed
FROM events
UNION ALL
SELECT 'in_set', 'events.event_type{click,error,purchase,signup,view}',
       count(*) FILTER (WHERE event_type IS NOT NULL AND event_type
         NOT IN ('click','error','purchase','signup','view')),
       count(*),
       count(*) FILTER (WHERE event_type IS NOT NULL AND event_type
         NOT IN ('click','error','purchase','signup','view')) <= 0
FROM events
UNION ALL
SELECT 'between', 'events.value[0,100000]',
       count(*) FILTER (WHERE value IS NOT NULL
                          AND (value < 0 OR value > 100000)),
       count(*),
       count(*) FILTER (WHERE value IS NOT NULL
                          AND (value < 0 OR value > 100000))
         <= 5000 * count(*) // 1000000
FROM events
""".strip(),
)
def q_streaming_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental data-quality monitoring: each micro-batch runs the
    row-local expectation arms (`operators.expectations`) ON THE
    EXECUTORS and the driver folds (violations, total) counter pairs —
    validation state is |checks|×2 longs, mergeable by addition, the
    same distributive-summary contract as the streaming sketches.  The
    pass/fail verdicts are re-derived from the FOLDED totals with the
    same integer-ppm arithmetic, so a threshold decision is made on the
    stream's lifetime counts, never per batch.  The oracle validates
    the whole table in one shot; the hash match proves
    fold-over-micro-batches ≡ one-shot, i.e. a continuously-validated
    ingest reports exactly what a batch audit of the accumulated table
    would."""
    from merkonvectordb_spark.operators import expectations as E

    checks = [
        E.not_null("user_id"),
        E.in_set(
            "event_type", ["click", "error", "purchase", "signup", "view"]
        ),
        E.between("value", 0, 100000, max_violation_ppm=5000),
    ]
    work = tempfile.mkdtemp(prefix="strm_expect_")
    src = _staged_events_split(sf_dir, work, n_files=4)
    ev = stream_events(spark, src, max_files_per_trigger=1)

    # folded state: (check_name, target) -> [violations, total]
    state: dict[tuple[str, str], list[int]] = {}

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        rows = E.check_expectations(
            batch_df, checks, table="events"
        ).collect()
        for r in rows:
            acc = state.setdefault((r["check_name"], r["target"]), [0, 0])
            acc[0] += r["violations"]
            acc[1] += r["total"]

    q = (
        ev.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError("streaming expectations did not finish in 600s")
    shutil.rmtree(work, ignore_errors=True)

    ppm = {f"events.{c.target}": c.max_violation_ppm for c in checks}
    out = [
        (kind, tgt, v, t, v <= t * ppm[tgt] // 1_000_000)
        for (kind, tgt), (v, t) in sorted(state.items())
    ]
    return spark.createDataFrame(out, E.REPORT_DDL)


# ---------------------------------------------------------------------------
# Streaming PSI drift monitoring: the batch monitor's streaming twin.
# Edges are the "trained offline" artifact (reference-half deciles,
# computed once in batch); each micro-batch assigns its rows on the
# executors and the driver folds (type, is_ref, bin) counters —
# |types|×2×10 longs of monitoring state, mergeable by addition.  The
# verdict re-runs the IDENTICAL report arithmetic on the folded
# counts, so fold-over-micro-batches ≡ the one-shot batch monitor and
# the SAME oracle hash must match.
# ---------------------------------------------------------------------------


from merkonvectordb_spark.queries_events import _PSI_ORACLE  # noqa: E402


@register("streaming_psi_drift", _PSI_ORACLE)
def q_streaming_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous feature-drift monitoring: reference decile edges
    broadcast to every micro-batch, bin counts folded on the driver
    (distributive state, the streaming-sketch contract), PSI verdicts
    derived from lifetime totals through the shared `_psi_report`
    arithmetic — never per batch, so alarms don't flap on small
    batches.  Hash-matching `events_psi_drift`'s oracle proves the
    incremental path reports exactly what the batch audit would."""
    from merkonvectordb_spark.queries_events import (
        _PSI_SPLIT_US,
        _psi_edges,
        _psi_report,
        psi_assign_bins,
    )
    from merkonvectordb_spark.schema import load_table

    split = F.unix_micros(F.col("ts")) < F.lit(_PSI_SPLIT_US)
    batch_ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", "value", split.alias("is_ref"))
    )
    edges = _psi_edges(batch_ev).localCheckpoint(eager=True)

    work = tempfile.mkdtemp(prefix="strm_psi_")
    src = _staged_events_split(sf_dir, work, n_files=4)
    ev = stream_events(spark, src, max_files_per_trigger=1)

    # folded monitoring state: (event_type, bin) -> [cr, cc]
    state: dict[tuple[str, int], list[int]] = {}

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.where(F.col("value").isNotNull()).select(
            "event_type",
            "value",
            (F.unix_micros(F.col("ts")) < F.lit(_PSI_SPLIT_US)).alias(
                "is_ref"
            ),
        )
        rows = (
            psi_assign_bins(b, edges)
            .groupBy("event_type", "bin")
            .agg(
                F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("cr"),
                F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).alias("cc"),
            )
            .collect()
        )
        for r in rows:
            acc = state.setdefault((r["event_type"], r["bin"]), [0, 0])
            acc[0] += r["cr"]
            acc[1] += r["cc"]

    q = (
        ev.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError("streaming psi drift did not finish in 600s")
    shutil.rmtree(work, ignore_errors=True)

    counts = spark.createDataFrame(
        [(t, b, cr, cc) for (t, b), (cr, cc) in sorted(state.items())],
        "event_type STRING, bin INT, cr LONG, cc LONG",
    )
    types = counts.select("event_type").distinct()
    return _psi_report(counts, types)


from merkonvectordb_spark.queries_events import (  # noqa: E402
    _CUSUM_ORACLE,
)


@register("streaming_cusum_changepoint", _CUSUM_ORACLE)
def q_streaming_cusum_changepoint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Continuous changepoint monitoring: per-micro-batch daily event
    counts folded on the driver ((type, day) -> count is DISTRIBUTIVE
    state — per-batch counts merge by addition), then the shared CUSUM
    tail (`queries_events.cusum_from_daily`) over the folded
    |types|x|days| frame.  Hash-matching the batch oracle proves the
    incremental path reports exactly the trajectory a one-shot audit
    would — the streaming-sketch contract applied to changepoint
    detection."""
    from merkonvectordb_spark.queries_events import cusum_from_daily

    work = tempfile.mkdtemp(prefix="strm_cusum_")
    src = _staged_events_split(sf_dir, work, n_files=4)
    ev = stream_events(spark, src, max_files_per_trigger=1)

    state: dict[tuple[str, int], int] = {}

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        rows = (
            batch_df.select(
                "event_type",
                F.expr("unix_micros(ts) div 86400000000").alias("day"),
            )
            .groupBy("event_type", "day")
            .agg(F.count(F.lit(1)).alias("x"))
            .collect()
        )
        for r in rows:
            key = (r["event_type"], r["day"])
            state[key] = state.get(key, 0) + r["x"]

    q = (
        ev.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError("streaming cusum did not finish in 600s")
    shutil.rmtree(work, ignore_errors=True)

    daily = spark.createDataFrame(
        [(t, d, x) for (t, d), x in sorted(state.items())],
        "event_type STRING, day LONG, x LONG",
    )
    return cusum_from_daily(daily)
