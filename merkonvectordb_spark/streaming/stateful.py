"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (the north-star pattern for semantics the
built-in windowed aggregations can't express).

State model (per user): the one OPEN session ``(start_us, last_us,
n_events, sum_value)``.  Each micro-batch folds its (sorted) events into
the open session; a gap > ``gap_sec`` CLOSES the current session — it is
emitted downstream — and opens a new one.  Sessions therefore merge
correctly across micro-batch boundaries, which a per-batch groupBy
cannot do.

Scale notes: state is one fixed-width tuple per active user (not per
event), hash-partitioned by user across executors; Arrow moves each
group's batch rows to Python once.  In production add a state timeout
(``GroupStateTimeout.EventTimeTimeout`` + watermark) so idle users'
sessions flush and their state evicts; the batch twin of this operator
is ``queries_events.q_events_sessionize``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUT_DDL = (
    "user_id LONG, start_us LONG, end_us LONG, n_events LONG, sum_value DOUBLE"
)
_STATE_DDL = "start_us LONG, last_us LONG, n_events LONG, sum_value DOUBLE"


def make_session_fn(gap_sec: int = 1800, event_time_timeout: bool = False):
    gap_us = gap_sec * 1_000_000

    def session_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        cols = ["user_id", "start_us", "end_us", "n_events", "sum_value"]
        if event_time_timeout and state.hasTimedOut:
            # watermark passed the open session's gap deadline: flush it
            start, last, cnt, vsum = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, start, last, cnt, round(vsum, 2))], columns=cols
            )
            return
        if state.exists:
            start, last, cnt, vsum = state.get
        else:
            start = last = None
            cnt, vsum = 0, 0.0
        closed: list[tuple] = []
        # one sort over the WHOLE micro-batch group: the iterator yields
        # Arrow chunks (~10k rows each), and sorting each chunk alone
        # would let an out-of-order event that lands in a later chunk
        # spuriously close/merge sessions across the chunk boundary.
        # Memory bound: this holds ONE KEY's share of ONE micro-batch in
        # executor memory (not all-time history — state carries only the
        # 4-field open-session tuple across batches).  That is the right
        # trade for user-sized keys; a pathological hot key is bounded by
        # micro-batch sizing (maxFilesPerTrigger / maxOffsetsPerTrigger),
        # and a sort-merge of the pre-sorted chunks could replace the
        # concat if per-batch hot-key memory ever matters.
        batch = list(pdfs)
        pdf = (
            pd.concat(batch, ignore_index=True).sort_values(
                ["ts", "event_id"]
            )
            if batch
            else pd.DataFrame(columns=["ts", "value"])
        )
        # cross-batch EARLY events (t more than gap BEFORE the carried
        # session's start — possible only without a watermark, e.g. the
        # NoTimeout backfill mode) belong to their own earlier
        # session(s): merging them would drag the open session's start
        # backwards across a silent super-gap hole the batch twin would
        # split.  The batch is sorted, so they form a prefix; chain-
        # sessionize the prefix standalone and close everything it
        # produces (its sessions END before start - gap by construction,
        # so none can merge with the open one).
        ets = [int(ts.value // 1_000) for ts in pdf["ts"]]
        vals = list(pdf["value"])
        i0 = 0
        if last is not None:
            cut = start - gap_us
            n_early = 0
            while n_early < len(ets) and ets[n_early] < cut:
                n_early += 1
            if n_early:
                es = el = ets[0]
                ec, ev = 1, float(vals[0])
                for j in range(1, n_early):
                    t = ets[j]
                    if t - el > gap_us:
                        closed.append((user_id, es, el, ec, round(ev, 2)))
                        es, el, ec, ev = t, t, 1, float(vals[j])
                    else:
                        el = t
                        ec += 1
                        ev += float(vals[j])
                closed.append((user_id, es, el, ec, round(ev, 2)))
                i0 = n_early
        for t, val in zip(ets[i0:], vals[i0:]):
            if last is None:
                start, last, cnt, vsum = t, t, 1, float(val)
            elif t - last > gap_us:
                closed.append((user_id, start, last, cnt, round(vsum, 2)))
                start, last, cnt, vsum = t, t, 1, float(val)
            else:
                # late-but-within-gap events (t < last across micro-batch
                # boundaries) must never move the session end BACKWARDS —
                # that would shorten the session and set the event-time
                # timeout earlier than true-last + gap (premature flush)
                last = max(last, t)
                start = min(start, t)
                cnt += 1
                vsum += float(val)
        if last is not None:
            state.update((start, last, cnt, vsum))
            if event_time_timeout:
                # flush when the watermark passes last-event + gap (ms)
                state.setTimeoutTimestamp((last + gap_us) // 1_000)
        yield pd.DataFrame(closed, columns=cols)

    return session_fn


def sessionize_stream(
    events: DataFrame,
    gap_sec: int = 1800,
    output_mode: str = "append",
    watermark: str | None = None,
) -> DataFrame:
    """Emit CLOSED sessions as they complete; the open session per user
    lives in state and spans micro-batches.

    With ``watermark`` set (e.g. ``"0 seconds"``), idle users' open
    sessions flush via EventTimeTimeout once the watermark passes their
    gap deadline — the production configuration: state is bounded by
    ACTIVE users, not all users ever seen.  Without it, open sessions
    stay in state forever (fine for tests/back-fills)."""
    timeout = GroupStateTimeout.NoTimeout
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
        timeout = GroupStateTimeout.EventTimeTimeout
    return events.groupBy("user_id").applyInPandasWithState(
        make_session_fn(gap_sec, event_time_timeout=watermark is not None),
        outputStructType=SESSION_OUT_DDL,
        stateStructType=_STATE_DDL,
        outputMode=output_mode,
        timeoutConf=timeout,
    )
