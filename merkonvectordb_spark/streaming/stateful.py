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


def make_session_fn(gap_sec: int = 1800):
    gap_us = gap_sec * 1_000_000

    def session_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start, last, cnt, vsum = state.get
        else:
            start = last = None
            cnt, vsum = 0, 0.0
        closed: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts, val in zip(pdf["ts"], pdf["value"]):
                t = int(ts.value // 1_000)  # pandas ns → µs
                if last is None:
                    start, last, cnt, vsum = t, t, 1, float(val)
                elif t - last > gap_us:
                    closed.append((user_id, start, last, cnt, round(vsum, 2)))
                    start, last, cnt, vsum = t, t, 1, float(val)
                else:
                    last = t
                    cnt += 1
                    vsum += float(val)
        if last is not None:
            state.update((start, last, cnt, vsum))
        yield pd.DataFrame(
            closed,
            columns=["user_id", "start_us", "end_us", "n_events", "sum_value"],
        )

    return session_fn


def sessionize_stream(
    events: DataFrame, gap_sec: int = 1800, output_mode: str = "append"
) -> DataFrame:
    """Emit CLOSED sessions as they complete; the open session per user
    lives in state and spans micro-batches."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_session_fn(gap_sec),
        outputStructType=SESSION_OUT_DDL,
        stateStructType=_STATE_DDL,
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
