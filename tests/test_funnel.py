"""Ordered-funnel semantics: strictly-after step matching."""

from __future__ import annotations

import datetime as dt


def _ev(uid, t, typ):
    return (uid, dt.datetime(2024, 1, 1, 0, 0, t), typ)


def test_funnel_requires_strict_order(spark, monkeypatch):
    from merkonvectordb_spark import queries_events as QE

    rows = [
        # u1: full ordered funnel
        _ev(1, 1, "view"), _ev(1, 2, "click"), _ev(1, 3, "purchase"),
        # u2: click BEFORE view — click step must not count
        _ev(2, 5, "click"), _ev(2, 6, "view"),
        # u3: purchase before click — purchase must not count
        _ev(3, 1, "view"), _ev(3, 4, "purchase"), _ev(3, 5, "click"),
        # u4: never viewed
        _ev(4, 1, "click"), _ev(4, 2, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id LONG, ts TIMESTAMP, event_type STRING"
    )
    monkeypatch.setattr(QE, "load_table", lambda s, d, t: df)
    out = {r.step: r.n_users for r in QE.q_events_funnel(spark, "x").collect()}
    assert out == {"view": 3, "click": 2, "purchase": 1}
