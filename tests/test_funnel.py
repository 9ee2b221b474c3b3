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


def test_psi_drift_flags_planted_shift(spark, tmp_path):
    """Identical ref/cur distributions → PSI ≈ 0, no drift; a full
    +100 location shift → every current row lands in the top bin →
    PSI far above the 0.2 alarm."""
    from datetime import datetime, timezone

    from merkonvectordb_spark.queries_events import q_events_psi_drift

    def ts(day):
        return datetime(2024, 1, day, 12, 0, 0)

    rows = []
    eid = 0
    for v in range(100):
        for day, off in ((5, 0.0), (20, 0.0)):
            rows.append((eid, ts(day), eid % 7, "stable", v + off, "{}"))
            eid += 1
        for day, off in ((5, 0.0), (20, 100.0)):
            rows.append((eid, ts(day), eid % 7, "shifted", v + off, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {r.event_type: r for r in q_events_psi_drift(spark, str(tmp_path)).collect()}
    assert got["stable"].n_ref == 100 and got["stable"].n_cur == 100
    assert abs(got["stable"].psi) < 0.01
    assert not got["stable"].drift
    assert got["shifted"].psi > 1.0
    assert got["shifted"].drift


def test_psi_drift_reports_brand_new_event_type(spark, tmp_path):
    """A type with ZERO reference rows (first emitted after the split)
    is maximal drift — it must appear in the report (single-bucket
    fallback), not vanish through an inner edge join."""
    from datetime import datetime

    from merkonvectordb_spark.queries_events import q_events_psi_drift

    rows = []
    for v in range(50):
        rows.append((v, datetime(2024, 1, 5, 12), v % 7, "old", float(v), "{}"))
        rows.append((1000 + v, datetime(2024, 1, 20, 12), v % 7, "old", float(v), "{}"))
        rows.append((2000 + v, datetime(2024, 1, 20, 12), v % 7, "brand_new", float(v), "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {r.event_type: r for r in q_events_psi_drift(spark, str(tmp_path)).collect()}
    assert "brand_new" in got
    assert got["brand_new"].n_ref == 0 and got["brand_new"].n_cur == 50
    assert got["brand_new"].drift


def test_cusum_detects_planted_level_shift(spark):
    """CUSUM semantics on synthetic daily volumes: flat 50/day for 20
    days, then a +25/day shift — the alarm must fire shortly after the
    shift and never before it; a no-shift series must never alarm."""
    import datetime

    from merkonvectordb_spark.queries_events import (
        CUSUM_H,
        CUSUM_K,
        q_events_cusum_changepoint,
    )
    import merkonvectordb_spark.queries_events as QE
    from merkonvectordb_spark.schema import load_table
    import os, tempfile

    def synth(counts):
        rows = []
        eid = 0
        base = datetime.datetime(2024, 3, 1)
        for day, n in enumerate(counts):
            for i in range(n):
                rows.append(
                    (
                        eid,
                        base + datetime.timedelta(days=day, seconds=i),
                        1,
                        "shift",
                        1.0,
                        "{}",
                    )
                )
                eid += 1
        return spark.createDataFrame(
            rows,
            "event_id LONG, ts TIMESTAMP, user_id LONG, "
            "event_type STRING, value DOUBLE, props STRING",
        )

    with tempfile.TemporaryDirectory() as tmp:
        # 20 quiet days then 10 shifted days (+25 > K=10 allowance)
        shifted = [50] * 20 + [75] * 10
        synth(shifted).write.parquet(os.path.join(tmp, "events.parquet"))
        out = sorted(
            q_events_cusum_changepoint(spark, tmp).collect(),
            key=lambda r: r.day,
        )
        alarms = [i for i, r in enumerate(out) if r.alarm]
        # mean = 58.3; excess past mean+K is ~6.6/day pre-shift (S drifts
        # down, clamped at 0) and ~+6.6/day post-shift: alarm fires in
        # the shifted window only
        assert alarms and min(alarms) >= 20, (alarms,)
        # monotone S growth across the shifted run once it starts
        post = [r.s_scaled for r in out[20:]]
        assert post == sorted(post)

    with tempfile.TemporaryDirectory() as tmp:
        synth([50] * 30).write.parquet(os.path.join(tmp, "events.parquet"))
        out = q_events_cusum_changepoint(spark, tmp).collect()
        assert not any(r.alarm for r in out)
        # flat series at exactly the mean: deviations are -K*D every
        # day, S clamps to 0 via the running-min identity
        assert all(r.s_scaled == 0 for r in sorted(out, key=lambda r: r.day)[1:])


def test_last_touch_attribution_semantics(spark):
    """Planted journeys: credit goes to the most recent PRECEDING
    non-purchase within 7 days; outside the lookback or with no prior
    touch it's 'direct'; later events never attribute backwards."""
    import datetime
    import os
    import tempfile

    from merkonvectordb_spark.queries_events import (
        q_events_last_touch_attribution,
    )

    t0 = datetime.datetime(2024, 3, 10, 12, 0, 0)

    def ev(eid, uid, ty, dt_sec):
        return (eid, t0 + datetime.timedelta(seconds=dt_sec), uid, ty, 1.0, "{}")

    rows = [
        # u1: view -> (100s) -> purchase          => view, lag 100s
        ev(1, 1, "view", 0), ev(2, 1, "purchase", 100),
        # u2: click -> 8 days -> purchase          => direct (outside 7d)
        ev(3, 2, "click", 0), ev(4, 2, "purchase", 8 * 86400),
        # u3: purchase with NO prior event         => direct
        ev(5, 3, "purchase", 0),
        # u3: a view AFTER the purchase must not attribute backwards
        ev(6, 3, "view", 10),
        # u4: click -> purchase -> purchase: both credit the click
        # (last non-purchase touch persists across the first purchase)
        ev(7, 4, "click", 0), ev(8, 4, "purchase", 50),
        ev(9, 4, "purchase", 60),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, "
        "event_type STRING, value DOUBLE, props STRING",
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "events.parquet"))
        got = {
            r.touch_type: (r.n_purchases, r.sum_lag_us)
            for r in q_events_last_touch_attribution(spark, tmp).collect()
        }
    assert got["view"] == (1, 100 * 1_000_000)
    assert got["click"] == (2, (50 + 60) * 1_000_000)
    assert got["direct"] == (2, 0)


def test_rfm_segments_hand_computed(spark):
    """6 planted users, terciles of 2: best recency/frequency/monetary
    must land in tile 1; segment rollup counts must partition the
    users."""
    import datetime
    import os
    import tempfile

    from merkonvectordb_spark.queries_events import q_user_rfm_segments

    t0 = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    # user u: f_u events, last event at day u, each worth u dollars
    # => recency order: u6 best; frequency order: u6 (6 events) best;
    #    monetary: u6 (6 events x $6) best — u6 is (1,1,1), u1 is (3,3,3)
    for u in range(1, 7):
        for i in range(u):
            rows.append(
                (
                    eid,
                    t0 + datetime.timedelta(days=u, seconds=i),
                    u,
                    "view",
                    float(u),
                    "{}",
                )
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, "
        "event_type STRING, value DOUBLE, props STRING",
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "events.parquet"))
        segs = q_user_rfm_segments(spark, tmp).collect()
    got = {(r.r_tile, r.f_tile, r.m_tile): (r.n_users, r.sum_cents) for r in segs}
    # all three metrics order users identically (u6 > u5 > ... > u1),
    # so the only populated segments are the diagonal
    assert got == {
        (1, 1, 1): (2, 6 * 600 + 5 * 500),
        (2, 2, 2): (2, 4 * 400 + 3 * 300),
        (3, 3, 3): (2, 2 * 200 + 1 * 100),
    }
    assert sum(n for n, _ in got.values()) == 6


def test_ab_test_report_matches_scipy_free_reference(spark):
    """Planted conversions: variant A (even users) converts 2/10,
    variant B (odd users) 8/10 — z must match the closed-form pooled
    two-proportion statistic and flag significance; a no-conversion
    corpus yields NULL z and significant=NULL (no division blow-up)."""
    import datetime
    import math
    import os
    import tempfile

    from merkonvectordb_spark.queries_events import q_events_ab_test_report

    t0 = datetime.datetime(2024, 3, 1)

    def corpus(conv_even, conv_odd):
        rows = []
        eid = 0
        for u in range(20):
            rows.append((eid, t0, u, "view", 1.0, "{}")); eid += 1
            conv = conv_even if u % 2 == 0 else conv_odd
            if (u // 2) < conv:
                rows.append((eid, t0, u, "purchase", 1.0, "{}")); eid += 1
        return spark.createDataFrame(
            rows,
            "event_id LONG, ts TIMESTAMP, user_id LONG, "
            "event_type STRING, value DOUBLE, props STRING",
        )

    with tempfile.TemporaryDirectory() as tmp:
        corpus(2, 8).write.parquet(os.path.join(tmp, "events.parquet"))
        r = q_events_ab_test_report(spark, tmp).collect()[0]
    assert (r.n_a, r.c_a, r.n_b, r.c_b) == (10, 2, 10, 8)
    p = 10 / 20
    want = (0.8 - 0.2) / math.sqrt(p * (1 - p) * (1 / 10 + 1 / 10))
    assert abs(r.z_score - want) < 1e-6
    assert r.significant is True  # z ~ 2.68 > 1.96

    with tempfile.TemporaryDirectory() as tmp:
        corpus(0, 0).write.parquet(os.path.join(tmp, "events.parquet"))
        r = q_events_ab_test_report(spark, tmp).collect()[0]
    assert r.z_score is None and r.significant is None
    assert (r.rate_a, r.rate_b) == (0.0, 0.0)


def test_first_touch_attribution_semantics(spark):
    """First-touch credits the EARLIEST non-purchase within the 7-day
    lookback: a journey view -> click -> purchase credits the VIEW
    (last-touch credits the click); a touch older than 7 days is out
    of window even when a later one exists."""
    import datetime
    import os
    import tempfile

    from merkonvectordb_spark.queries_events import (
        q_events_first_touch_attribution,
        q_events_last_touch_attribution,
    )

    t0 = datetime.datetime(2024, 3, 10, 12, 0, 0)

    def ev(eid, uid, ty, dt_sec):
        return (eid, t0 + datetime.timedelta(seconds=dt_sec), uid, ty, 1.0, "{}")

    rows = [
        # u1: view -> click -> purchase: first credits view, last the click
        ev(1, 1, "view", 0), ev(2, 1, "click", 50), ev(3, 1, "purchase", 100),
        # u2: view 8 days before, click 10s before -> first-touch = click
        # (the view is outside the window; lookback filters BEFORE the min)
        ev(4, 2, "view", -8 * 86400), ev(5, 2, "click", -10),
        ev(6, 2, "purchase", 0),
        # u3: nothing prior -> direct
        ev(7, 3, "purchase", 0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, "
        "event_type STRING, value DOUBLE, props STRING",
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "events.parquet"))
        first = {
            r.touch_type: (r.n_purchases, r.sum_lag_us)
            for r in q_events_first_touch_attribution(spark, tmp).collect()
        }
        last = {
            r.touch_type: r.n_purchases
            for r in q_events_last_touch_attribution(spark, tmp).collect()
        }
    assert first["view"] == (1, 100 * 1_000_000)  # u1 credits the view
    assert first["click"] == (1, 10 * 1_000_000)  # u2: 8-day view excluded
    assert first["direct"] == (1, 0)
    # same journeys under last-touch: u1 credits the click instead
    assert last == {"click": 2, "direct": 1}


def test_ewma_anomalies_flag_planted_spike(spark):
    """Flat 50/day with one 3x spike: only the spike day may alarm, the
    first day has no history (NULL pred), and the spike must not drag
    the forecast enough to flag its neighbors."""
    import datetime
    import os
    import tempfile

    from merkonvectordb_spark.queries_events import q_events_ewma_anomalies

    t0 = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    counts = [50] * 30
    counts[20] = 150  # the spike
    for day, n in enumerate(counts):
        for i in range(n):
            rows.append(
                (
                    eid,
                    t0 + datetime.timedelta(days=day, seconds=i),
                    1,
                    "spike",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, "
        "event_type STRING, value DOUBLE, props STRING",
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "events.parquet"))
        out = sorted(
            q_events_ewma_anomalies(spark, tmp).collect(),
            key=lambda r: r.day,
        )
    assert out[0].ewma_pred is None and out[0].anomaly is None
    flagged = [i for i, r in enumerate(out) if r.anomaly]
    # the spike flags; day 21 may too (two-sided detection: the spike
    # inflates the forecast, making the normal day anomalously LOW —
    # textbook EWMA behavior); nothing before the spike may flag
    assert 20 in flagged and set(flagged) <= {20, 21}, flagged
    # forecast recovers: by a few days after the spike, pred is near 50
    assert abs(out[27].ewma_pred - 50.0) < 15.0
