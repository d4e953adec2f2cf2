"""time_weighted_avg: exact µs weighting, clipping, exclusion."""

from __future__ import annotations

import datetime as dt

import pytest

from ig_etl_sync_spark.operators.temporal import time_weighted_avg


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


W0, W1 = _ts(10), _ts(20)  # the 10-day window


@pytest.fixture()
def intervals(spark):
    rows = [
        # u1: value 2.0 over days [5,15), value 4.0 over [15,None)
        #   -> in-window: 2.0 for 5 days, 4.0 for 5 days -> twa 3.0
        ("u1", 2.0, _ts(5), _ts(15)),
        ("u1", 4.0, _ts(15), None),
        # u2: single open-ended segment from day 12 -> clipped at day 20
        ("u2", 7.0, _ts(12), None),
        # u3: entirely before the window -> excluded
        ("u3", 9.0, _ts(1), _ts(9)),
        # u4: entirely after the window -> excluded
        ("u4", 9.0, _ts(25), None),
    ]
    return spark.createDataFrame(
        rows, "k string, v double, t_from timestamp, t_to timestamp"
    )


def test_weighted_average_and_clipping(intervals):
    out = {
        r.k: r
        for r in time_weighted_avg(
            intervals, ["k"], "v", "t_from", "t_to", W0, W1
        ).collect()
    }
    day_us = 86_400_000_000
    assert out["u1"].twa == 3.0
    assert out["u1"].covered_us == 10 * day_us
    assert out["u2"].twa == 7.0
    assert out["u2"].covered_us == 8 * day_us
    assert "u3" not in out and "u4" not in out


def test_partial_overlap_weighting(spark):
    # value 1.0 for the first half-day in window, 3.0 for 1.5 days
    rows = [
        ("k", 1.0, _ts(9, 12), _ts(10, 12)),  # 12h inside
        ("k", 3.0, _ts(10, 12), _ts(12)),  # 36h inside
    ]
    df = spark.createDataFrame(
        rows, "k string, v double, t_from timestamp, t_to timestamp"
    )
    out = time_weighted_avg(df, ["k"], "v", "t_from", "t_to", W0, W1).collect()[0]
    assert out.twa == round((1.0 * 12 + 3.0 * 36) / 48, 6)
    assert out.covered_us == 48 * 3_600_000_000


def test_zero_length_segment_excluded(spark):
    rows = [("k", 5.0, _ts(11), _ts(11)), ("k", 2.0, _ts(11), _ts(12))]
    df = spark.createDataFrame(
        rows, "k string, v double, t_from timestamp, t_to timestamp"
    )
    out = time_weighted_avg(df, ["k"], "v", "t_from", "t_to", W0, W1).collect()
    assert len(out) == 1 and out[0].twa == 2.0


def test_single_agg_shuffle(intervals):
    out = time_weighted_avg(intervals, ["k"], "v", "t_from", "t_to", W0, W1)
    import re

    p = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", p)) == 1
    assert "Exchange SinglePartition" not in p


def test_decay_weighted_avg_hand_computed(spark):
    import datetime as dt

    from ig_etl_sync_spark.operators.temporal import decay_weighted_avg

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, 1.0),
        (1, t0.replace(minute=1), 2, 2.0),
        (1, t0.replace(minute=2), 3, 4.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    out = {r.event_id: r.dwa for r in decay_weighted_avg(
        df, "user_id", "ts", "value", "event_id", alpha=0.5, depth=8
    ).collect()}
    W = 1 << 20
    w0, w1, w2 = round(1.0 * W), round(0.5 * W), round(0.25 * W)
    # row 1: only itself
    assert out[1] == (100 * w0) / (w0 * 100)
    # row 2: x=200 w0, lag1=100 w1
    assert out[2] == (200 * w0 + 100 * w1) / ((w0 + w1) * 100)
    # row 3: x=400 w0, 200 w1, 100 w2
    assert out[3] == (400 * w0 + 200 * w1 + 100 * w2) / ((w0 + w1 + w2) * 100)


def test_decay_weighted_avg_constant_series_is_identity(spark):
    import datetime as dt

    from ig_etl_sync_spark.operators.temporal import decay_weighted_avg

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0 + dt.timedelta(minutes=i), i, 7.25) for i in range(12)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    out = decay_weighted_avg(df, "user_id", "ts", "value", "event_id")
    assert all(r.dwa == 7.25 for r in out.collect())
