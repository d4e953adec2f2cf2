"""As-of and range joins (operators/temporal.py)."""

from __future__ import annotations

import datetime as dt

import pytest

from ig_etl_sync_spark.operators.temporal import as_of_join, range_join

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def ts(sec):
    return T0 + dt.timedelta(seconds=sec)


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [(1, ts(0), 10.0), (1, ts(10), 11.0), (1, ts(20), 12.0), (2, ts(5), 99.0)],
        "sym int, ts timestamp, px double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [(1, ts(5), "t1"), (1, ts(10), "t2"), (1, ts(25), "t3"),
         (2, ts(1), "t4"), (3, ts(9), "t5")],
        "sym int, ts timestamp, trade_id string",
    )


def test_as_of_join_semantics(spark, quotes, trades):
    got = {
        r["trade_id"]: r["px_r"]
        for r in as_of_join(trades, quotes, on="sym").collect()
    }
    assert got["t1"] == 10.0  # latest quote <= t+5 is px 10
    assert got["t2"] == 11.0  # INCLUSIVE: quote at exactly t+10 matches
    assert got["t3"] == 12.0
    assert got["t4"] is None  # quote for sym 2 is later than the trade
    assert got["t5"] is None  # no quotes for sym 3 at all (left semantics)


def test_as_of_join_carries_right_ts(spark, quotes, trades):
    rows = {r["trade_id"]: r["ts_r"] for r in as_of_join(trades, quotes, on="sym").collect()}
    assert rows["t2"] == ts(10)


def test_as_of_join_forward_semantics(spark, quotes, trades):
    """Forward as-of: earliest quote at-or-after each trade, inclusive."""
    got = {
        r["trade_id"]: (r["px_r"], r["ts_r"])
        for r in as_of_join(trades, quotes, on="sym", direction="forward").collect()
    }
    # trade t1@5 → quote@10 (11.0); t2@10 → quote@10 inclusive (11.0);
    # t3@25 → no later quote → NULLs; t4@1 (sym 2) → quote@5 (99.0);
    # t5 sym 3 → no quotes at all.
    assert got["t1"] == (11.0, ts(10))
    assert got["t2"] == (11.0, ts(10))
    assert got["t3"] == (None, None)
    assert got["t4"] == (99.0, ts(5))
    assert got["t5"] == (None, None)


def test_as_of_join_rejects_bad_direction(spark, quotes, trades):
    with pytest.raises(ValueError, match="direction"):
        as_of_join(trades, quotes, on="sym", direction="nearest")


def test_range_join_inclusive_bounds(spark):
    left = spark.createDataFrame([(1, "L", ts(100))], "k int, lid string, ts timestamp")
    right = spark.createDataFrame(
        [(1, ts(99)), (1, ts(100)), (1, ts(40)), (1, ts(-201)), (1, ts(-200)), (2, ts(100))],
        "k int, ts timestamp",
    )
    got = sorted(
        r["ts_r"]
        for r in range_join(left, right, on="k", lower_sec=-300, upper_sec=0).collect()
    )
    # window = [ts(100)-300, ts(100)] = [ts(-200), ts(100)], both ends
    # inclusive; ts(-201) is 301s before → out; sym 2 row → out.
    assert got == [ts(-200), ts(40), ts(99), ts(100)]


def test_range_join_pre_1970_matches_naive(spark):
    """Negative-µs (pre-1970) timestamps: floor-based bin ids must keep
    the bucketed join ≡ the naive inequality join. (A truncating cast
    doubles bin 0's width across the epoch — floor keeps bins uniform.)"""
    import pyspark.sql.functions as F

    epoch = dt.datetime(1970, 1, 1)
    rows_l = [(1, i, epoch + dt.timedelta(seconds=s))
              for i, s in enumerate([-7200, -3601, -3600, -1, 0, 1, 3599, 7200])]
    rows_r = [(1, 100 + i, epoch + dt.timedelta(seconds=s))
              for i, s in enumerate([-7201, -5400, -3600, -600, 0, 600, 3600, 9000])]
    left = spark.createDataFrame(rows_l, "k int, lid int, ts timestamp")
    right = spark.createDataFrame(rows_r, "k int, rid int, ts timestamp")
    fast = range_join(left, right, on="k", lower_sec=-1800, upper_sec=1800)
    naive = left.join(
        right.select("k", F.col("rid").alias("rid_r"), F.col("ts").alias("ts_r")), "k"
    ).where(
        (F.unix_micros("ts_r") >= F.unix_micros("ts") - 1800 * 1_000_000)
        & (F.unix_micros("ts_r") <= F.unix_micros("ts") + 1800 * 1_000_000)
    )
    f = {(r["lid"], r["rid_r"]) for r in fast.collect()}
    n = {(r["lid"], r["rid_r"]) for r in naive.collect()}
    assert f == n and len(f) > 0


def test_range_join_rejects_inverted_bounds(spark, quotes):
    with pytest.raises(ValueError, match="upper_sec"):
        range_join(quotes, quotes, on="sym", lower_sec=10, upper_sec=0)


def test_range_join_matches_naive(spark):
    """Bucketed implementation ≡ naive inequality join on random-ish data."""
    import pyspark.sql.functions as F

    from ig_etl_sync_spark.sources.catalog import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    a = ev.where("event_type = 'error'").select("user_id", "event_id", "ts")
    b = ev.where("event_type = 'click'").select("user_id", F.col("ts").alias("click_ts"))
    fast = range_join(a, b, on="user_id", lower_sec=-3600, upper_sec=3600,
                      left_ts="ts", right_ts="click_ts")
    naive = a.join(b, "user_id").where(
        (F.unix_micros("click_ts") >= F.unix_micros("ts") - 3600 * 1_000_000)
        & (F.unix_micros("click_ts") <= F.unix_micros("ts") + 3600 * 1_000_000)
    )
    f = {(r["event_id"], r["click_ts_r"]) for r in fast.collect()}
    n = {(r["event_id"], r["click_ts"]) for r in naive.collect()}
    assert f == n and len(f) > 0


def test_absence_within_basic_and_boundary(spark):
    import datetime as dt

    from ig_etl_sync_spark.operators.temporal import absence_within

    t0 = dt.datetime(2024, 1, 1)
    clicks = spark.createDataFrame(
        [(1, 10, t0),                       # converted at +30min
         (1, 11, t0.replace(hour=6)),       # nothing after -> absent
         (2, 12, t0)],                      # followup at exactly +1h (inclusive)
        "user_id long, click_id long, ts timestamp",
    )
    purchases = spark.createDataFrame(
        [(1, t0.replace(minute=30)),
         (2, t0.replace(hour=1))],
        "user_id long, ts timestamp",
    )
    out = {r.click_id for r in
           absence_within(clicks, purchases, "user_id").collect()}
    assert out == {11}  # 10 converted; 12's +1h followup is inside (0, 1h]

    # a purchase at the SAME instant does not count (strictly after)
    same = spark.createDataFrame([(1, t0)], "user_id long, ts timestamp")
    out2 = {r.click_id for r in
            absence_within(clicks.where("click_id = 10"), same,
                           "user_id").collect()}
    assert out2 == {10}


def test_absence_within_plan_is_not_quadratic(spark):
    import datetime as dt

    from ig_etl_sync_spark.operators.temporal import absence_within

    t0 = dt.datetime(2024, 1, 1)
    l = spark.createDataFrame([(1, 1, t0)], "user_id long, click_id long, ts timestamp")
    r = spark.createDataFrame([(1, t0)], "user_id long, ts timestamp")
    plan = absence_within(l, r, "user_id")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
