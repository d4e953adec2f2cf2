"""Ordered-funnel analysis (operators/sessions.funnel_counts)."""

from __future__ import annotations


def test_funnel_ordering_and_skips(spark):
    """Funnel chains on the FIRST qualifying event: out-of-order steps
    don't count, skipped steps break the chain, later re-occurrence
    after a qualifying previous step does count."""
    import datetime as dt
    from ig_etl_sync_spark.operators.sessions import funnel_counts

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    seqs = {
        1: ["signup", "click", "purchase"],     # full funnel
        2: ["signup", "purchase"],              # skips click
        3: ["click", "signup", "purchase"],     # click too early
        4: ["signup", "click"],                 # stops before purchase
        5: ["click", "signup", "click", "purchase"],  # re-click qualifies
    }
    for u, seq in seqs.items():
        for i, e in enumerate(seq):
            rows.append((u, t0 + dt.timedelta(minutes=i), e))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r["step"]: r["n_keys"]
        for r in funnel_counts(df, ["signup", "click", "purchase"]).collect()
    }
    assert got == {"signup": 5, "click": 3, "purchase": 2}


def test_funnel_rejects_empty_steps(spark):
    import pytest as _pt
    from ig_etl_sync_spark.operators.sessions import funnel_counts

    df = spark.createDataFrame([], "user_id long, ts timestamp, event_type string")
    with _pt.raises(ValueError):
        funnel_counts(df, [])


def test_multi_touch_linear_split_and_remainder(spark):
    """3 touches -> 333333 ppm each + remainder 1 to the LATEST; totals
    conserve exactly 1e6 per conversion."""
    from ig_etl_sync_spark.operators.sessions import multi_touch_attribution

    rows = [
        (1, "click", "2024-01-01 10:00:00", 101),
        (1, "click", "2024-01-01 10:05:00", 102),
        (1, "click", "2024-01-01 10:10:00", 103),
        (1, "purchase", "2024-01-01 10:20:00", 104),
        (2, "click", "2024-01-01 11:00:00", 201),
        (2, "purchase", "2024-01-01 11:30:00", 202),
        (3, "purchase", "2024-01-01 12:00:00", 301),  # no touch: no credit
    ]
    ev = spark.createDataFrame(
        [(u, t, __import__("datetime").datetime.fromisoformat(ts), i) for u, t, ts, i in rows],
        "user_id long, event_type string, ts timestamp, event_id long",
    )
    out = {r.user_id: r for r in multi_touch_attribution(ev).collect()}
    assert out[1].credit_ppm == 1_000_000 and out[1].touched_convs == 1
    assert out[2].credit_ppm == 1_000_000 and out[2].touched_convs == 1
    assert 3 not in out


def test_multi_touch_window_excludes_stale_clicks(spark):
    from ig_etl_sync_spark.operators.sessions import multi_touch_attribution
    import datetime as dt

    ev = spark.createDataFrame(
        [
            (1, "click", dt.datetime(2024, 1, 1, 0, 0), 1),
            (1, "purchase", dt.datetime(2024, 1, 2, 0, 0), 2),  # 24h later
        ],
        "user_id long, event_type string, ts timestamp, event_id long",
    )
    assert multi_touch_attribution(ev, window_us=3600_000_000).count() == 0
