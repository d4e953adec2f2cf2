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
