"""Sessionization + OAuth source helper."""

from __future__ import annotations

import datetime as dt
import json

import pytest

from ig_etl_sync_spark.operators.sessions import session_stats, with_session_id
from ig_etl_sync_spark.sources.oauth import fetch_client_credentials_token


@pytest.fixture(scope="module")
def events(spark):
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        # user 1: two sessions (gap 45 min between event 2 and 3)
        (1, base),
        (1, base + dt.timedelta(minutes=10)),
        (1, base + dt.timedelta(minutes=55)),
        (1, base + dt.timedelta(minutes=60)),
        # user 2: one session
        (2, base),
        (2, base + dt.timedelta(minutes=29)),
    ]
    return spark.createDataFrame(rows, "user_id int, ts timestamp")


def test_session_boundaries(spark, events):
    tagged = with_session_id(events, gap_seconds=1800)
    got = {(r["user_id"], r["ts"]): r["session_id"] for r in tagged.collect()}
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    assert got[(1, base)] == 1
    assert got[(1, base + dt.timedelta(minutes=10))] == 1
    assert got[(1, base + dt.timedelta(minutes=55))] == 2  # 45-min gap breaks
    assert got[(1, base + dt.timedelta(minutes=60))] == 2
    assert got[(2, base)] == 1
    assert got[(2, base + dt.timedelta(minutes=29))] == 1


def test_session_stats(spark, events):
    stats = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["duration_sec"])
        for r in session_stats(events, gap_seconds=1800).collect()
    }
    assert stats[(1, 1)] == (2, 600)
    assert stats[(1, 2)] == (2, 300)
    assert stats[(2, 1)] == (2, 1740)


def test_exact_gap_is_same_session(spark):
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, base), (1, base + dt.timedelta(seconds=1800))], "user_id int, ts timestamp"
    )
    tagged = with_session_id(df, gap_seconds=1800)
    assert {r["session_id"] for r in tagged.collect()} == {1}  # > gap breaks, == gap doesn't


def test_oauth_token_fetch_with_fake_transport():
    calls = {}

    def transport(url, body, headers):
        calls["url"] = url
        calls["body"] = body.decode()
        return json.dumps({"access_token": "tok-123", "token_type": "Bearer"})

    tok = fetch_client_credentials_token(
        "https://auth.example.com/oauth2/token",
        client_id="cid",
        client_secret="sec",
        audience="https://api.example.com",
        transport=transport,
    )
    assert tok == "tok-123"
    assert "grant_type=client_credentials" in calls["body"]
    assert "audience=" in calls["body"]


def test_oauth_missing_credentials_raises(monkeypatch):
    monkeypatch.delenv("OAUTH_CLIENT_ID", raising=False)
    monkeypatch.delenv("OAUTH_CLIENT_SECRET", raising=False)
    with pytest.raises(ValueError, match="credentials"):
        fetch_client_credentials_token("https://auth.example.com/token")


def test_oauth_no_token_in_response_raises():
    with pytest.raises(ValueError, match="access_token"):
        fetch_client_credentials_token(
            "https://auth.example.com/token",
            client_id="cid",
            client_secret="sec",
            transport=lambda u, b, h: json.dumps({"error": "nope"}),
        )
