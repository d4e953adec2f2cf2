"""SCD2 history operator: interval semantics, plan shape, PIT lookup."""

from __future__ import annotations

import datetime as dt
import re

import pytest
from pyspark.sql import functions as F

from ig_etl_sync_spark.operators.scd import (
    scd2_history,
    scd2_point_in_time,
)


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


@pytest.fixture()
def stream(spark):
    rows = [
        # key a: x x y x  -> runs x@[1,3) y@[3,4) x@[4,None)
        ("a", "x", _ts(1), 1),
        ("a", "x", _ts(2), 2),
        ("a", "y", _ts(3), 3),
        ("a", "x", _ts(4), 4),
        # key b: single run
        ("b", "z", _ts(1), 5),
        ("b", "z", _ts(9), 6),
    ]
    return spark.createDataFrame(rows, ["k", "state", "ts", "id"])


def test_scd2_runs_and_intervals(stream):
    got = {
        (r.k, r.state, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_history(stream, ["k"], ["state"], "ts", ["id"]).collect()
    }
    assert got == {
        ("a", "x", _ts(1), _ts(3), 0),
        ("a", "y", _ts(3), _ts(4), 0),
        ("a", "x", _ts(4), None, 1),
        ("b", "z", _ts(1), None, 1),
    }


def test_scd2_half_open_contiguity(stream):
    """valid_to of run i == valid_from of run i+1; exactly one current
    run per key."""
    h = scd2_history(stream, ["k"], ["state"], "ts", ["id"])
    rows = sorted(h.collect(), key=lambda r: (r.k, r.valid_from))
    by_key: dict[str, list] = {}
    for r in rows:
        by_key.setdefault(r.k, []).append(r)
    for runs in by_key.values():
        for a, b in zip(runs, runs[1:]):
            assert a.valid_to == b.valid_from
        assert runs[-1].valid_to is None
        assert sum(r.is_current for r in runs) == 1


def test_scd2_multi_state_cols(spark):
    rows = [
        ("a", "x", 1, _ts(1)),
        ("a", "x", 2, _ts(2)),  # second state col changes -> new run
        ("a", "x", 2, _ts(3)),
    ]
    df = spark.createDataFrame(rows, ["k", "s1", "s2", "ts"])
    h = scd2_history(df, ["k"], ["s1", "s2"], "ts").orderBy("valid_from")
    assert [(r.s1, r.s2, r.is_current) for r in h.collect()] == [
        ("x", 1, 0),
        ("x", 2, 1),
    ]


def test_scd2_internal_name_collision_raises(spark):
    df = spark.createDataFrame([("a", "x", _ts(1))], ["k", "_state", "ts"])
    with pytest.raises(ValueError, match="_state"):
        scd2_history(df, ["k"], ["_state"], "ts")


def test_scd2_point_in_time(stream):
    h = scd2_history(stream, ["k"], ["state"], "ts", ["id"])
    at = scd2_point_in_time(h, F.lit(_ts(3, 12)))
    assert {(r.k, r.state) for r in at.collect()} == {("a", "y"), ("b", "z")}
    # boundary: instant == valid_from of a's second run -> that run wins
    at_edge = scd2_point_in_time(h, F.lit(_ts(3)))
    assert {(r.k, r.state) for r in at_edge.collect()} == {("a", "y"), ("b", "z")}
    # before any data for a key -> key absent
    at_zero = scd2_point_in_time(h, F.lit(dt.datetime(2023, 12, 1)))
    assert at_zero.count() == 0


def test_scd2_single_exchange_plan(stream):
    """Both windows + the run filter must share ONE hash Exchange."""
    h = scd2_history(stream, ["k"], ["state"], "ts", ["id"])
    p = h._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", p)) == 1
    assert "Exchange SinglePartition" not in p
