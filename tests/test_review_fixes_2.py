"""Regression tests for the second review round."""

from __future__ import annotations

import datetime as dt

import pytest

from ig_etl_sync_spark.operators.graph import GraphStore
from ig_etl_sync_spark.operators.similarity import lsh_topk
from ig_etl_sync_spark.operators.temporal import as_of_join, range_join

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def ts(sec):
    return T0 + dt.timedelta(seconds=sec)


def test_range_join_keeps_samekey_samets_rows(spark):
    """Two left rows sharing (key, ts) but differing in payload must
    BOTH keep their matches (the old dedup dropped one)."""
    left = spark.createDataFrame(
        [(1, "e1", ts(0)), (1, "e2", ts(0))], "k int, eid string, ts timestamp"
    )
    right = spark.createDataFrame([(1, ts(-10))], "k int, ts timestamp")
    got = sorted(
        r["eid"] for r in range_join(left, right, on="k", lower_sec=-60, upper_sec=0).collect()
    )
    assert got == ["e1", "e2"]


def test_asof_null_right_ts_never_matches(spark):
    """A right row with NULL ts is no match (NULL <= t is never true)."""
    left = spark.createDataFrame([(2, ts(0), "t1")], "k int, ts timestamp, tid string")
    right = spark.createDataFrame([(2, None, 99.0)], "k int, ts timestamp, px double")
    row = as_of_join(left, right, on="k").collect()[0]
    assert row["px_r"] is None and row["ts_r"] is None


def test_asof_equal_ts_right_rows_deterministic(spark):
    """Equal (key, ts) right rows collapse to the max payload — stable
    across runs (was arbitrary carry order)."""
    left = spark.createDataFrame([(1, ts(10), "t1")], "k int, ts timestamp, tid string")
    right = spark.createDataFrame(
        [(1, ts(0), 5.0), (1, ts(0), 9.0)], "k int, ts timestamp, px double"
    )
    for _ in range(3):
        row = as_of_join(left, right, on="k").collect()[0]
        assert row["px_r"] == 9.0


def test_traverse_self_label_edges(spark, tmp_path):
    """Self-label paths (person-knows-person-knows-person) get indexed
    column names instead of ambiguous duplicates."""
    g = GraphStore(spark, str(tmp_path / "g"))
    nodes = spark.createDataFrame(
        [(x, x.upper()) for x in "abc"], "external_id string, name string"
    )
    g.write_nodes("person", to_create=nodes)
    g.write_edges(
        "person", "knows", "person",
        spark.createDataFrame([("a", "b"), ("b", "c")], "a_id string, b_id string"),
    )
    paths = g.traverse(("person", "knows", "person"), ("person", "knows", "person"))
    assert sorted(paths.columns) == ["person_id", "person_id_1", "person_id_2"]
    got = [(r["person_id"], r["person_id_1"], r["person_id_2"]) for r in paths.collect()]
    assert got == [("a", "b", "c")]


def test_lsh_topk_checks_query_dim(spark):
    corpus = spark.createDataFrame(
        [(i, [float(i)] * 8) for i in range(4)], "vec_id long, embedding array<float>"
    )
    queries = spark.createDataFrame(
        [(0, [1.0] * 4)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="dimension is 4"):
        lsh_topk(corpus, queries, dim=8, planes=2)
