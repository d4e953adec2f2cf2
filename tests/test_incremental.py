"""Incremental aggregate maintenance: equivalence with recompute,
group retirement, upsert folding, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ig_etl_sync_spark.operators.incremental import (
    COUNT_COL,
    apply_delta,
    delta_summary,
    summarize,
)


@pytest.fixture()
def base_rows(spark):
    rows = [
        ("a", 10), ("a", 20), ("b", 5), ("b", 7), ("c", 1),
    ]
    return spark.createDataFrame(rows, ["k", "v"])


SUMS = {"total": "v"}


def _as_map(df):
    return {r.k: (r.total, r[COUNT_COL]) for r in df.collect()}


def test_matches_recompute_after_mixed_delta(spark, base_rows):
    base = summarize(base_rows, ["k"], SUMS)
    plus = spark.createDataFrame([("a", 100), ("d", 9)], ["k", "v"])
    minus = spark.createDataFrame([("b", 5)], ["k", "v"])

    maintained = apply_delta(
        base, delta_summary(plus, minus, ["k"], SUMS), ["k"]
    )
    survivors = (
        base_rows.exceptAll(minus).unionByName(plus)
    )
    recomputed = summarize(survivors, ["k"], SUMS)
    assert _as_map(maintained) == _as_map(recomputed)
    assert _as_map(maintained)["a"] == (130, 3)


def test_group_retirement(spark, base_rows):
    """Deleting every row of group c retires the group entirely."""
    base = summarize(base_rows, ["k"], SUMS)
    minus = spark.createDataFrame([("c", 1)], ["k", "v"])
    out = apply_delta(base, delta_summary(None, minus, ["k"], SUMS), ["k"])
    assert "c" not in _as_map(out)
    assert set(_as_map(out)) == {"a", "b"}


def test_new_group_appears(spark, base_rows):
    base = summarize(base_rows, ["k"], SUMS)
    plus = spark.createDataFrame([("z", 3), ("z", 4)], ["k", "v"])
    out = apply_delta(base, delta_summary(plus, None, ["k"], SUMS), ["k"])
    assert _as_map(out)["z"] == (7, 2)


def test_upsert_as_minus_old_plus_new(spark, base_rows):
    """An update folds as delete-old + create-new (the shape reconcile
    emits): value a:10 -> a:11."""
    base = summarize(base_rows, ["k"], SUMS)
    plus = spark.createDataFrame([("a", 11)], ["k", "v"])
    minus = spark.createDataFrame([("a", 10)], ["k", "v"])
    out = apply_delta(base, delta_summary(plus, minus, ["k"], SUMS), ["k"])
    assert _as_map(out)["a"] == (31, 2)


def test_null_measures_ignored_like_recompute(spark):
    rows = [("a", 1), ("a", None), ("a", 2)]
    df = spark.createDataFrame(rows, "k string, v int")
    base = summarize(df, ["k"], SUMS)
    minus = spark.createDataFrame([("a", None)], "k string, v int")
    out = apply_delta(base, delta_summary(None, minus, ["k"], SUMS), ["k"])
    assert _as_map(out)["a"] == (3, 2)  # sum unchanged, count down 1


def test_reserved_count_name_rejected(base_rows):
    with pytest.raises(ValueError, match="reserved"):
        summarize(base_rows, ["k"], {COUNT_COL: "v"})


def test_schema_mismatch_rejected(spark, base_rows):
    base = summarize(base_rows, ["k"], SUMS)
    bad = base.withColumnRenamed("total", "other")
    with pytest.raises(ValueError, match="mismatch"):
        apply_delta(base, bad, ["k"])


def test_no_base_rescan_in_plan(spark, base_rows, tmp_path):
    """apply_delta's plan must read ONLY the stored aggregate and the
    delta — never the base table."""
    base_path = str(tmp_path / "base_data")
    agg_path = str(tmp_path / "agg")
    base_rows.write.parquet(base_path)
    summarize(spark.read.parquet(base_path), ["k"], SUMS).write.parquet(agg_path)

    stored = spark.read.parquet(agg_path)
    plus = spark.createDataFrame([("a", 1)], ["k", "v"])
    out = apply_delta(stored, delta_summary(plus, None, ["k"], SUMS), ["k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "base_data" not in plan and "agg" in plan
