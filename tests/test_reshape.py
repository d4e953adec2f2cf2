"""Pivot/unpivot reshaping: semantics, naming, plan shape."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from ig_etl_sync_spark.operators.reshape import pivot_wide, unpivot_long


@pytest.fixture()
def sales(spark):
    rows = [
        ("east", "A", 10.0),
        ("east", "A", 5.0),
        ("east", "B", 2.0),
        ("west", "B", 7.0),
        ("west", "C", 100.0),  # outside the explicit value list
    ]
    return spark.createDataFrame(rows, ["region", "cat", "amt"])


def test_pivot_multi_agg_naming_and_values(sales):
    out = pivot_wide(
        sales,
        keys=["region"],
        pivot_col="cat",
        values=["A", "B"],
        aggs={"amt": (F.sum, "amt"), "n": (F.count, "amt")},
    )
    assert set(out.columns) == {"region", "amt_A", "amt_B", "n_A", "n_B"}
    got = {r.region: r for r in out.collect()}
    assert got["east"].amt_A == 15.0 and got["east"].n_A == 2
    assert got["east"].amt_B == 2.0 and got["east"].n_B == 1
    # west has no A rows -> NULL sum, 0 count (SQL FILTER semantics);
    # its C row is dropped entirely
    assert got["west"].amt_A is None and got["west"].n_A == 0
    assert got["west"].amt_B == 7.0


def test_pivot_single_agg_naming(sales):
    out = pivot_wide(
        sales, ["region"], "cat", ["A", "B"], {"amt": (F.sum, "amt")}
    )
    assert set(out.columns) == {"region", "amt_A", "amt_B"}


def test_pivot_requires_values_and_aggs(sales):
    with pytest.raises(ValueError, match="values"):
        pivot_wide(sales, ["region"], "cat", [], {"amt": (F.sum, "amt")})
    with pytest.raises(ValueError, match="aggregate"):
        pivot_wide(sales, ["region"], "cat", ["A"], {})


def test_pivot_single_shuffle_no_discovery_job(sales):
    """Explicit values: exactly one hash Exchange, no separate distinct
    scan (an implicit pivot would have run an eager collect job)."""
    out = pivot_wide(
        sales, ["region"], "cat", ["A", "B"], {"amt": (F.sum, "amt")}
    )
    p = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", p)) == 1
    assert "pivot_first" not in p  # not DataFrame.pivot's 2-phase plan


def test_unpivot_roundtrip(sales):
    wide = pivot_wide(
        sales, ["region"], "cat", ["A", "B"], {"amt": (F.sum, "amt")}
    )
    long = unpivot_long(
        wide, ["region"], ["amt_A", "amt_B"], "cat", "amt"
    )
    got = {(r.region, r.cat): r.amt for r in long.collect()}
    assert got[("east", "amt_A")] == 15.0
    assert got[("west", "amt_A")] is None  # NULL cells kept
    assert len(got) == 4


def test_unpivot_missing_column_raises(sales):
    with pytest.raises(ValueError, match="missing"):
        unpivot_long(sales, ["region"], ["nope"], "k", "v")
