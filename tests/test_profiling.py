"""Profiling & validation operators: profile stats, orphans, dups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ig_etl_sync_spark.operators.profiling import (
    column_profile,
    duplicate_keys,
    referential_violations,
)


@pytest.fixture(scope="module")
def messy(spark):
    rows = [
        (1, "a", 10.0),
        (2, "a", None),
        (3, None, 30.0),
        (3, "b", 30.0),  # duplicate id
        (4, "c", -2.5),
    ]
    return spark.createDataFrame(rows, "id long, tag string, v double")


def test_column_profile_counts_and_rendering(spark, messy):
    prof = {
        r["column"]: r
        for r in column_profile(
            messy, [("id", "num"), ("tag", "str"), ("v", "num")]
        ).collect()
    }
    assert prof["id"]["n_rows"] == 5
    assert prof["id"]["n_non_null"] == 5
    assert prof["id"]["n_distinct"] == 4
    assert prof["tag"]["n_non_null"] == 4
    assert prof["tag"]["n_distinct"] == 3
    assert prof["tag"]["min_str"] == "a" and prof["tag"]["max_str"] == "c"
    assert prof["v"]["n_non_null"] == 4
    assert prof["v"]["min_str"] == "-2.5000"
    assert prof["v"]["max_str"] == "30.0000"


def test_column_profile_rejects_bad_kind(spark, messy):
    with pytest.raises(ValueError):
        column_profile(messy, [("id", "bignum")])


def test_referential_violations(spark, messy):
    parent = spark.createDataFrame([(1,), (2,)], "pid long")
    out = referential_violations(messy, parent, "id", "pid").collect()
    got = {(r["id"], r["n_orphans"]) for r in out}
    assert got == {(3, 2), (4, 1)}
    # clean child -> empty report
    clean = messy.where(F.col("id") <= 2)
    assert referential_violations(clean, parent, "id", "pid").count() == 0


def test_duplicate_keys(spark, messy):
    dups = duplicate_keys(messy, ["id"]).collect()
    assert [(r["id"], r["n_rows"]) for r in dups] == [(3, 2)]
    assert duplicate_keys(messy, ["id", "tag"]).count() == 0


def test_mad_outliers_flags_planted_outlier(spark):
    from ig_etl_sync_spark.operators.profiling import mad_outliers

    rows = [("g", float(v)) for v in [10, 11, 12, 10, 11, 12, 10, 11, 500]]
    rows += [("flat", 7.0)] * 5  # MAD = 0 group
    df = spark.createDataFrame(rows, "grp string, v double")
    out = mad_outliers(df, "v", ["grp"]).collect()
    flagged = {(r["grp"], r["v"]) for r in out if r["is_outlier"]}
    assert flagged == {("g", 500.0)}
    flat = [r for r in out if r["grp"] == "flat"]
    assert all(r["mod_z"] is None and not r["is_outlier"] for r in flat)


def test_mad_outliers_global_group(spark):
    from ig_etl_sync_spark.operators.profiling import mad_outliers

    df = spark.createDataFrame(
        [(float(v),) for v in [1, 2, 3, 4, 5, 1000]], "v double"
    )
    out = mad_outliers(df, "v").collect()
    assert sum(1 for r in out if r["is_outlier"]) == 1


def test_rolling_zscore_hand_computed_and_degenerate(spark):
    import math

    from ig_etl_sync_spark.operators.profiling import rolling_zscore

    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: values 1.00, 2.00, 3.00 (exact cents)
        (1, t0, 1, 1.0), (1, t0.replace(minute=1), 2, 2.0),
        (1, t0.replace(minute=2), 3, 3.0),
        # user 2: constant series -> zero variance -> NULL z
        (2, t0, 4, 5.0), (2, t0.replace(minute=1), 5, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    out = {r.event_id: r.z for r in
           rolling_zscore(df, "user_id", "ts", "value", "event_id").collect()}
    assert out[1] is None  # n=1
    # event 2: window {100,200}: mean 150, s=sqrt(5000/2)... via formula:
    # z = (n*x - S)/(n*sqrt((nQ - S^2)/(n(n-1)))) = (2*200-300)/(2*sqrt((2*50000-90000)/2))
    want2 = (2 * 200 - 300) / (2 * math.sqrt((2 * 50000 - 300 * 300) / (2 * 1)))
    assert abs(out[2] - want2) < 1e-12
    # event 3: window {100,200,300}: z = (3*300-600)/(3*sqrt((3*140000-360000)/6))
    want3 = (3 * 300 - 600) / (3 * math.sqrt((3 * 140000 - 600 * 600) / (3 * 2)))
    assert abs(out[3] - want3) < 1e-12
    assert out[4] is None and out[5] is None  # zero variance


def test_categorical_psi_detects_planted_drift(spark):
    from ig_etl_sync_spark.operators.profiling import categorical_drift_psi

    ref = spark.createDataFrame([("a",)] * 80 + [("b",)] * 20, "k string")
    cur = spark.createDataFrame([("a",)] * 20 + [("b",)] * 80, "k string")
    out = {r.category: r for r in categorical_drift_psi(ref, cur, "k", top_m=5).collect()}
    assert set(out) == {"a", "b", "__other__"}
    assert abs(out["a"].p_ref - 0.800001) < 1e-9
    assert abs(out["a"].q_cur - 0.200001) < 1e-9
    total = sum(r.contrib for r in out.values())
    assert total > 0.2  # classic "shifted" PSI rule of thumb
    assert out["__other__"].contrib == 0.0


def test_categorical_psi_new_category_counts(spark):
    """A category the reference never saw lands in __other__ with
    nonzero current mass — new-token drift must count."""
    from ig_etl_sync_spark.operators.profiling import categorical_drift_psi

    ref = spark.createDataFrame([("a",)] * 50, "k string")
    cur = spark.createDataFrame([("a",)] * 25 + [("zz",)] * 25, "k string")
    out = {r.category: r for r in categorical_drift_psi(ref, cur, "k", top_m=3).collect()}
    assert out["__other__"].q_cur > 0.49
    assert out["__other__"].contrib > 0


def test_categorical_psi_identical_is_near_zero(spark):
    from ig_etl_sync_spark.operators.profiling import categorical_drift_psi

    df = spark.createDataFrame([(f"c{i % 7}",) for i in range(700)], "k string")
    out = categorical_drift_psi(df, df, "k", top_m=4).collect()
    assert abs(sum(r.contrib for r in out)) < 1e-9


def test_categorical_psi_rejects_bad_top_m(spark):
    from ig_etl_sync_spark.operators.profiling import categorical_drift_psi

    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        categorical_drift_psi(df, df, "k", top_m=0)
