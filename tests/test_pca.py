"""Fixed-point power iteration (X61): recovers a planted dominant
direction, deterministic, dims-bounded driver state."""

from __future__ import annotations

import random

import pytest

from ig_etl_sync_spark.operators.pca import (
    S_SCALE,
    V_SCALE,
    _tdiv,
    power_iteration_pc1,
)


def test_tdiv_matches_engine_semantics():
    # Spark `div` and DuckDB `//` truncate toward zero.
    assert _tdiv(7, 2) == 3
    assert _tdiv(-7, 2) == -3
    assert _tdiv(0, 5) == 0
    assert _tdiv(-1, 2) == 0


def test_recovers_planted_direction(spark):
    """Data = strong variance along a known axis pair + small noise:
    projections must separate the two planted clusters by sign."""
    rng = random.Random(7)
    rows = []
    for i in range(200):
        side = 1 if i % 2 == 0 else -1
        # dominant direction: dims 0 and 1 move together, amplitude 0.4
        base = [0.0] * 8
        base[0] = 0.4 * side + rng.uniform(-0.02, 0.02)
        base[1] = 0.4 * side + rng.uniform(-0.02, 0.02)
        for d in range(2, 8):
            base[d] = rng.uniform(-0.05, 0.05)
        rows.append((i, base))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r.pc1_proj for r in power_iteration_pc1(df, dims=8).collect()}
    evens = [out[i] for i in range(0, 200, 2)]
    odds = [out[i] for i in range(1, 200, 2)]
    # all evens one sign, all odds the other
    assert all(v > 0 for v in evens) != all(v > 0 for v in odds)
    assert all(v > 0 for v in evens) or all(v < 0 for v in evens)
    # magnitudes: planted amplitude 0.4 vs noise 0.05 -> clear margin
    assert min(abs(v) for v in evens + odds) > 0


def test_deterministic_across_runs(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = sorted(map(tuple, power_iteration_pc1(df, dims=64, iters=3).collect()))
    b = sorted(map(tuple, power_iteration_pc1(df, dims=64, iters=3).collect()))
    assert a == b


def test_empty_input_returns_empty(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert power_iteration_pc1(df, dims=4, iters=2).count() == 0


def test_rejects_bad_iters(spark):
    df = spark.createDataFrame([(1, [0.1, 0.2])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        power_iteration_pc1(df, iters=0)


def test_scales_bounded(spark):
    """Renormalization contract: |v| <= V_SCALE and the score divisor
    keeps |s| <= S_SCALE by construction — sanity-pin the constants the
    SQL twin also inlines."""
    assert V_SCALE == 1 << 20 and S_SCALE == 1 << 16
