"""Deterministic fixed-point k-means (operators/kmeans.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ig_etl_sync_spark.operators.kmeans import kmeans_assign, quantize_embeddings


def _blobs(spark):
    """Three well-separated 4-d blobs, 5 points each."""
    rows = []
    centers = [(-0.9, -0.9, -0.9, -0.9), (0.0,) * 4, (0.9, 0.9, 0.9, 0.9)]
    i = 0
    for b, c in enumerate(centers):
        for j in range(5):
            eps = 0.01 * (j - 2)
            rows.append((i, [x + eps for x in c], b))
            i += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, blob int"
    )


def test_kmeans_separates_blobs(spark):
    df = _blobs(spark)
    out = kmeans_assign(df, k=3, iters=3)
    j = out.join(df.select("vec_id", "blob"), "vec_id")
    # each blob maps to exactly one cluster and clusters don't merge
    m = j.groupBy("blob").agg(F.count_distinct("cluster").alias("nc")).collect()
    assert all(r.nc == 1 for r in m)
    assert j.select("cluster").distinct().count() == 3


def test_kmeans_deterministic(spark):
    df = _blobs(spark)
    a = sorted(map(tuple, kmeans_assign(df, k=3, iters=2).collect()))
    b = sorted(map(tuple, kmeans_assign(df, k=3, iters=2).collect()))
    assert a == b


def test_kmeans_seed_points_have_zero_distance_at_iter0(spark):
    df = _blobs(spark)
    out = kmeans_assign(df, k=3, iters=0).collect()
    # with no sweeps the k hash-drawn seeds are their own centroids:
    # exactly k rows at distance 0, one per distinct cluster
    zeros = [r for r in out if r.dist2 == 0]
    assert len(zeros) == 3
    assert len({r.cluster for r in zeros}) == 3


def test_kmeans_survives_k_exceeding_points(spark):
    df = _blobs(spark).where(F.col("vec_id") < 4)
    out = kmeans_assign(df, k=8, iters=2).collect()
    assert len(out) == 4
    assert len({r.cluster for r in out}) <= 4


def test_quantize_non_negative_and_monotone(spark):
    df = spark.createDataFrame(
        [(1, [-0.99, 0.0, 0.99])], "vec_id long, embedding array<float>"
    )
    q = quantize_embeddings(df).first().qv
    assert all(v > 0 for v in q)
    assert q == sorted(q)
    assert q[1] == 2_000_000  # floor((0.0 + 2.0) * 1e6)


def test_quantize_rejects_out_of_range_components(spark):
    from ig_etl_sync_spark.operators.kmeans import quantize_embeddings

    bad = spark.createDataFrame([(1, [0.5, -3.0])], "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="strictly-positive quantization"):
        quantize_embeddings(bad).collect()
    # boundary-legal and empty arrays still pass
    ok = spark.createDataFrame(
        [(1, [-1.999999, 1.0]), (2, [])], "vec_id long, embedding array<double>"
    )
    rows = {r.vec_id: r.qv for r in quantize_embeddings(ok).collect()}
    assert rows[1][0] >= 0 and rows[2] == []


def test_cohort_retention_rejects_unsupported_period(spark):
    from ig_etl_sync_spark.operators.sessions import cohort_retention

    ev = spark.createDataFrame([], "user_id long, ts timestamp")
    with pytest.raises(ValueError, match="period='month' unsupported"):
        cohort_retention(ev, period="month")
