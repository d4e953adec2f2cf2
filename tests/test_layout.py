"""Z-order layout: Morton-code correctness, skipping benefit, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ig_etl_sync_spark.operators.layout import (
    with_scaled_zvalue,
    zorder_bucket_stats,
    zorder_layout,
    zvalue,
)


def _morton_py(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_python_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 255) for b in (0, 3, 128, 255)]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = df.select("a", "b", zvalue(F.col("a"), F.col("b"), 8).alias("z")).collect()
    for r in got:
        assert r["z"] == _morton_py(r["a"], r["b"], 8), (r["a"], r["b"])


def test_zvalue_rejects_bad_bits(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        zvalue(F.col("id"), F.col("id"), 0)
    with pytest.raises(ValueError):
        zvalue(F.col("id"), F.col("id"), 32)


def test_scaled_zvalue_covers_domain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    z = with_scaled_zvalue(li, "l_partkey", "l_suppkey", bits=8)
    lo, hi = z.agg(F.min("_z"), F.max("_z")).first()
    assert 0 <= lo and hi < (1 << 16)
    # scaling must spread across the bucket space, not collapse
    n_buckets = z.select(F.shiftright(F.col("_z"), 10)).distinct().count()
    assert n_buckets > 32


def test_zorder_bounds_both_dims(spark, sf_dir):
    """The point of z-order: per-bucket ranges are bounded on BOTH
    columns, vs single-column sort which bounds only its own column.
    Compare total max-min span across equal-count buckets."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    )
    zstats = zorder_bucket_stats(li, "l_partkey", "l_suppkey", 6, 8).collect()
    z_supp_span = sum(r["max_l_suppkey"] - r["min_l_suppkey"] for r in zstats) / len(zstats)
    z_part_span = sum(r["max_l_partkey"] - r["min_l_partkey"] for r in zstats) / len(zstats)

    # baseline: bucket by partkey only (a single-column sort layout)
    pk_only = (
        li.groupBy((F.col("l_partkey") % 64).alias("bucket"))
        .agg(
            F.min("l_suppkey").alias("mn"),
            F.max("l_suppkey").alias("mx"),
        )
        .collect()
    )
    sort_supp_span = sum(r["mx"] - r["mn"] for r in pk_only) / len(pk_only)

    part_lo, part_hi, supp_lo, supp_hi = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).first()
    # z-order buckets must meaningfully bound both dims...
    assert z_part_span < (part_hi - part_lo) * 0.55
    assert z_supp_span < (supp_hi - supp_lo) * 0.55
    # ...while partkey-sorted buckets leave suppkey essentially unbounded
    assert sort_supp_span > (supp_hi - supp_lo) * 0.9


def test_zorder_layout_single_range_shuffle(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plan = (
        zorder_layout(li, "l_partkey", "l_suppkey", n_files=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" in plan.lower()
    # one range exchange + the single-row stats reduce; nothing else
    wide = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln and "Broadcast" not in ln
    ]
    assert all(
        "rangepartitioning" in ln.lower() or "SinglePartition" in ln for ln in wide
    ), wide


# ----------------------- rendezvous hashing (X67)


def test_rendezvous_minimal_movement(spark):
    """Adding one shard moves keys ONLY to the new shard, roughly
    1/(n+1) of them."""
    from ig_etl_sync_spark.operators.layout import rendezvous_assign

    df = spark.range(2000).withColumnRenamed("id", "k")
    before = {r.k: r.shard for r in rendezvous_assign(df, "k", ["a", "b", "c"]).collect()}
    after = {r.k: r.shard for r in rendezvous_assign(df, "k", ["a", "b", "c", "d"]).collect()}
    moved = {k for k in before if before[k] != after[k]}
    assert all(after[k] == "d" for k in moved)
    assert 0.15 < len(moved) / 2000 < 0.35  # ~1/4 expected


def test_rendezvous_balanced_and_deterministic(spark):
    from ig_etl_sync_spark.operators.layout import rendezvous_assign

    df = spark.range(4000).withColumnRenamed("id", "k")
    counts = {
        r.shard: r.n
        for r in rendezvous_assign(df, "k", [f"s{i}" for i in range(8)])
        .groupBy("shard").agg(__import__("pyspark").sql.functions.count("*").alias("n"))
        .collect()
    }
    assert len(counts) == 8
    assert max(counts.values()) < 2 * min(counts.values())
    again = {
        r.k: r.shard
        for r in rendezvous_assign(df, "k", [f"s{i}" for i in range(8)]).collect()
    }
    assert len(again) == 4000


def test_rendezvous_rejects_bad_shards(spark):
    from ig_etl_sync_spark.operators.layout import rendezvous_assign

    df = spark.range(3).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        rendezvous_assign(df, "k", [])
    with pytest.raises(ValueError):
        rendezvous_assign(df, "k", ["a", "a"])
