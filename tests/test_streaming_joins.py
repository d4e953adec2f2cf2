"""Stream-stream interval join: streaming ≡ batch on bounded input."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ig_etl_sync_spark.sources.catalog import load_table
from ig_etl_sync_spark.streaming.joins import interval_join

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def clicks_purchases(spark):
    ev = load_table(spark, SF_DIR, "events")
    clicks = ev.where("event_type = 'click'").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    purchases = ev.where("event_type = 'purchase'").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts", "value"
    )
    return clicks, purchases


def _batch_naive(clicks, purchases, lower=0, upper=3600):
    p = purchases.select(
        "user_id",
        F.col("purchase_id"),
        F.col("ts").alias("p_ts"),
        "value",
    )
    return clicks.join(p, "user_id").where(
        (F.unix_micros("p_ts") >= F.unix_micros("ts") + lower * 1_000_000)
        & (F.unix_micros("p_ts") <= F.unix_micros("ts") + upper * 1_000_000)
    )


def test_batch_interval_join_matches_naive(spark, clicks_purchases):
    clicks, purchases = clicks_purchases
    got = interval_join(
        clicks, purchases, "user_id", lower_sec=0, upper_sec=3600
    )
    g = {(r["click_id"], r["purchase_id"]) for r in got.collect()}
    n = {
        (r["click_id"], r["purchase_id"])
        for r in _batch_naive(clicks, purchases).collect()
    }
    assert g == n and len(g) > 0


def test_batch_interval_join_left_outer(spark, clicks_purchases):
    clicks, purchases = clicks_purchases
    got = interval_join(
        clicks, purchases, "user_id", lower_sec=0, upper_sec=3600,
        how="leftOuter",
    )
    rows = got.collect()
    matched = {r["click_id"] for r in rows if r["purchase_id"] is not None}
    all_clicks = {r["click_id"] for r in clicks.collect()}
    out_clicks = {r["click_id"] for r in rows}
    assert out_clicks == all_clicks  # every click survives
    inner = {
        (r["click_id"], r["purchase_id"])
        for r in _batch_naive(clicks, purchases).collect()
    }
    assert matched == {c for c, _ in inner}


def test_interval_join_rejects_bad_args(spark, clicks_purchases):
    clicks, purchases = clicks_purchases
    with pytest.raises(ValueError):
        interval_join(clicks, purchases, "user_id", how="rightOuter")
    with pytest.raises(ValueError):
        interval_join(
            clicks, purchases, "user_id", lower_sec=10, upper_sec=-10
        )


def test_streaming_interval_join_matches_batch(spark, clicks_purchases, tmp_path):
    """availableNow streaming run over the same bounded input must emit
    exactly the batch inner-join pairs (inner stream-stream joins emit
    matches as they arrive; on bounded input with availableNow, all)."""
    clicks, purchases = clicks_purchases
    c_src, p_src = str(tmp_path / "c"), str(tmp_path / "p")
    clicks.write.mode("overwrite").parquet(c_src)
    purchases.write.mode("overwrite").parquet(p_src)

    c_stream = spark.readStream.schema(
        "user_id long, click_id long, ts timestamp"
    ).parquet(c_src)
    p_stream = spark.readStream.schema(
        "user_id long, purchase_id long, ts timestamp, value double"
    ).parquet(p_src)

    out = interval_join(
        c_stream, p_stream, "user_id", lower_sec=0, upper_sec=3600,
        watermark_delay="10 minutes",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.sql("SELECT * FROM ssj_test").collect()
    }
    want = {
        (r["click_id"], r["purchase_id"])
        for r in _batch_naive(clicks, purchases).collect()
    }
    assert got == want and len(got) > 0
