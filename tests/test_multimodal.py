"""Multimodal column plumbing (SURVEY §2.9 X5): schema, batching, stubs."""

from __future__ import annotations

from ig_etl_sync_spark.operators import multimodal as M


def test_schema_and_payload_stats(spark):
    media = M.synthetic_media(spark, 8)
    assert [f.name for f in media.schema.fields][:3] == ["media_id", "kind", "payload"]
    stats = M.with_payload_stats(media)
    rows = stats.select("media_id", "payload_bytes", "payload_md5").collect()
    assert all(r["payload_bytes"] == 1024 for r in rows)
    assert len({r["payload_md5"] for r in rows}) == 8  # distinct payloads


def test_decode_features_deterministic(spark):
    media = M.synthetic_media(spark, 8)
    a = sorted(M.decode_features(media).collect())
    b = sorted(M.decode_features(media).collect())
    assert a == b
    assert all(r["mean_pixel"] is not None for r in a)


def test_frame_sampling_shape(spark):
    media = M.synthetic_media(spark, 4)
    frames = M.sample_video_frames(media, every_n=2)
    rows = frames.collect()
    assert len(rows) == 4 * 4  # 8 // every_n frames per video
    assert all(isinstance(r["frame"], (bytes, bytearray)) for r in rows)


def test_metadata_filter_never_touches_payload(spark):
    """Column pruning: selecting metadata only must not deserialize
    payload (plan shows a scan without the payload column)."""
    media = M.synthetic_media(spark, 8)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        media.write.mode("overwrite").parquet(f"{d}/media")
        df = spark.read.parquet(f"{d}/media").select("media_id", "kind", "width")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "payload" not in plan
