"""Multimodal column plumbing (SURVEY §2.9 X5): schema, batching, stubs."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ig_etl_sync_spark.operators import multimodal as M


def test_binary_file_ingestion_e2e(spark, tmp_path):
    """Real bytes on disk → binaryFile scan → stats → decode → resize.

    This is the actual ingestion path (not synthetic_media): files are
    written to storage, read back via the binaryFile source with a glob
    filter, and pushed through the full Arrow-batched pipeline."""
    media_dir = tmp_path / "media"
    media_dir.mkdir()
    payloads = {}
    for i in range(6):
        # PNG magic + deterministic body: real bytes, no media lib needed
        body = b"\x89PNG\r\n\x1a\n" + hashlib.sha256(f"img-{i}".encode()).digest() * 16
        (media_dir / f"img_{i}.png").write_bytes(body)
        payloads[f"img_{i}.png"] = body
    (media_dir / "notes.txt").write_bytes(b"not media")  # excluded by glob

    raw = M.read_binary_files(spark, str(media_dir), glob="*.png")
    assert set(raw.columns) == {"path", "modificationTime", "length", "content"}
    assert raw.count() == 6  # glob filtered the .txt out

    media = raw.select(
        F.element_at(F.split("path", "/"), -1).alias("name"),
        F.col("content").alias("payload"),
        F.col("length"),
    )
    stats = {r["name"]: r for r in M.with_payload_stats(media).collect()}
    for name, body in payloads.items():
        assert stats[name]["payload_bytes"] == len(body) == stats[name]["length"]
        assert stats[name]["payload_md5"] == hashlib.md5(body).hexdigest()

    feats = {
        r["name"]: r
        for r in M.decode_features(media, id_col="name").collect()
    }
    assert len(feats) == 6
    be = M.DecodeBackend()
    for name, body in payloads.items():
        assert feats[name]["mean_pixel"] == be.decode_image(body)["mean_pixel"]

    resized = M.resize_images(media, 32, 32).collect()
    assert all(r["width"] == 32 and r["height"] == 32 for r in resized)
    assert all(bytes(r["payload"]).startswith(b"resized:32x32:") for r in resized)


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
