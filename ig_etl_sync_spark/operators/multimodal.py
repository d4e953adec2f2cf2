"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partition sizing,
Arrow batch shape, UDF signatures. Codecs come in two backends:
``DecodeBackend`` (deterministic fake, always available) and
``StdlibCodecBackend`` (REAL decodes for PNG and WAV via the standard
library — see ``operators/codecs.py``; formats beyond that raise, the
seam where PIL/av slot in). Swapping backends changes ONE class, not
the pipeline.

Design rules for binary columns at 100 TB:
- payloads ride in ``BinaryType``; metadata (width, height, sample rate,
  duration) is typed columns next to them, so filters/pruning never
  touch bytes (``select`` without the payload column never deserializes
  it — parquet column pruning does the work).
- decode/resize/frame-sample run in ``mapInPandas`` (Arrow-batched);
  batch memory = rows_per_batch × payload size, so callers bound
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` when payloads are
  large.
- ``spark.read.format("binaryFile")`` is the ingestion path for media
  files on disk/object store.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)


class DecodeBackend:
    """Codec seam. The default deterministic fake derives pixel/sample
    statistics from a hash of the payload so pipelines are testable
    end-to-end without media libs; a real backend overrides these.
    """

    def decode_image(self, payload: bytes) -> dict:
        if payload is None:
            raise NotImplementedError("no payload; real decode needs media libs")
        h = hashlib.sha256(payload).digest()
        return {
            "mean_pixel": h[0] / 255.0,
            "entropy_proxy": len(zlib.compress(payload)) / max(len(payload), 1),
        }

    def resize_image(self, payload: bytes, w: int, h: int) -> bytes:
        # Real backend: PIL resize. Fake: tag+truncate, deterministic.
        head = f"resized:{w}x{h}:".encode()
        return head + hashlib.sha256(payload).digest()

    def sample_frames(self, payload: bytes, every_n: int) -> list[bytes]:
        # Real backend: av frame iteration. Fake: n deterministic chunks.
        n = max(1, 8 // every_n)
        return [hashlib.sha256(payload + bytes([i])).digest() for i in range(n)]


class StdlibCodecBackend(DecodeBackend):
    """REAL decode for the formats the standard library reaches: PNG
    images (zlib inflate + unfilter, ``operators/codecs.py``) and WAV
    audio. Payloads outside those formats raise — the honest seam where
    PIL/av slot in (override just these methods).
    """

    def decode_image(self, payload: bytes) -> dict:
        from ig_etl_sync_spark.operators import codecs

        if payload is None:
            raise NotImplementedError("no payload")
        w, h, c, pix = codecs.png_decode(payload)
        import numpy as np

        arr = np.frombuffer(pix, dtype=np.uint8)
        return {
            "mean_pixel": float(arr.mean()) / 255.0 if len(arr) else 0.0,
            "entropy_proxy": len(zlib.compress(payload)) / max(len(payload), 1),
        }

    def resize_image(self, payload: bytes, w: int, h: int) -> bytes:
        from ig_etl_sync_spark.operators import codecs

        return codecs.png_resize_nearest(payload, w, h)

    def decode_audio(self, payload: bytes) -> dict:
        from ig_etl_sync_spark.operators import codecs

        return codecs.wav_decode(payload)


def audio_features(
    df: DataFrame,
    backend: "StdlibCodecBackend | None" = None,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Arrow-batched audio decode → (rate, channels, duration, rms,
    peak). Same mapInPandas shape as :func:`decode_features`."""
    import pandas as pd

    be = backend or StdlibCodecBackend()
    id_type = df.schema[id_col].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                be.decode_audio(p) if p is not None else {}
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "sample_rate": [f.get("sample_rate") for f in feats],
                    "n_channels": [f.get("n_channels") for f in feats],
                    "duration_sec": [f.get("duration_sec") for f in feats],
                    "rms": [f.get("rms") for f in feats],
                    "peak": [f.get("peak") for f in feats],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        run,
        schema=(
            f"{id_col} {id_type}, sample_rate int, n_channels int, "
            "duration_sec double, rms double, peak double"
        ),
    )


def read_binary_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Media ingestion from storage: path, mtime, length, content."""
    return (
        spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    )


def with_payload_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap JVM-side payload facts (no decode): byte length + md5."""
    return df.withColumn("payload_bytes", F.length(F.col(payload_col))).withColumn(
        "payload_md5", F.md5(F.col(payload_col))
    )


def decode_features(
    df: DataFrame,
    backend: DecodeBackend | None = None,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Arrow-batched decode → feature columns. The returned schema is
    fixed regardless of backend, so downstream plans are stable."""
    import pandas as pd

    be = backend or DecodeBackend()
    id_type = df.schema[id_col].dataType.simpleString()  # follow input type

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                be.decode_image(p) if p is not None else {"mean_pixel": None, "entropy_proxy": None}
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "mean_pixel": [f["mean_pixel"] for f in feats],
                    "entropy_proxy": [f["entropy_proxy"] for f in feats],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=f"{id_col} {id_type}, mean_pixel double, entropy_proxy double"
    )


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    backend: DecodeBackend | None = None,
    payload_col: str = "payload",
) -> DataFrame:
    import pandas as pd

    be = backend or DecodeBackend()
    # Ensure width/height exist in the OUTPUT schema — mapInPandas drops
    # any pandas column not in the declared schema, so inputs without
    # these columns (e.g. sample_video_frames output) must gain them
    # before the map.
    work = df
    for c in ("width", "height"):
        if c not in work.columns:
            work = work.withColumn(c, F.lit(None).cast("int"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[payload_col] = [
                be.resize_image(p, width, height) if p is not None else None
                for p in pdf[payload_col]
            ]
            pdf["width"] = width
            pdf["height"] = height
            yield pdf

    return work.mapInPandas(run, schema=work.schema)


def sample_video_frames(
    df: DataFrame,
    every_n: int = 2,
    backend: DecodeBackend | None = None,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Video → one row per sampled frame (frame payload + index)."""
    import pandas as pd

    be = backend or DecodeBackend()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for _, row in pdf.iterrows():
                if row[payload_col] is None:
                    continue
                for i, fr in enumerate(be.sample_frames(row[payload_col], every_n)):
                    ids.append(row[id_col])
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame({id_col: ids, "frame_index": idxs, "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=f"{id_col} long, frame_index int, frame binary"
    )


def synthetic_media(spark: SparkSession, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic fake media table for tests/benchmarks."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * 32  # 1 KiB
        rows.append((i, kind, payload, f"{kind}/fake", 64, 64, None, 8))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
