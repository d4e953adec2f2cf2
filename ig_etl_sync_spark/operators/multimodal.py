"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partition sizing,
Arrow batch shape, UDF signatures; the codec step itself is stubbed
behind ``DecodeBackend`` because media libraries are not available in
this environment. Swapping in a real backend (PIL/av/librosa) changes
ONE function, not the pipeline.

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
