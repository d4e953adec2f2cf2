"""Versioned parquet table: immutable versions + atomic pointer flip.

Plain-parquet stand-in for a Delta/Iceberg table: every write publishes
a new version directory and atomically swaps a ``_LATEST`` pointer, so
readers never see partial writes and a reader holding version N is
isolated from a concurrent commit of N+1. On a real cluster the pointer
file would live on an atomic-rename store (HDFS/ABFS) or be replaced by
Delta's transaction log; semantics here are identical.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


class VersionedParquetTable:
    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_LATEST")

    def latest_version(self) -> str | None:
        if not os.path.exists(self._pointer):
            return None
        with open(self._pointer) as f:
            return json.load(f)["version"]

    def exists(self) -> bool:
        return self.latest_version() is not None

    def read(self) -> DataFrame | None:
        v = self.latest_version()
        if v is None:
            return None
        return self.spark.read.parquet(os.path.join(self.path, v))

    def write(self, df: DataFrame, keep: int = 3) -> str:
        os.makedirs(self.path, exist_ok=True)
        prev = self.latest_version()
        nxt = f"v{(int(prev[1:]) + 1) if prev else 0:06d}"
        df.write.mode("overwrite").parquet(os.path.join(self.path, nxt))
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": nxt, "ts": time.time()}, f)
        os.replace(tmp, self._pointer)
        self._gc(keep)
        return nxt

    def _gc(self, keep: int) -> None:
        versions = sorted(v for v in os.listdir(self.path) if v.startswith("v"))
        for v in versions[:-keep]:
            shutil.rmtree(os.path.join(self.path, v), ignore_errors=True)
