"""Versioned parquet tables: immutable versions behind two interchangeable
commit protocols.

- :class:`VersionedParquetTable` — atomic ``_LATEST`` pointer flip.
  Correct wherever rename is atomic (POSIX, HDFS, ABFS).
- :class:`TransactionLogTable` — Delta-protocol-shaped append-only
  commit log. The latest version is *derived* from the max-numbered log
  entry instead of a mutable pointer, and commit numbers are claimed
  create-exclusively, so it also models object stores where rename is
  copy+delete and last-writer-wins pointer flips can silently drop a
  concurrent commit.

Both publish immutable version directories first and make them visible
last, so readers never observe partial writes and a reader holding
version N stays isolated from a concurrent commit of N+1 (R6).
Select via :func:`make_table` / the stores' ``backend=`` argument.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

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

    def versions(self) -> list[str]:
        """Retained version ids, oldest first (gc keeps the newest
        ``keep``; older ids are gone)."""
        if not os.path.isdir(self.path):
            return []
        return sorted(v for v in os.listdir(self.path) if v.startswith("v"))

    def read_version(self, version: str) -> DataFrame:
        """Time travel: read a specific retained version."""
        p = os.path.join(self.path, version)
        if not os.path.isdir(p):
            raise ValueError(
                f"version {version!r} not retained under {self.path} "
                f"(have: {self.versions()})"
            )
        return self.spark.read.parquet(p)

    def _gc(self, keep: int) -> None:
        versions = sorted(v for v in os.listdir(self.path) if v.startswith("v"))
        for v in versions[:-keep]:
            shutil.rmtree(os.path.join(self.path, v), ignore_errors=True)


class TransactionLogTable:
    """Append-only commit-log table (the Delta/Iceberg protocol shape).

    Layout::

        path/_log/00000000.json   {"version": "d-<hex>", "ts": ...}
        path/_log/00000001.json   ...
        path/d-<hex>/             immutable parquet data dirs

    - **Readers** list ``_log/`` once, take the max-numbered entry, and
      read the immutable data dir it names. No mutable pointer exists.
    - **Writers** stage data under a unique dir name, then claim the
      next commit number by hard-linking a fully-written tmp file to
      ``<n>.json`` — creation is exclusive, so two concurrent writers
      cannot both win commit ``n``; the loser re-reads the head and
      retries (optimistic concurrency). A pointer flip would instead
      silently drop one of the two commits.
    - **Crashes** leave either a staged dir no log entry references
      (invisible; removed by :meth:`vacuum`) or a tmp file that never
      became a commit — readers can never observe a half-commit.

    Same interface as :class:`VersionedParquetTable`.
    """

    _MAX_CLAIM_RETRIES = 100

    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path

    @property
    def _log_dir(self) -> str:
        return os.path.join(self.path, "_log")

    def _commits(self) -> list[str]:
        if not os.path.isdir(self._log_dir):
            return []
        return sorted(
            f for f in os.listdir(self._log_dir)
            if f.endswith(".json") and f[:-5].isdigit()
        )

    def latest_version(self) -> str | None:
        # A concurrent writer's _gc may unlink the entry between our
        # listing and open — but it can only ever gc NON-head entries,
        # so a re-list sees the (newer) head and succeeds. Bounded
        # retries guard against a pathological stream of commits.
        for _ in range(10):
            commits = self._commits()
            if not commits:
                return None
            try:
                with open(os.path.join(self._log_dir, commits[-1])) as f:
                    return json.load(f)["version"]
            except FileNotFoundError:
                continue
        raise RuntimeError(
            f"log head kept disappearing under {self._log_dir} "
            "(gc racing faster than re-listing)"
        )

    def exists(self) -> bool:
        return self.latest_version() is not None

    def read(self) -> DataFrame | None:
        v = self.latest_version()
        if v is None:
            return None
        return self.spark.read.parquet(os.path.join(self.path, v))

    def write(self, df: DataFrame, keep: int = 3) -> str:
        os.makedirs(self._log_dir, exist_ok=True)
        staged = f"d-{uuid.uuid4().hex[:12]}"
        df.write.mode("overwrite").parquet(os.path.join(self.path, staged))
        for _ in range(self._MAX_CLAIM_RETRIES):
            commits = self._commits()
            n = int(commits[-1][:-5]) + 1 if commits else 0
            entry = os.path.join(self._log_dir, f"{n:08d}.json")
            tmp = os.path.join(
                self._log_dir, f".{uuid.uuid4().hex[:8]}.tmp"
            )
            with open(tmp, "w") as f:
                json.dump({"version": staged, "commit": n, "ts": time.time()}, f)
            try:
                # Hard-link publish: create-exclusive (loses cleanly to a
                # concurrent claimant) AND atomic (the linked name appears
                # fully written or not at all).
                os.link(tmp, entry)
            except FileExistsError:
                os.unlink(tmp)
                continue  # lost the race — recompute head, try again
            os.unlink(tmp)
            self._gc(keep)
            return staged
        raise RuntimeError(
            f"could not claim a commit number after "
            f"{self._MAX_CLAIM_RETRIES} attempts under {self._log_dir}"
        )

    def versions(self) -> list[str]:
        """Retained version ids in commit order (the log IS the
        history; gc'd commits are gone)."""
        out = []
        for c in self._commits():
            try:
                with open(os.path.join(self._log_dir, c)) as f:
                    out.append(json.load(f)["version"])
            except (OSError, ValueError, KeyError):
                continue
        return out

    def read_version(self, version: str) -> DataFrame:
        """Time travel: read a specific still-retained committed version."""
        if version not in self.versions():
            raise ValueError(
                f"version {version!r} not in the retained log under "
                f"{self.path} (have: {self.versions()})"
            )
        return self.spark.read.parquet(os.path.join(self.path, version))

    def _gc(self, keep: int) -> None:
        """Drop all but the newest ``keep`` commits and their data dirs.

        Staged-but-never-committed dirs (crashed writers) are NOT
        touched here — a slow concurrent writer's staged dir is
        indistinguishable from a crashed one without an age bound; use
        :meth:`vacuum` for those.
        """
        commits = self._commits()
        for c in commits[:-keep]:
            p = os.path.join(self._log_dir, c)
            try:
                with open(p) as f:
                    v = json.load(f)["version"]
                shutil.rmtree(os.path.join(self.path, v), ignore_errors=True)
            except (OSError, ValueError, KeyError):
                pass
            try:
                os.unlink(p)
            except OSError:
                pass

    def vacuum(self, min_age_seconds: float = 3600.0) -> list[str]:
        """Remove staged data dirs no commit references, once they are
        older than ``min_age_seconds`` (the age bound keeps a slow
        in-flight writer's staged dir safe — same contract as Delta's
        VACUUM retention window)."""
        live = set()
        for c in self._commits():
            try:
                with open(os.path.join(self._log_dir, c)) as f:
                    live.add(json.load(f)["version"])
            except (OSError, ValueError, KeyError):
                pass
        removed = []
        now = time.time()
        if not os.path.isdir(self.path):
            return removed
        for d in os.listdir(self.path):
            full = os.path.join(self.path, d)
            if (
                d.startswith("d-")
                and d not in live
                and os.path.isdir(full)
                and now - os.path.getmtime(full) >= min_age_seconds
            ):
                shutil.rmtree(full, ignore_errors=True)
                removed.append(d)
        return removed


#: Registry for the stores' ``backend=`` argument.
TABLE_BACKENDS = {
    "pointer": VersionedParquetTable,
    "txnlog": TransactionLogTable,
}


def make_table(
    spark: SparkSession, path: str, backend: str = "pointer"
) -> VersionedParquetTable | TransactionLogTable:
    """Construct a versioned-table handle for ``path``.

    ``backend="pointer"`` (default) = atomic ``_LATEST`` pointer flip;
    ``backend="txnlog"`` = append-only commit log (object-store-safe).
    """
    try:
        cls = TABLE_BACKENDS[backend]
    except KeyError:
        raise ValueError(
            f"unknown table backend {backend!r}; "
            f"choose one of {sorted(TABLE_BACKENDS)}"
        ) from None
    return cls(spark, path)
