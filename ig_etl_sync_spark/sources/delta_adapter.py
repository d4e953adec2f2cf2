"""Optional Delta Lake adapter behind the same versioned-table
interface (``backend="delta"``).

The three hand-rolled backends in :mod:`versioned` model the protocol
shapes locally; this adapter swaps in the REAL ``delta-spark`` package
for production object-store deployments — same ``read / write /
write_incremental / versions / read_version / vacuum`` surface, so
:class:`~ig_etl_sync_spark.operators.graph.GraphStore` and
:class:`~ig_etl_sync_spark.operators.reconcile.SnapshotStore` take it
through the ordinary ``backend=`` switch.

Requirements (why this module is import-guarded):

- the ``delta-spark`` pip package, and
- a SparkSession built with the Delta extensions
  (``spark.sql.extensions = io.delta.sql.DeltaSparkSessionExtension``
  and the Delta catalog), e.g. via
  ``delta.configure_spark_with_delta_pip(builder).getOrCreate()``.

Mapping onto the Delta protocol:

- ``write``            → full ``overwrite`` (one commit).
- ``write_incremental``→ ``overwrite`` with ``replaceWhere`` on the
  dirty partition values — Delta's native incremental MERGE shape: the
  commit replaces exactly the predicate's rows and re-lists every other
  data file in the new snapshot (the same metadata swap
  :class:`~ig_etl_sync_spark.sources.versioned.DeltaManifestTable`
  models by hand). A dirty value absent from ``df`` simply has its rows
  deleted, matching the local backends' partition-drop semantics. The
  unpartitioned-previous-write hazard of the local backends does NOT
  exist here: ``replaceWhere`` keeps every non-matching row no matter
  how the table is laid out, so ``absorb_unpartitioned`` is accepted
  and ignored.
- ``versions``/``read_version`` → the commit history / ``versionAsOf``
  time travel. Version ids are stringified Delta commit numbers.
- ``vacuum``           → ``DeltaTable.vacuum`` (reference-counted file
  reclamation with the same retention-window contract).
- ``keep`` is accepted for interface parity and ignored: Delta retains
  history by time (``delta.logRetentionDuration``), not count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # pragma: no cover - exercised only where delta-spark is installed
    from delta.tables import DeltaTable as _DeltaTable

    HAVE_DELTA = True
except ImportError:  # pragma: no cover
    _DeltaTable = None
    HAVE_DELTA = False

__all__ = ["DeltaLakeTable", "HAVE_DELTA"]

#: stock Delta refuses retention windows below this (168 h) unless
#: spark.databricks.delta.retentionDurationCheck.enabled=false
_MIN_CHECKED_RETENTION_S = 168 * 3600.0


def check_retention_window(
    min_age_seconds: float, duration_check_enabled: bool
) -> None:
    """Raise the descriptive error stock Delta would hide behind an
    ``IllegalArgumentException``: with retentionDurationCheck enabled
    (the default), VACUUM windows under 168 h are rejected. Split out
    (and unit-tested) package-free — the adapter itself needs
    delta-spark, which this sandbox cannot install."""
    if duration_check_enabled and min_age_seconds < _MIN_CHECKED_RETENTION_S:
        raise ValueError(
            f"vacuum(min_age_seconds={min_age_seconds}) is below stock "
            "Delta's 168 h retention floor; either pass >= 604800 "
            "seconds or set spark.databricks.delta."
            "retentionDurationCheck.enabled=false to opt into short "
            "windows (concurrent readers of vacuumed versions will "
            "break — that is what the check guards)"
        )


class DeltaLakeTable:
    """Versioned-table handle backed by a real Delta Lake table."""

    def __init__(self, spark: SparkSession, path: str) -> None:
        if not HAVE_DELTA:
            raise ImportError(
                "backend='delta' requires the optional delta-spark "
                "package (pip install delta-spark) and a SparkSession "
                "built with the Delta extensions; the hand-rolled "
                "'pointer'/'txnlog'/'manifest' backends need neither"
            )
        self.spark = spark
        self.path = path

    # -- head / history ----------------------------------------------

    def exists(self) -> bool:
        return _DeltaTable.isDeltaTable(self.spark, self.path)

    def _history_versions(self) -> list[int]:
        dt = _DeltaTable.forPath(self.spark, self.path)
        return sorted(
            r["version"] for r in dt.history().select("version").collect()
        )

    def latest_version(self) -> str | None:
        if not self.exists():
            return None
        return str(self._history_versions()[-1])

    def versions(self) -> list[str]:
        """Commit ids from the retained LOG history, oldest first.

        Weaker contract than the local backends: Delta retains log
        entries (``delta.logRetentionDuration``) independently of data
        files, so after a :meth:`vacuum` an old commit can still be
        listed here while its data files are gone — reading it fails
        inside Delta at action time with a file-not-found. The local
        backends list only truly readable versions; treat this listing
        as log history, not a readability guarantee."""
        if not self.exists():
            return []
        return [str(v) for v in self._history_versions()]

    # -- read --------------------------------------------------------

    def read(self) -> DataFrame | None:
        if not self.exists():
            return None
        return self.spark.read.format("delta").load(self.path)

    def read_version(self, version: str) -> DataFrame:
        """Time travel to a logged commit. NOTE: presence in
        :meth:`versions` means the commit is in the log, not that its
        data files survived a prior :meth:`vacuum` — a vacuumed version
        passes this validation and fails lazily inside Delta (file not
        found) when the returned frame is acted on."""
        if not self.exists() or str(int(version)) not in self.versions():
            raise ValueError(
                f"version {version!r} not in the retained history under "
                f"{self.path} (have: {self.versions()})"
            )
        return (
            self.spark.read.format("delta")
            .option("versionAsOf", int(version))
            .load(self.path)
        )

    # -- write -------------------------------------------------------

    def write(self, df: DataFrame, keep: int = 3) -> str:
        (
            df.write.format("delta")
            .mode("overwrite")
            .option("overwriteSchema", "true")
            .save(self.path)
        )
        return self.latest_version()

    def write_incremental(
        self,
        df: DataFrame,
        partition_col: str,
        dirty_values: set[str],
        keep: int = 3,
        absorb_unpartitioned: bool = False,
    ) -> str:
        dirty = sorted(str(v) for v in dirty_values)
        stray = {
            str(r[0])
            for r in df.select(partition_col).distinct().collect()
        } - set(dirty)
        if stray:
            raise ValueError(
                f"write_incremental: df contains rows for partitions "
                f"{sorted(stray)} not declared dirty {dirty} — they "
                "would collide with the replaceWhere predicate"
            )
        if not self.exists():
            (
                df.write.format("delta")
                .partitionBy(partition_col)
                .save(self.path)
            )
            return self.latest_version()
        # string-compare the partition value exactly like the local
        # backends (their dirty sets are stringified); the cast costs
        # partition-file pruning on non-string columns but keeps the
        # predicate type-safe for any column type.
        quoted = ", ".join("'" + v.replace("'", "''") + "'" for v in dirty)
        (
            df.repartition(F.col(partition_col))
            .write.format("delta")
            .mode("overwrite")
            .option(
                "replaceWhere",
                f"CAST({partition_col} AS STRING) IN ({quoted})",
            )
            .save(self.path)
        )
        return self.latest_version()

    # -- retention ---------------------------------------------------

    def vacuum(self, min_age_seconds: float = 3600.0) -> list[str]:
        """Delta VACUUM with the same retention-window SEMANTICS as the
        local backends — but NOT the same accepted range: stock
        delta-spark's retentionDurationCheck rejects windows under
        168 h, so the interface default (1 h) would throw inside Delta.
        Rather than let that surface as an opaque
        ``IllegalArgumentException``, a sub-168 h window is refused here
        with the fix spelled out (set
        ``spark.databricks.delta.retentionDurationCheck.enabled=false``
        to opt into short windows, exactly as Delta requires).

        Delta does not report the removed paths through this API —
        returns an empty list (callers treat the result as advisory)."""
        if not self.exists():
            return []
        check_enabled = str(
            self.spark.conf.get(
                "spark.databricks.delta.retentionDurationCheck.enabled",
                "true",
            )
        ).lower() != "false"
        check_retention_window(min_age_seconds, check_enabled)
        dt = _DeltaTable.forPath(self.spark, self.path)
        dt.vacuum(min_age_seconds / 3600.0)
        return []
