"""SparkSession factory with scale-oriented defaults.

Local tests run on ``local[N]``; the same config block is what we would
ship to a 1000-executor cluster (AQE on, skew-join handling on, Arrow
for any Python exchange, sensible shuffle partitioning). Nothing here is
host-specific.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Defaults chosen for the scale posture (see SURVEY.md §7 "hard parts"):
#: - AQE re-plans shuffles at runtime (coalesces small partitions, splits
#:   skewed ones, demotes to broadcast when a side turns out small).
#: - Arrow makes any unavoidable Python exchange columnar/batched.
#: - maxPartitionBytes keeps scan partitions bounded so a 100 TB input
#:   splits into ~800k tasks instead of a few giant ones.
DEFAULT_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.files.maxPartitionBytes": "128m",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.session.timeZone": "UTC",
    # Read parquet TIMESTAMP(NANOS) (e.g. events.ts) as long; the catalog
    # converts to microsecond timestamps explicitly (timestamp_micros).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.driver.memory": "8g",
    # Local-mode UI is dead weight in tests/bench.
    "spark.ui.enabled": "false",
    # Streaming state posture: the default HDFSBackedStateStoreProvider
    # keeps every key in executor heap — per-fingerprint dedup state
    # over a 100 TB corpus (billions of keys) cannot fit. RocksDB spills
    # state to local disk (bounded heap regardless of key count) and
    # changelog checkpointing uploads per-batch deltas instead of full
    # SST snapshots. Bundled with Spark since 3.2 — no extra jars.
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": (
        "true"
    ),
}


def get_spark(
    app_name: str = "ig-etl-sync-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster the caller leaves it unset and spark-submit provides it.
    ``shuffle_partitions`` defaults to the parallelism of the master —
    on a cluster you would size this to ~2-3× total cores (or rely on AQE
    coalescing from a high initial value).
    """
    # Python workers (pandas UDF / mapInPandas) unpickle closures that
    # reference this package — make it importable in worker processes.
    # On a cluster this is `--py-files` / a wheel; locally PYTHONPATH.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = SparkSession.builder.appName(app_name).master(master)
    confs = dict(DEFAULT_CONFS)
    confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
