"""Bucketed tables: pre-shuffled storage for co-located joins/aggs.

The 100 TB pattern: a table that is repeatedly joined or aggregated on
one key gets written ONCE with ``bucketBy(n, key)`` — every row lands
in bucket ``hash(key) % n`` at write time. Any later equi-join between
two tables bucketed by the same key into the same bucket count (and any
groupBy on the key) reads co-located data and skips the exchange
entirely: the shuffle is paid once at write, amortized over every
subsequent query. This is the storage-level analog of the reference's
index DDL (SURVEY §2.1 S7; ``GraphStore.optimize`` is the in-table
sort-rewrite form).

Requires a table catalog (``saveAsTable``) — plain ``parquet(path)``
writes cannot carry bucket metadata. Locally this is the
``spark-warehouse`` dir; on a cluster, Hive/Unity/Glue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by ``key``.

    ``n_buckets`` must match between tables that should co-join
    shuffle-free; pick it once per key domain (≈ target parallelism).
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *keys)
    )
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str]
) -> DataFrame:
    """Equi-join two same-key same-count bucketed tables. With bucketing
    metadata present, Spark plans this WITHOUT an exchange on either
    side (verified in tests/test_plans.py)."""
    return spark.table(left_table).join(spark.table(right_table), on)
