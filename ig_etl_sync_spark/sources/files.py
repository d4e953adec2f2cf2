"""Delimited / line-oriented file sources (CSV, JSONL) with the same
discipline as the JSON sources: explicit schemas, fail-fast parsing.

Why schemas are REQUIRED: at 100 TB, inference means a full extra read
of the data before the real one, and a schema that drifts with the
sample. An explicit schema makes the scan single-pass, lets Catalyst
prune columns into the reader, and turns source drift into an
immediate FAILFAST error instead of silent NULLs — the same
empty-document lesson as ``read_json_document``
(PERMISSIVE + inference turns a malformed payload into an all-null
row and a silently no-op sync).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

__all__ = ["read_csv", "read_jsonl", "read_orc", "write_orc"]


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    *,
    header: bool = True,
    delimiter: str = ",",
    mode: str = "FAILFAST",
    **options: str,
) -> DataFrame:
    """CSV scan with explicit schema. ``mode`` defaults to FAILFAST —
    a row that does not parse raises instead of becoming NULLs
    (PERMISSIVE is opt-in via ``mode='PERMISSIVE'`` plus a
    ``columnNameOfCorruptRecord`` option if triage is wanted)."""
    if schema is None:  # defensive: None would silently re-enable inference
        raise ValueError("read_csv requires an explicit schema")
    return (
        spark.read.schema(schema)
        .options(header=str(header).lower(), sep=delimiter, mode=mode, **options)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    *,
    mode: str = "FAILFAST",
    **options: str,
) -> DataFrame:
    """Newline-delimited JSON scan with explicit schema (the bulk-file
    big sibling of ``read_json_files``; one JSON object per line, the
    standard crawl/export interchange format)."""
    if schema is None:
        raise ValueError("read_jsonl requires an explicit schema")
    return (
        spark.read.schema(schema).options(mode=mode, **options).json(path)
    )


def read_orc(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """ORC scan (Spark-native columnar format alongside parquet).

    Schema is OPTIONAL here — unlike CSV/JSONL, ORC files carry their
    own typed schema in the footer, so there is no inference pass to
    avoid; passing one still prunes/validates (reads fail on
    incompatible types rather than drifting). ORC scans get the same
    Catalyst treatment as parquet: predicate pushdown, column pruning,
    partition pruning.
    """
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "zstd",
) -> None:
    """ORC write with zstd compression (the parquet-path default here
    too); ``partition_by`` gives hive-style directory pruning exactly
    as the parquet layout writers do."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
