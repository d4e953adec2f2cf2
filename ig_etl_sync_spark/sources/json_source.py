"""Semi-structured JSON sources.

The reference ingests one nested JSON document per sync over HTTP
(reference ``main.go:125-145``) and declares-but-never-implements a file
source (``internal/model/model.go:19,37-44``). Here both are first-class:

- ``read_json_string`` / ``read_json_document``: a single in-memory
  document → single-row DataFrame (the reference's shape).
- ``read_json_files``: ``spark.read.json`` over a path/glob — the scale
  path; with an explicit schema Spark skips inference and prunes columns.
- ``read_http_json``: driver-side fetch of ONE url (reference parity),
  and ``fetch_url_partitions`` for fetching a *list* of URLs from
  executors via ``mapInPandas`` — the 100 TB-safe pattern where the URL
  list itself is a DataFrame and fetches parallelize per partition.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_json_string(
    spark: SparkSession, payload: str, schema: StructType | str | None = None
) -> DataFrame:
    """One JSON document string → one-row DataFrame.

    Uses the parallelize-then-read pattern so nested arrays/structs come
    back as real Spark types (not strings); with ``schema`` given, no
    inference pass happens.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(spark.sparkContext.parallelize([payload], 1))


def read_json_document(
    spark: SparkSession, doc: dict[str, Any], schema: StructType | str | None = None
) -> DataFrame:
    """Python dict (already-parsed document) → one-row DataFrame.

    Rejects strings: double-encoding a pre-serialized payload would
    parse as one JSON string scalar, which PERMISSIVE mode turns into
    an all-null row — the sync would silently no-op. Use
    :func:`read_json_string` for raw payloads.
    """
    if isinstance(doc, (str, bytes)):
        raise TypeError(
            "read_json_document expects a parsed dict; pass raw JSON "
            "strings to read_json_string instead"
        )
    return read_json_string(spark, json.dumps(doc), schema=schema)


def read_json_files(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    multiline: bool = False,
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.option("multiLine", multiline).json(path)


def read_http_json(
    spark: SparkSession,
    url: str,
    token: str | None = None,
    schema: StructType | str | None = None,
    fetcher: Callable[[str, dict[str, str]], str] | None = None,
) -> DataFrame:
    """Reference-parity single-document HTTP source (``main.go:125-145``).

    Driver-side fetch is correct here because the source is ONE document;
    for many documents use :func:`fetch_url_partitions`. ``fetcher`` is
    injectable for tests (no network in the sandbox).
    """
    headers = {"Authorization": f"Bearer {token}"} if token else {}
    if fetcher is None:
        fetcher = _default_fetcher
    body = fetcher(url, headers)
    return read_json_string(spark, body, schema=schema)


def _default_fetcher(url: str, headers: dict[str, str]) -> str:
    import urllib.request

    req = urllib.request.Request(url, headers=headers)
    with urllib.request.urlopen(req, timeout=30) as resp:  # noqa: S310
        return resp.read().decode("utf-8")


def fetch_url_partitions(
    urls: DataFrame,
    out_schema: StructType | str,
    fetcher: Callable[[str, dict[str, str]], str] | None = None,
    url_col: str = "url",
    token_col: str | None = None,
) -> DataFrame:
    """Executor-side fan-out fetch: one row per URL in, parsed docs out.

    This is how the reference's single-fetch design scales: the URL list
    is a DataFrame (repartitioned by the caller to control fetch
    parallelism) and each partition fetches its URLs inside
    ``mapInPandas`` — no driver bottleneck, no collect.
    """
    import pandas as pd

    fetch = fetcher or _default_fetcher

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                headers = (
                    {"Authorization": f"Bearer {row[token_col]}"} if token_col else {}
                )
                rows.append(fetch(row[url_col], headers))
            yield pd.DataFrame({"json": rows})

    raw = urls.mapInPandas(run, schema="json string")
    return raw.select(F.from_json("json", out_schema).alias("doc")).select("doc.*")
