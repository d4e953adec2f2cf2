"""Stringly-JSON property extraction (SURVEY §2.9 X6).

The reference's inputs are untyped nested JSON (``main.go:140-144``); the
driver's ``events.props`` column is the same shape as a string. Both
``get_json_object`` (path extraction without full parse — cheap when you
need one key) and ``from_json`` (full typed parse — right when you need
many keys, parses once) stay JVM-side inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def extract_json_field(col: str | Column, path: str) -> Column:
    """``$.k``-style single-field extraction, JVM-native."""
    c = F.col(col) if isinstance(col, str) else col
    if not path.startswith("$"):
        path = "$." + path
    return F.get_json_object(c, path)


def parse_json_column(
    df: DataFrame, col: str, schema: StructType | str, out_col: str | None = None
) -> DataFrame:
    """Full typed parse of a JSON string column into a struct column."""
    return df.withColumn(out_col or f"{col}_parsed", F.from_json(F.col(col), schema))
