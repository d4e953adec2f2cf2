"""UDF surface (SURVEY §2.7): session-registered functions reach
transform specs through expr: projections — the FuncMap analog
end-to-end, plus the Arrow-vectorized pandas_udf path."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pytest
from pyspark.sql.functions import pandas_udf

from ig_etl_sync_spark.operators.transforms import TransformSpec
from ig_etl_sync_spark.sources.json_source import read_json_document


def test_registered_udf_callable_from_spec(spark):
    spark.udf.register("slugify", lambda s: s.lower().replace(" ", "-"), "string")
    doc = read_json_document(
        spark, {"items": [{"id": "A", "title": "Hello World"}]},
        schema="items array<struct<id:string,title:string>>",
    )
    spec = TransformSpec(
        name="slug", explode=(("items", "it"),),
        project={"external_id": "it.id", "slug": "expr:slugify(it.title)"},
    )
    assert spec.apply(doc).collect()[0]["slug"] == "hello-world"


def test_pandas_udf_vectorized(spark):
    @pandas_udf("double")
    def zscore(v: pd.Series) -> pd.Series:
        return (v - v.mean()) / v.std()

    df = spark.createDataFrame([(float(i),) for i in range(10)], "x double")
    # single partition so mean/std are global for the assertion
    out = df.coalesce(1).select(zscore("x").alias("z")).collect()
    zs = [r["z"] for r in out]
    assert abs(sum(zs)) < 1e-9  # standardized: mean 0
    assert max(zs) > 1.0


def test_grouped_pandas_udf(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (1, 3.0), (2, 10.0), (2, 30.0)], "g int, v double"
    )

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf["v"] = pdf["v"] - pdf["v"].mean()
        return pdf

    out = df.groupBy("g").applyInPandas(demean, "g int, v double").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r["v"])
    assert sorted(by_g[1]) == [-1.0, 1.0]
    assert sorted(by_g[2]) == [-10.0, 10.0]
