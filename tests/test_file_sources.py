"""CSV / JSONL sources: schema discipline, FAILFAST semantics."""

from __future__ import annotations

import pytest

from ig_etl_sync_spark.sources.files import read_csv, read_jsonl

SCHEMA = "id long, name string, score double"


def test_read_csv_roundtrip(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("id,name,score\n1,alpha,1.5\n2,beta,2.5\n")
    got = read_csv(spark, str(p), SCHEMA).collect()
    assert [(r["id"], r["name"], r["score"]) for r in got] == [
        (1, "alpha", 1.5),
        (2, "beta", 2.5),
    ]


def test_read_csv_failfast_on_bad_row(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("id,name,score\n1,alpha,notanumber\n")
    with pytest.raises(Exception) as ei:
        read_csv(spark, str(p), SCHEMA).collect()
    assert "Malformed" in str(ei.value) or "FAILFAST" in str(ei.value)


def test_read_csv_permissive_optin(spark, tmp_path):
    p = tmp_path / "bad2.csv"
    p.write_text("id,name,score\n1,alpha,notanumber\n2,beta,2.5\n")
    got = read_csv(spark, str(p), SCHEMA, mode="PERMISSIVE").collect()
    assert len(got) == 2
    assert got[0]["score"] is None  # malformed cell -> NULL, row kept


def test_read_jsonl_roundtrip_and_failfast(spark, tmp_path):
    p = tmp_path / "t.jsonl"
    p.write_text('{"id": 1, "name": "a", "score": 0.5}\n'
                 '{"id": 2, "name": "b", "score": 1.5}\n')
    got = read_jsonl(spark, str(p), SCHEMA).collect()
    assert [(r["id"], r["name"], r["score"]) for r in got] == [
        (1, "a", 0.5),
        (2, "b", 1.5),
    ]
    bad = tmp_path / "bad.jsonl"
    bad.write_text('{"id": 1, "name": "a"}\nnot json at all\n')
    with pytest.raises(Exception):
        read_jsonl(spark, str(bad), SCHEMA).collect()


def test_sources_reject_missing_schema(spark, tmp_path):
    with pytest.raises(ValueError):
        read_csv(spark, str(tmp_path), None)
    with pytest.raises(ValueError):
        read_jsonl(spark, str(tmp_path), None)


def test_orc_roundtrip_with_pushdown(spark, tmp_path, sf_dir):
    from pyspark.sql import functions as F

    from ig_etl_sync_spark.sources.catalog import load_table
    from ig_etl_sync_spark.sources.files import read_orc, write_orc

    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    write_orc(nation, path, partition_by=["n_regionkey"])

    back = read_orc(spark, path)
    assert back.count() == nation.count()
    assert set(back.columns) == set(nation.columns)
    # values identical (partition col round-trips through the dir name)
    a = sorted(map(tuple, nation.select("n_nationkey", "n_name", "n_regionkey").collect()))
    b = sorted(map(tuple, back.select("n_nationkey", "n_name", "n_regionkey").collect()))
    assert a == b
    # partition pruning reaches the scan
    plan = back.where(F.col("n_regionkey") == 1)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "n_regionkey" in plan
