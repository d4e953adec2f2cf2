"""Benchmark decontamination: overlap semantics + plan-shape invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ig_etl_sync_spark.operators.dataprep import decontaminate


@pytest.fixture(scope="module")
def corpus(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),   # shares 3-grams with bench
            (2, "zeta eta theta iota kappa"),        # clean
            (3, "alpha beta gamma zeta eta theta"),  # one bench 3-gram
            (4, "alpha alpha alpha alpha"),          # repeated; distinct grams
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta"), (101, "nothing shared here at all")],
        ["doc_id", "text"],
    )
    return train, bench


def test_overlap_counts(spark, corpus):
    train, bench = corpus
    got = {
        r["doc_id"]: (r["n_grams"], r["n_contaminated"], r["frac"])
        for r in decontaminate(train, bench, shingle_k=3).collect()
    }
    # doc 1: grams {abg, bgd, gde} — bench has {abg, bgd}; 2/3
    assert got[1] == (3, 2, round(2 / 3, 4))
    # doc 3: grams {abg, bgz, gze, zet} — bench has {abg}; 1/4
    assert got[3][1] == 1 and got[3][0] == 4
    # doc 2 clean, dropped; doc 4 has gram "alpha alpha alpha" (distinct=2: 4 tokens -> 2 grams, both repeated->distinct {aaa}) not in bench
    assert 2 not in got and 4 not in got


def test_self_contamination_full(spark, corpus):
    train, bench = corpus
    # a doc checked against itself is 100% contaminated
    got = decontaminate(bench, bench, shingle_k=3).collect()
    for r in got:
        assert r["frac"] == 1.0


def test_plan_bench_side_broadcast(spark, sf_dir):
    """The train corpus must never shuffle for the join: bench grams
    broadcast, and the only wide exchange is the final groupBy over
    join survivors."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.limit(5).select("text")
    plan = (
        decontaminate(docs, bench)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
