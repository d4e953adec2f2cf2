"""BM25 ranking operator: scoring semantics + plan-shape invariants."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ig_etl_sync_spark.operators.ranking import bm25_scores, bm25_topk


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (1, "spark join join filter"),
        (2, "window stream window"),
        (3, "the quick brown fox"),
        (4, "join"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _ref_bm25(docs, terms, k1=1.2, b=0.75):
    """Plain-Python reference implementation (Lucene idf form)."""
    toks = {i: t.lower().split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, tk in toks.items():
        s = 0.0
        for term in terms:
            tf = tk.count(term)
            df = sum(1 for v in toks.values() if term in v)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * (tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(tk) / avgdl)))
        if s > 0:
            out[i] = s
    return out


def test_bm25_matches_reference(spark, tiny_docs):
    terms = ["join", "window"]
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(tiny_docs, terms).collect()
    }
    rows = [(r["doc_id"], r["text"]) for r in tiny_docs.collect()]
    want = _ref_bm25(rows, terms)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_bm25_zero_score_docs_dropped(spark, tiny_docs):
    got = bm25_scores(tiny_docs, ["zebra"]).collect()
    assert got == []


def test_bm25_topk_order_and_ties(spark, tiny_docs):
    top = bm25_topk(tiny_docs, ["join", "window"], k=10).collect()
    scores = [(r["score"], r["doc_id"]) for r in top]
    # descending by rounded score, ascending id tiebreak
    assert scores == sorted(scores, key=lambda p: (-p[0], p[1]))


def test_bm25_rejects_bad_terms(spark, tiny_docs):
    with pytest.raises(ValueError):
        bm25_scores(tiny_docs, [])
    with pytest.raises(ValueError):
        bm25_scores(tiny_docs, ["a", "a"])


def test_bm25_plan_no_corpus_shuffle(spark, sf_dir):
    """Physical-plan invariant: the only Exchange is the single-row
    stats aggregation (SinglePartition); the corpus itself is never
    re-keyed, and top-k compiles to TakeOrderedAndProject."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = bm25_topk(docs, ["join", "filter"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange" in ln and "Broadcast" not in ln
    ]
    assert all("SinglePartition" in ln for ln in exchanges), exchanges
