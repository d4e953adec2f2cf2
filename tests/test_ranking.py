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

# ---------------------------------------------------------------- tfidf

def _ref_tfidf(docs, min_len=3):
    """Plain-Python smoothed TF-IDF (sklearn form) reference."""
    toks = {
        i: [t for t in txt.lower().split() if len(t) >= min_len]
        for i, txt in docs
    }
    n = len(docs)
    df = {}
    for tk in toks.values():
        for term in set(tk):
            df[term] = df.get(term, 0) + 1
    out = {}
    for i, tk in toks.items():
        for term in set(tk):
            tf = tk.count(term) / len(tk)
            out[(i, term)] = tf * (math.log((1.0 + n) / (1.0 + df[term])) + 1.0)
    return out


def test_tfidf_matches_reference(spark, tiny_docs):
    from ig_etl_sync_spark.operators.ranking import tfidf_top_terms

    got = {
        (r["doc_id"], r["term"]): r["tfidf"]
        for r in tfidf_top_terms(tiny_docs, k=100).collect()
    }
    rows = [(r["doc_id"], r["text"]) for r in tiny_docs.collect()]
    want = _ref_tfidf(rows)
    assert set(got) == set(want)
    for key in want:
        assert got[key] == pytest.approx(want[key], abs=1e-6)


def test_tfidf_topk_rank_determinism(spark, tiny_docs):
    from ig_etl_sync_spark.operators.ranking import tfidf_top_terms

    top = tfidf_top_terms(tiny_docs, k=2).collect()
    by_doc = {}
    for r in top:
        by_doc.setdefault(r["doc_id"], []).append((r["tfidf"], r["term"]))
    for doc, pairs in by_doc.items():
        assert len(pairs) <= 2
        # descending rounded score, term asc tiebreak
        assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))


def test_tfidf_empty_and_short_docs(spark, tiny_docs):
    from ig_etl_sync_spark.operators.ranking import tfidf_top_terms

    got = tfidf_top_terms(tiny_docs, k=3).collect()
    ids = {r["doc_id"] for r in got}
    assert 5 not in ids  # empty text -> no terms, no rows, no NaNs
    assert all(r["tfidf"] is not None for r in got)


def test_pmi_collocations_known_corpus(spark):
    """Planted collocation: 'new york' always adjacent; filler words
    random-ish — the planted pair must rank first and its lift must be
    the exact count formula."""
    from ig_etl_sync_spark.operators.ranking import pmi_collocations

    docs = spark.createDataFrame(
        [(i, "new york " + " ".join(f"w{j} common" for j in range(i % 3 + 2)))
         for i in range(30)],
        "doc_id long, text string",
    )
    out = pmi_collocations(docs, min_count=5, k=10).collect()
    assert out[0].w1 == "new" and out[0].w2 == "york"
    # exact replay of the lift formula for the top pair
    toks = [r.text.split() for r in docs.collect()]
    uni = {}
    big = {}
    nu = nb = 0
    for t in toks:
        for w in t:
            uni[w] = uni.get(w, 0) + 1
            nu += 1
        for a, b in zip(t, t[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            nb += 1
    lift = ((big[("new", "york")] * nu) * nu) / (
        (nb * uni["new"]) * uni["york"]
    )
    assert abs(out[0].lift - round(lift, 4)) < 1e-9


def test_pmi_min_count_filters(spark):
    from ig_etl_sync_spark.operators.ranking import pmi_collocations

    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "c d")], "doc_id long, text string"
    )
    out = pmi_collocations(docs, min_count=3, k=10).collect()
    pairs = {(r.w1, r.w2) for r in out}
    assert ("a", "b") in pairs and ("c", "d") not in pairs
