"""Exact substring-span dedup: semantics and plan shape."""

from __future__ import annotations

import re

import pytest

from ig_etl_sync_spark.operators.spans import (
    doc_spans,
    duplicated_spans,
    span_dup_stats,
    span_frequencies,
)

BOILER = "all rights reserved no part may be reproduced"  # 8 words


@pytest.fixture()
def docs(spark):
    rows = [
        # d1/d2 share the 8-word boilerplate span verbatim
        ("d1", f"alpha beta gamma {BOILER} delta"),
        ("d2", f"{BOILER} epsilon zeta eta theta iota"),
        # d3: unique text, no duplicated span
        ("d3", "completely different words with no overlap at all here"),
        # d4: repeats the span twice WITHIN the doc only
        ("d4", f"{BOILER} and again {BOILER}"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_doc_spans_positions(spark):
    df = spark.createDataFrame([("d", "a b c d e")], ["doc_id", "text"])
    got = doc_spans(df, k=3).collect()
    assert [r.pos for r in got] == [0, 1, 2]  # 5 tokens -> 3 spans
    assert len({r.span_md5 for r in got}) == 3


def test_short_doc_single_span(spark):
    df = spark.createDataFrame([("d", "one two")], ["doc_id", "text"])
    got = doc_spans(df, k=8).collect()
    assert len(got) == 1 and got[0].pos == 0


def test_cross_doc_duplicates_found(docs):
    dup = duplicated_spans(docs, k=8, min_docs=2)
    by_doc = {r.doc_id for r in dup.collect()}
    # the boilerplate span appears in d1, d2 and d4 -> all flagged; d3 not
    assert by_doc == {"d1", "d2", "d4"}
    assert all(r.n_docs == 3 for r in dup.collect())


def test_within_doc_repeat_counts_once_for_ndocs(docs):
    spans = doc_spans(docs, k=8)
    freq = {r.span_md5: (r.n_docs, r.n_occ) for r in span_frequencies(spans).collect()}
    boiler_rows = [v for v in freq.values() if v[0] == 3]
    assert boiler_rows == [(3, 4)]  # 3 docs; 4 occurrences (d4 twice)


def test_dup_stats_ratio(docs):
    got = {r.doc_id: r for r in span_dup_stats(docs, k=8, min_docs=2).collect()}
    assert got["d3"].n_dup_spans == 0 and got["d3"].dup_ratio == 0.0
    assert got["d1"].n_dup_spans == 1  # only the exact boilerplate span
    assert got["d2"].n_dup_spans == 1
    assert got["d4"].n_dup_spans == 2  # both occurrences flagged
    # every doc accounted for, ratio in [0, 1]
    assert all(0.0 <= r.dup_ratio <= 1.0 for r in got.values())


def test_min_docs_threshold(docs):
    dup3 = duplicated_spans(docs, k=8, min_docs=4)
    assert dup3.count() == 0  # span is only in 3 docs


def test_single_data_shuffle(docs):
    """ONE physical data-wide shuffle (the explicit span_md5
    repartition, branch copies deduped by ReusedExchange); the
    (span,doc) distinct, freq agg, and dup-join all ride it. The only
    other Exchange moves per-doc partial counts."""
    out = span_dup_stats(docs, k=8, min_docs=2)
    out.collect()  # finalize the adaptive plan so reuse is visible
    plan = out._jdf.queryExecution().executedPlan().toString()
    keys = re.findall(r"Exchange hashpartitioning\(([^),]*)[^)]*\)", plan)
    # never a (span_md5, doc_id) data-wide or probe-side re-shuffle
    assert all("doc_id" not in k for k in keys if "span_md5" in k)
    assert len({k for k in keys if "doc_id" in k}) == 1  # one doc agg
    assert "ReusedExchange" in plan  # branch repartitions deduped
