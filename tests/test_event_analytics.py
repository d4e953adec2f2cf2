"""Round-3 operators: cohort retention, Markov transitions, time-series
resample+ffill, BFS hops, vocabulary coverage, inverted index."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ig_etl_sync_spark.operators.graph_algos import bfs_hops
from ig_etl_sync_spark.operators.ranking import inverted_index, vocab_coverage
from ig_etl_sync_spark.operators.sessions import cohort_retention, transition_matrix
from ig_etl_sync_spark.operators.temporal import resample_ffill


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------------------- cohort

def test_cohort_retention_matrix(spark):
    # u1, u2 join week of 2024-01-01 (Mon); u1 returns week+1; u3 joins
    # week of 2024-01-08 and never returns.
    rows = [
        (1, _ts("2024-01-02 10:00:00")),
        (2, _ts("2024-01-03 11:00:00")),
        (1, _ts("2024-01-09 09:00:00")),
        (3, _ts("2024-01-10 08:00:00")),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r.cohort, r.period_offset): (r.n_active, r.retention_bp)
        for r in cohort_retention(ev).collect()
    }
    assert out[("2024-01-01", 0)] == (2, 10000)
    assert out[("2024-01-01", 1)] == (1, 5000)
    assert out[("2024-01-08", 0)] == (1, 10000)
    assert len(out) == 3


def test_cohort_retention_offset0_always_full(spark):
    rows = [
        (u, _ts("2024-01-01 00:00:00") + dt.timedelta(days=7 * w))
        for u in range(10)
        for w in range(u % 4)
    ]
    ev = spark.createDataFrame(
        [r for r in rows], "user_id long, ts timestamp"
    )
    for r in cohort_retention(ev).where(F.col("period_offset") == 0).collect():
        assert r.retention_bp == 10000


# ----------------------------------------------------------- transitions

def test_transition_matrix_counts_and_ppm(spark):
    rows = [
        (1, _ts("2024-01-01 00:00:00"), 1, "a"),
        (2, _ts("2024-01-01 00:01:00"), 1, "b"),
        (3, _ts("2024-01-01 00:02:00"), 1, "a"),
        (4, _ts("2024-01-01 00:03:00"), 1, "c"),
        (5, _ts("2024-01-01 00:00:30"), 2, "a"),
        (6, _ts("2024-01-01 00:01:30"), 2, "b"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        (r.src_type, r.dst_type): (r.n_transitions, r.prob_ppm)
        for r in transition_matrix(ev).collect()
    }
    # src 'a' has 3 outgoing: a->b twice, a->c once
    assert out[("a", "b")] == (2, 666666)
    assert out[("a", "c")] == (1, 333333)
    assert out[("b", "a")] == (1, 1000000)
    assert ("c", None) not in out  # terminal events emit no transition


def test_transition_matrix_ppm_sums_near_million(spark):
    rows = [
        (i, _ts("2024-01-01 00:00:00") + dt.timedelta(minutes=i), i % 3,
         "t" + str(i % 5))
        for i in range(60)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    per_src = (
        transition_matrix(ev)
        .groupBy("src_type")
        .agg(F.sum("prob_ppm").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    for r in per_src:
        # floor-division ppm: total in (1e6 - n_rows, 1e6]
        assert 1_000_000 - r.n < r.s <= 1_000_000


# ------------------------------------------------------------- resample

def test_resample_ffill_fills_gaps(spark):
    rows = [
        (1, _ts("2024-01-01 00:10:00"), 7, 1.5),
        (1, _ts("2024-01-01 03:20:00"), 8, 2.5),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    out = sorted(
        (r.grid_ts, r.value_ffill) for r in resample_ffill(ev).collect()
    )
    assert out == [
        ("2024-01-01 00:00:00", 1.5),
        ("2024-01-01 01:00:00", 1.5),
        ("2024-01-01 02:00:00", 1.5),
        ("2024-01-01 03:00:00", 2.5),
    ]


def test_resample_ffill_cell_pick_is_latest_by_ts_then_id(spark):
    same_us = _ts("2024-01-01 05:30:00")
    rows = [
        (2, same_us, 1, 10.0),
        (2, same_us, 3, 30.0),  # same µs: event_id breaks the tie
        (2, _ts("2024-01-01 05:10:00"), 2, 20.0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    out = resample_ffill(ev).collect()
    assert len(out) == 1
    assert out[0].value_ffill == 30.0


def test_resample_ffill_never_null(spark, sf_dir):
    from ig_etl_sync_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") % 50 == 0)
    out = resample_ffill(ev)
    assert out.where(F.col("value_ffill").isNull()).count() == 0


# ------------------------------------------------------------------ bfs

def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _seeds(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node long")


def test_bfs_path_graph_distances(spark):
    e = _edges(spark, [(i, i + 1) for i in range(5)])  # 0-1-2-3-4-5
    out = {r.node: r.hops for r in
           bfs_hops(e, _seeds(spark, [0]), undirected=True).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 5}


def test_bfs_respects_direction_and_max_hops(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    out = {r.node: r.hops for r in
           bfs_hops(e, _seeds(spark, [0]), max_hops=2).collect()}
    assert out == {0: 0, 1: 1, 2: 2}  # 3 is 3 hops away (directed)


def test_bfs_multi_seed_takes_min(spark):
    e = _edges(spark, [(i, i + 1) for i in range(6)])
    out = {r.node: r.hops for r in
           bfs_hops(e, _seeds(spark, [0, 6]), undirected=True).collect()}
    assert out[3] == 3
    assert out[5] == 1
    assert out[6] == 0


def test_bfs_unreachable_absent(spark):
    e = _edges(spark, [(0, 1), (10, 11)])
    out = {r.node for r in
           bfs_hops(e, _seeds(spark, [0]), undirected=True).collect()}
    assert out == {0, 1}


# ------------------------------------------------------------ vocabulary

@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "a cat and a dog"),
        (4, "the end"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_vocab_coverage_monotone_and_bounded(docs):
    out = vocab_coverage(docs, top_n=5).orderBy("rank").collect()
    assert [r.rank for r in out] == list(range(1, len(out) + 1))
    # 'the' (5 occurrences) must rank first
    assert out[0].token == "the"
    cov = [r.coverage_ppm for r in out]
    assert cov == sorted(cov)
    assert all(0 < c <= 1_000_000 for c in cov)


def test_vocab_coverage_full_head_covers_everything(docs):
    out = vocab_coverage(docs, top_n=1000).orderBy(F.col("rank").desc()).first()
    # floor division: total coverage in (1e6 - n_terms, 1e6]
    assert out.coverage_ppm >= 1_000_000 - out.rank
    assert out.coverage_ppm <= 1_000_000


def test_inverted_index_postings_sorted_and_min_df(docs):
    out = {r.term: (r.df, r.postings) for r in
           inverted_index(docs, min_df=2).collect()}
    assert out["cat"] == (2, "1,3")
    assert out["the"] == (3, "1,2,4")
    assert "end" not in out  # df=1 < min_df
    for _df, postings in out.values():
        ids = postings.split(",")
        assert ids == sorted(ids, key=int)


def test_inverted_index_max_df_absolute(docs):
    out = {r.term: (r.df, r.postings) for r in
           inverted_index(docs, min_df=2, max_df=2).collect()}
    assert "the" not in out          # df=3 exceeds the cap
    assert out["cat"] == (2, "1,3")  # df=2 survives both bounds


def test_inverted_index_max_df_fraction_blocks_hot_term(spark):
    # One 50%-df stop-word-like term over 40 docs; a 0.4 fractional cap
    # must drop it (the df pre-pass bounds it BEFORE any collect_list).
    rows = [(i, ("hot common " if i % 2 == 0 else "") + f"rare{i} tail{i % 4}")
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = inverted_index(docs, min_df=2, max_df=0.4)
    terms = {r.term: r.df for r in out.collect()}
    assert "hot" not in terms and "common" not in terms  # df=20 > 0.4*40
    assert terms == {f"tail{i}": 10 for i in range(4)}   # df=10 <= 16
    # boundary exactness: cap exactly at the hot term's fraction keeps it
    kept = {r.term for r in inverted_index(docs, min_df=2, max_df=0.5).collect()}
    assert "hot" in kept


def test_inverted_index_max_df_fraction_validation(docs):
    with pytest.raises(ValueError):
        inverted_index(docs, max_df=1.5)


# ------------------------------------------------------- two-phase NDV

def test_two_phase_count_distinct_matches_count_distinct(spark):
    from ig_etl_sync_spark.operators.aggs import two_phase_count_distinct

    rows = [("a", 1), ("a", 1), ("a", 2), ("b", 3), ("b", None), ("c", None)]
    df = spark.createDataFrame(rows, "k string, v int")
    got = {r.k: r.ndv for r in
           two_phase_count_distinct(df, ["k"], "v").collect()}
    want = {r.k: r.ndv for r in
            df.groupBy("k").agg(F.count_distinct("v").alias("ndv")).collect()}
    # full COUNT(DISTINCT) semantics incl. the all-NULL group at 0
    assert got == want == {"a": 2, "b": 1, "c": 0}


def test_two_phase_count_distinct_null_key_and_single_scan(spark):
    from ig_etl_sync_spark.operators.aggs import two_phase_count_distinct

    rows = [(None, 1), (None, 2), (None, None), ("a", 5), ("a", None)]
    df = spark.createDataFrame(rows, "k string, v int")
    out = two_phase_count_distinct(df, ["k"], "v")
    got = {r.k: r.ndv for r in out.collect()}
    # NULL group key is a real group (SQL GROUP BY semantics)
    assert got == {None: 2, "a": 1}
    # single-pass: exactly one scan of the input in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE echoes both
    n_scans = final.count("LocalTableScan") + final.count("Scan ExistingRDD")
    assert n_scans == 1, plan


# ------------------------------------------------------------ empty input

def test_round3_operators_tolerate_empty_input(spark):
    """Driver-edge-case insurance: every round-3 operator returns an
    empty (or sensible) result on an empty frame instead of crashing."""
    from ig_etl_sync_spark.operators.aggs import two_phase_count_distinct
    from ig_etl_sync_spark.operators.dataprep import (
        chunk_documents,
        class_balanced_sample,
        winsorize,
    )
    from ig_etl_sync_spark.operators.kmeans import kmeans_assign
    from ig_etl_sync_spark.operators.profiling import rolling_zscore
    from ig_etl_sync_spark.operators.temporal import (
        decay_weighted_avg,
        resample_ffill,
    )

    ev = spark.createDataFrame(
        [], "user_id long, ts timestamp, event_id long, value double,"
            " event_type string"
    )
    docs = spark.createDataFrame([], "doc_id long, text string, label int")
    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )

    assert cohort_retention(ev).count() == 0
    assert transition_matrix(ev).count() == 0
    assert resample_ffill(ev).count() == 0
    assert rolling_zscore(ev, "user_id", "ts", "value", "event_id").count() == 0
    assert decay_weighted_avg(ev, "user_id", "ts", "value", "event_id").count() == 0
    assert two_phase_count_distinct(ev, ["event_type"], "user_id").count() == 0
    assert winsorize(ev, "value", ["event_type"]).count() == 0
    assert chunk_documents(docs).count() == 0
    assert class_balanced_sample(docs, "label", "doc_id").count() == 0
    assert kmeans_assign(emb, k=4, iters=1).count() == 0
    e = spark.createDataFrame([], "src long, dst long")
    assert bfs_hops(e, spark.createDataFrame([], "node long")).count() == 0
    from ig_etl_sync_spark.operators.graph_algos import kcore

    assert kcore(e, k=2).count() == 0
