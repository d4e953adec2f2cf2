"""IVF approximate nearest neighbors."""

from __future__ import annotations

import pytest

from ig_etl_sync_spark.operators.similarity import brute_force_topk, ivf_topk


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_ivf_scores_exact_and_contract(spark, embeddings):
    """IVF results: approximate RECALL, but every returned score must be
    the exact cosine, ranks contiguous from 1, no self-matches."""
    q = embeddings.where("vec_id < 4")
    bf = {(r["query_id"], r["neighbor_id"]): r["score"]
          for r in brute_force_topk(embeddings, q, k=300).collect()}
    rows = ivf_topk(embeddings, q, k=5, n_centroids=8, n_probe=3).collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2, 3}
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
        assert bf[(r["query_id"], r["neighbor_id"])] == r["score"]
    for qid in (0, 1, 2, 3):
        ranks = sorted(r["rank"] for r in rows if r["query_id"] == qid)
        assert ranks == list(range(1, len(ranks) + 1))


def test_ivf_full_probe_equals_brute_force(spark, embeddings):
    """Probing ALL centroid lists = exhaustive search = brute force."""
    q = embeddings.where("vec_id < 3")
    bf = {(r["query_id"], r["neighbor_id"], r["rank"])
          for r in brute_force_topk(embeddings, q, k=5).collect()}
    ivf = {(r["query_id"], r["neighbor_id"], r["rank"])
           for r in ivf_topk(embeddings, q, k=5, n_centroids=4, n_probe=4).collect()}
    assert ivf == bf


def test_ivf_deterministic(spark, embeddings):
    q = embeddings.where("vec_id < 2")
    a = sorted(map(tuple, ivf_topk(embeddings, q, k=3).collect()))
    b = sorted(map(tuple, ivf_topk(embeddings, q, k=3).collect()))
    assert a == b


def test_ivf_refined_full_probe_equals_brute_force(spark, embeddings):
    """Lloyd sweeps move centroids but with ALL lists probed the search
    is still exhaustive — refined IVF must equal brute force."""
    q = embeddings.where("vec_id < 3")
    bf = {(r["query_id"], r["neighbor_id"], r["rank"])
          for r in brute_force_topk(embeddings, q, k=5).collect()}
    ivf = {(r["query_id"], r["neighbor_id"], r["rank"])
           for r in ivf_topk(embeddings, q, k=5, n_centroids=4, n_probe=4,
                             refine_iters=2).collect()}
    assert ivf == bf


def test_ivf_refined_deterministic_and_scores_exact(spark, embeddings):
    q = embeddings.where("vec_id < 2")
    a = sorted(map(tuple, ivf_topk(embeddings, q, k=3, refine_iters=1).collect()))
    b = sorted(map(tuple, ivf_topk(embeddings, q, k=3, refine_iters=1).collect()))
    assert a == b and len(a) > 0
    bf = {(r["query_id"], r["neighbor_id"]): r["score"]
          for r in brute_force_topk(embeddings, q, k=300).collect()}
    for row in a:
        qid, nid, score, rank = row
        assert bf[(qid, nid)] == score  # re-rank scores stay exact cosines


# -- product quantization --------------------------------------------

def test_pq_codes_shape_and_range(spark, sf_dir):
    from pyspark.sql import functions as F

    from ig_etl_sync_spark.operators.similarity import pq_codebooks, pq_encode

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = pq_codebooks(emb, m=8, ks=16)
    [row] = cb.collect()
    assert len(row._cb) == 8 and all(len(s) == 16 for s in row._cb)
    assert all(len(c) == 8 for s in row._cb for c in s)  # 64/8 dims
    codes = pq_encode(emb, cb, m=8, ks=16)
    bad = codes.where(
        (F.size("codes") != 8)
        | F.exists("codes", lambda c: (c < 0) | (c >= 16))
    ).count()
    assert bad == 0


def test_pq_recall_vs_brute_force(spark, sf_dir):
    from pyspark.sql import functions as F

    from ig_etl_sync_spark.operators.similarity import brute_force_topk, pq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 8)
    exact = brute_force_topk(emb, queries, k=10)
    approx = pq_topk(emb, queries, k=10, m=8, ks=16)
    reranked = pq_topk(emb, queries, k=10, m=8, ks=16, rerank=5)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    rr = {(r.query_id, r.neighbor_id) for r in reranked.collect()}
    # ADC-only on uniform-random 64-d data (hardest case) still beats
    # chance (k/n = 2%) by a wide margin...
    assert len(e & a) / len(e) >= 0.08, len(e & a) / len(e)
    # ...and the production shape (shortlist + exact re-rank) recovers
    # most of the exact top-k
    assert len(e & rr) / len(e) >= 0.35, len(e & rr) / len(e)


def test_embedding_isolation_flags_planted_outlier(spark):
    """A cluster of near-identical vectors + one orthogonal outlier:
    cluster members count each other, the outlier counts nobody."""
    import random
    from ig_etl_sync_spark.operators.similarity import embedding_isolation

    rng = random.Random(3)
    rows = []
    for i in range(30):  # tight cluster along dim 0
        v = [0.0] * 64
        v[0] = 0.5 + rng.uniform(-0.005, 0.005)
        rows.append((i, v))
    out_v = [0.0] * 64
    out_v[1] = -0.5  # orthogonal to the cluster
    rows.append((99, out_v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in embedding_isolation(df, threshold=0.9).collect()}
    assert out[99].isolated and out[99].n_neighbors == 0
    assert not out[0].isolated and out[0].n_neighbors >= 1
    assert len(out) == 31  # every input vector present


def test_embedding_isolation_counts_are_symmetric_pairs(spark):
    """Total neighbor count = 2x the verified pair count."""
    from ig_etl_sync_spark.operators.similarity import (
        embedding_isolation,
        lsh_bucketed_pairs,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n_pairs = lsh_bucketed_pairs(df, threshold=0.3, planes=4, tables=2).count()
    total = (
        embedding_isolation(df, threshold=0.3, planes=4, tables=2)
        .groupBy()
        .sum("n_neighbors")
        .collect()[0][0]
    )
    assert total == 2 * n_pairs


def test_embedding_isolation_runs_verify_in_one_plan_branch(spark):
    """Diamond rule: a two-branch id_a/id_b union would re-run the
    bucket joins + cosine verify per branch. The explode(array(id_a,
    id_b)) form keeps ONE branch: exactly one Generate (the explode)
    and each table's bucket self-join appears once — with 2 tables
    that is at most 2 in-bucket joins plus the final left_outer against
    the id spine, never the 2x of a replanned union."""
    from ig_etl_sync_spark.operators.similarity import embedding_isolation

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = embedding_isolation(df, threshold=0.3, planes=4, tables=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate") == 1, plan
    n_joins = sum(plan.count(j) for j in
                  ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))
    assert n_joins <= 3, plan  # 2 bucket joins + 1 spine join, not 2x
