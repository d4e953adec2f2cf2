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
