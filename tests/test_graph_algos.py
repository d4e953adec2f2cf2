"""PageRank: conservation, reference parity, structure sanity."""

from __future__ import annotations

import pytest

from ig_etl_sync_spark.operators.graph_algos import pagerank


def _ref_pagerank(edges, damping=0.85, iters=3, undirected=False):
    """Plain-Python replay of the operator's exact update rule: the
    fixed-point integer scheme (scale 10^12, floor division)."""
    scale = 10**12
    d_num = round(damping * 100)
    es = set(edges)
    if undirected:
        es |= {(b, a) for a, b in es}
    nodes = sorted({x for e in es for x in e})
    out = {v: [d for s, d in es if s == v] for v in nodes}
    n = len(nodes)
    r = {v: scale // n for v in nodes}
    base = ((100 - d_num) * scale) // (100 * n)
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for u in nodes:
            if out[u]:
                c = r[u] // len(out[u])
                for v in out[u]:
                    s[v] += c
        r = {v: base + (s[v] * d_num) // 100 for v in nodes}
    return {v: (r[v] // 10**6) / 1e6 for v in nodes}


def test_pagerank_matches_reference(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=3).collect()}
    want = _ref_pagerank(edges, iters=3)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=2e-6), k


def test_pagerank_ring_is_uniform(spark):
    ring = [(str(i), str((i + 1) % 6)) for i in range(6)]
    df = spark.createDataFrame(ring, ["src", "dst"])
    ranks = [r["rank"] for r in pagerank(df, iters=5).collect()]
    assert all(r == pytest.approx(1 / 6, abs=1e-6) for r in ranks)


def test_pagerank_undirected_conserves_mass(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"), ("a", "c")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = pagerank(df, undirected=True, iters=4).collect()
    total = sum(r["rank"] for r in out)
    assert total == pytest.approx(1.0, abs=1e-5)


def test_pagerank_hub_outranks_leaves(spark):
    star = [(f"leaf{i}", "hub") for i in range(8)]
    df = spark.createDataFrame(star, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(df, undirected=True).collect()}
    assert got["hub"] > max(v for k, v in got.items() if k != "hub") * 3


def test_pagerank_validates_iters(spark):
    df = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError):
        pagerank(df, iters=0)


# ---------------------------------------------------------- triangles

def test_triangle_count_k4(spark):
    """K4 has 4 triangles; every node sits in exactly 3. Reversed and
    duplicate edges must not change the count."""
    from ig_etl_sync_spark.operators.graph_algos import triangle_count

    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges += [(b, a) for a, b in edges] + edges[:3] + [(2, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_count_triangle_free(spark):
    from ig_etl_sync_spark.operators.graph_algos import triangle_count

    # a 4-cycle: no triangles
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )
    assert triangle_count(df).count() == 0


def test_triangle_degree_oriented_equals_id_oriented(spark):
    """Degree orientation is an enumeration strategy, not a semantic —
    counts must be identical on K4, a hub-skewed graph, and a seeded
    random graph (incl. reversed/duplicate/self edges)."""
    import random

    from ig_etl_sync_spark.operators.graph_algos import (
        triangle_count,
        triangle_count_degree_oriented,
    )

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    # hub graph: hub 0 joined to every rim node, rim is a cycle — every
    # rim edge closes a triangle through the hub (the skew case where
    # id-orientation roots all wedges on one node).
    rim = 40
    hub = [(0, i) for i in range(1, rim + 1)] + [
        (i, i % rim + 1) for i in range(1, rim + 1)
    ]
    rng = random.Random(7)
    rand = [(rng.randrange(30), rng.randrange(30)) for _ in range(200)]
    for edges in (k4, hub, rand):
        noisy = edges + [(b, a) for a, b in edges[::2]] + edges[:5]
        df = spark.createDataFrame(noisy, "src long, dst long")
        base = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
        dego = {
            r["node"]: r["n_triangles"]
            for r in triangle_count_degree_oriented(df).collect()
        }
        assert dego == base and (edges is not hub or base[0] == rim)


def test_triangle_enumeration_branches_reuse_checkpointed_backbone(spark):
    """Diamond rule: the oriented-distinct edge frame fans into three
    enumeration branches; without a checkpoint Catalyst re-plans the
    distinct per branch. The lazy localCheckpoint surfaces as an
    ExistingRDD scan in every branch, and the upstream exchange/distinct
    must appear at most once (not once per branch)."""
    from ig_etl_sync_spark.operators.graph_algos import (
        triangle_count,
        triangle_count_degree_oriented,
    )

    df = spark.createDataFrame(
        [(a, b) for a in range(6) for b in range(6) if a < b],
        "src long, dst long",
    )
    for op, min_scans in ((triangle_count, 3), (triangle_count_degree_oriented, 3)):
        out = op(df)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("ExistingRDD") >= min_scans, plan
        # the input's distinct must not be replanned per branch: at most
        # one aggregate over the raw lo/hi projection survives (zero
        # once the checkpoint hides it entirely)
        assert plan.count("least(src") <= 1, plan


def test_mutual_topk_graph_degree_bound(spark):
    from ig_etl_sync_spark.operators.graph_algos import mutual_topk_graph
    from pyspark.sql import functions as F

    # complete weighted graph on 6 nodes
    pairs = [
        (a, b, float((a * 7 + b * 3) % 11))
        for a in range(6)
        for b in range(6)
        if a < b
    ]
    df = spark.createDataFrame(pairs, "a long, b long, w double")
    edges = mutual_topk_graph(df, k=2)
    rows = edges.collect()
    assert all(r["src"] < r["dst"] for r in rows)
    deg = {}
    for r in rows:
        deg[r["src"]] = deg.get(r["src"], 0) + 1
        deg[r["dst"]] = deg.get(r["dst"], 0) + 1
    assert max(deg.values()) <= 4  # union of two directions: <= 2k
    # deterministic
    again = {(r["src"], r["dst"]) for r in mutual_topk_graph(df, k=2).collect()}
    assert {(r["src"], r["dst"]) for r in rows} == again


# ------------------------------------------------------------------ kcore

def _e(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_kcore_cycle_survives_path_dies(spark):
    from ig_etl_sync_spark.operators.graph_algos import kcore

    # 4-cycle: every node has degree 2 → entire graph is the 2-core
    cyc = _e(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    out = {r.node: r.core_deg for r in kcore(cyc, k=2).collect()}
    assert out == {0: 2, 1: 2, 2: 2, 3: 2}

    # path: endpoints peel, then everything unravels → empty 2-core
    path = _e(spark, [(0, 1), (1, 2), (2, 3)])
    assert kcore(path, k=2).count() == 0


def test_kcore_clique_with_pendant(spark):
    from ig_etl_sync_spark.operators.graph_algos import kcore

    # K4 plus a pendant node hanging off node 0
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = _e(spark, k4 + [(0, 99)])
    out = {r.node: r.core_deg for r in kcore(edges, k=3).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}  # pendant peeled, K4 intact


def test_kcore_cascading_peel_needs_multiple_rounds(spark):
    from ig_etl_sync_spark.operators.graph_algos import kcore

    # chain hanging off a triangle: peeling cascades inward one round
    # per chain link, exercising the multi-round path
    tri = [(0, 1), (1, 2), (2, 0)]
    chain = [(2, 10), (10, 11), (11, 12)]
    out = {r.node for r in kcore(_e(spark, tri + chain), k=2).collect()}
    assert out == {0, 1, 2}


def test_clustering_coefficients_known_graph(spark):
    """Triangle + pendant: exact cc values. Graph: 1-2, 2-3, 1-3
    (triangle) plus 3-4 (pendant)."""
    from ig_etl_sync_spark.operators.graph_algos import clustering_coefficients

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    out = {r.node: r for r in clustering_coefficients(edges).collect()}
    assert out[1].degree == 2 and out[1].n_triangles == 1
    assert out[1].cc_ppm == 1_000_000  # 2*1/(2*1)
    assert out[3].degree == 3 and out[3].n_triangles == 1
    assert out[3].cc_ppm == 333_333    # 2*1*1e6 div (3*2)
    assert out[4].degree == 1 and out[4].cc_ppm == 0 and out[4].n_triangles == 0


def test_clustering_coefficients_duplicate_and_reversed_edges(spark):
    from ig_etl_sync_spark.operators.graph_algos import clustering_coefficients

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (1, 1)], "src long, dst long"
    )
    out = {r.node: r for r in clustering_coefficients(edges).collect()}
    assert all(r.cc_ppm == 1_000_000 for r in out.values())
    assert set(out) == {1, 2, 3}
