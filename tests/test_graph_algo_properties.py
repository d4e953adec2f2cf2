"""Property tests: bfs_hops and kcore vs brute-force Python references
on seeded random graphs (the dedup/packing property-test pattern,
applied to the round-3 graph operators)."""

from __future__ import annotations

import random
from collections import deque

import pytest

from ig_etl_sync_spark.operators.graph_algos import bfs_hops, kcore


def _random_graph(seed: int, n: int, m: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    edges = set()
    while len(edges) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((a, b))
    return sorted(edges)


def _py_bfs(edges, seeds, undirected=True, max_hops=50):
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        if undirected:
            adj.setdefault(b, []).append(a)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj.get(u, []):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _py_kcore(edges, k):
    """Iterative peeling; returns {node: degree-in-core} of survivors."""
    es = set()
    for a, b in edges:
        if a != b:
            es.add((a, b))
            es.add((b, a))
    while True:
        deg: dict[int, int] = {}
        for a, _b in es:
            deg[a] = deg.get(a, 0) + 1
        bad = {n for n, d in deg.items() if d < k}
        if not bad:
            return deg
        es = {(a, b) for a, b in es if a not in bad and b not in bad}


@pytest.mark.parametrize("seed,n,m", [(1, 20, 30), (2, 30, 60), (3, 15, 40)])
def test_bfs_matches_python_reference(spark, seed, n, m):
    edges = _random_graph(seed, n, m)
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.hops for r in
           bfs_hops(e, seeds, undirected=True, max_hops=20).collect()}
    want = _py_bfs(edges, [0], undirected=True, max_hops=20)
    assert got == want


@pytest.mark.parametrize("seed,n,m,k", [(4, 20, 40, 2), (5, 25, 70, 3),
                                        (6, 30, 45, 2)])
def test_kcore_matches_python_reference(spark, seed, n, m, k):
    edges = _random_graph(seed, n, m)
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.core_deg for r in kcore(e, k=k, max_rounds=50).collect()}
    want = _py_kcore(edges, k)
    assert got == want


def test_kcore_fixed_rounds_match_unconverged_reference(spark):
    """Both engines pinned to the same round count must agree even if
    the fixpoint needs more rounds — the contract's early-exit trick.
    A long chain peels one link per round, so max_rounds=2 is
    guaranteed unconverged."""
    chain = [(i, i + 1) for i in range(12)]
    e = spark.createDataFrame(chain, "src long, dst long")
    got = {r.node: r.core_deg for r in
           kcore(e, k=2, max_rounds=2).collect()}

    # python reference peeling, exactly 2 rounds
    es = set()
    for a, b in chain:
        es.add((a, b))
        es.add((b, a))
    for _ in range(2):
        deg: dict[int, int] = {}
        for a, _b in es:
            deg[a] = deg.get(a, 0) + 1
        bad = {n for n, d in deg.items() if d < 2}
        es = {(a, b) for a, b in es if a not in bad and b not in bad}
    want: dict[int, int] = {}
    for a, _b in es:
        want[a] = want.get(a, 0) + 1
    assert got == want and got  # non-empty: the chain isn't fully peeled yet
