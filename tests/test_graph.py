"""Graph sink semantics (SURVEY §2.1 S4-S6, §2.4 J2)."""

from __future__ import annotations

import pytest

from ig_etl_sync_spark.operators.graph import EdgeType, GraphStore


from ig_etl_sync_spark.sources.delta_adapter import HAVE_DELTA

_BACKENDS = ["pointer", "txnlog", "manifest"] + (
    # optional fourth leg: real delta-spark behind the same interface
    # (needs the package AND a Delta-extension SparkSession, which the
    # plain test session is not — both must hold to run the leg)
    ["delta"] if HAVE_DELTA else []
)


@pytest.fixture(params=_BACKENDS)
def graph(spark, tmp_path, request):
    if request.param == "delta":
        if "io.delta.sql.DeltaSparkSessionExtension" not in (
            spark.conf.get("spark.sql.extensions", "") or ""
        ):
            pytest.skip("SparkSession lacks the Delta extensions")
    return GraphStore(spark, str(tmp_path / "graph"), backend=request.param)


def test_registry_ignores_torn_marker(spark, tmp_path):
    """A crashed registrant's half-written marker must not poison the
    registry (it reads as 'not registered', never as a crash)."""
    import os

    g = GraphStore(spark, str(tmp_path / "g"))
    g._register_edge(EdgeType("a", "r", "b"))
    os.makedirs(g._registry_dir, exist_ok=True)
    with open(os.path.join(g._registry_dir, "edges_broken_r_c.json"), "w") as f:
        f.write('{"a_label": "bro')  # torn mid-write
    reg = g._load_registry()
    assert reg == [EdgeType("a", "r", "b")]


def test_registry_register_is_idempotent_and_additive(spark, tmp_path):
    import os

    g = GraphStore(spark, str(tmp_path / "g"))
    for _ in range(3):
        g._register_edge(EdgeType("a", "r", "b"))
    g._register_edge(EdgeType("a", "r2", "c"))
    assert sorted(e.rel for e in g._load_registry()) == ["r", "r2"]
    # exactly one marker per type, no leftover tmp files
    files = sorted(os.listdir(g._registry_dir))
    assert files == ["edges_a_r2_c.json", "edges_a_r_b.json"]


def nodes_df(spark, rows):
    return spark.createDataFrame(rows, "external_id string, name string")


def edges_df(spark, rows):
    return spark.createDataFrame(rows, "a_id string, b_id string")


def test_upsert_insert_then_full_replace(spark, graph):
    graph.write_nodes("bucket", to_create=nodes_df(spark, [("a", "old"), ("b", "B")]))
    # S4: MERGE ... SET x = item — full property replacement, not patch.
    graph.write_nodes("bucket", to_create=nodes_df(spark, [("a", "new")]))
    got = {r["external_id"]: r["name"] for r in graph.nodes("bucket").collect()}
    assert got == {"a": "new", "b": "B"}


def test_upsert_idempotent(spark, graph):
    df = nodes_df(spark, [("a", "A")])
    graph.write_nodes("bucket", to_create=df)
    graph.write_nodes("bucket", to_create=df)
    assert graph.nodes("bucket").count() == 1


def test_edge_merge_validates_endpoints(spark, graph):
    """J2: MATCH (a) MATCH (b) drops edges whose endpoints don't exist."""
    graph.write_nodes("org", to_create=nodes_df(spark, [("o1", "O")]))
    graph.write_nodes("project", to_create=nodes_df(spark, [("p1", "P")]))
    edges = edges_df(spark, [("o1", "p1"), ("o1", "p-missing"), ("o-missing", "p1")])
    graph.write_edges("org", "has", "project", edges)
    got = [(r["a_id"], r["b_id"]) for r in graph.edges("org", "has", "project").collect()]
    assert got == [("o1", "p1")]


def test_edge_merge_dedup(spark, graph):
    graph.write_nodes("org", to_create=nodes_df(spark, [("o1", "O")]))
    graph.write_nodes("project", to_create=nodes_df(spark, [("p1", "P")]))
    graph.write_edges("org", "has", "project", edges_df(spark, [("o1", "p1"), ("o1", "p1")]))
    graph.write_edges("org", "has", "project", edges_df(spark, [("o1", "p1")]))
    assert graph.edges("org", "has", "project").count() == 1


def test_detach_delete_cascade(spark, graph):
    """S6: deleting a node removes every edge touching it (DETACH)."""
    graph.write_nodes("org", to_create=nodes_df(spark, [("o1", "O"), ("o2", "O2")]))
    graph.write_nodes("project", to_create=nodes_df(spark, [("p1", "P"), ("p2", "P2")]))
    graph.write_edges(
        "org", "has", "project", edges_df(spark, [("o1", "p1"), ("o2", "p2")])
    )
    graph.write_nodes(
        "org", to_delete=spark.createDataFrame([("o1",)], "external_id string")
    )
    assert [r["external_id"] for r in graph.nodes("org").collect()] == ["o2"]
    got = [(r["a_id"], r["b_id"]) for r in graph.edges("org", "has", "project").collect()]
    assert got == [("o2", "p2")]
    assert graph.orphan_edge_count() == 0


def test_upsert_and_delete_same_write_is_atomic(spark, graph):
    graph.write_nodes("bucket", to_create=nodes_df(spark, [("a", "A"), ("b", "B")]))
    graph.write_nodes(
        "bucket",
        to_create=nodes_df(spark, [("c", "C")]),
        to_delete=spark.createDataFrame([("a",)], "external_id string"),
    )
    got = sorted(r["external_id"] for r in graph.nodes("bucket").collect())
    assert got == ["b", "c"]


def test_duplicate_incoming_keys_last_writer_deterministic(spark, graph):
    dup = nodes_df(spark, [("a", "x"), ("a", "z"), ("a", "y")])
    graph.write_nodes("bucket", to_create=dup)
    got = graph.nodes("bucket").collect()
    assert len(got) == 1
    assert got[0]["name"] == "z"  # max by stable ordering, reproducible
