"""Iterative graph algorithms over edge DataFrames: PageRank.

Complements operators/clustering.py (connected components). The
reference has no graph *analytics* (it only loads a property graph);
this is a §2.9 extension for ranking entities in the synced graph
(e.g. influence-weighting nodes before sampling a training corpus).

Scale design (100 TB):

- Pure DataFrame loop — one hash join (ranks ⋈ edges on src) and one
  aggregation per iteration, the textbook distributed PR shape. Edges
  and degrees are pre-partitioned on the join key and CACHED once;
  every iteration then shuffles only the rank table (|V| rows, two
  narrow columns), never the edge list.
- Lineage is truncated with ``localCheckpoint`` every
  ``checkpoint_every`` iterations — without it the plan doubles per
  iteration and Catalyst analysis time dominates beyond ~10 rounds.
- Dangling nodes contribute nothing (their mass leaks, as in the
  original formulation); symmetrize the edge set (``undirected=True``)
  when the input is bipartite and leakage is unwanted.

Cross-engine determinism: the loop is FIXED-POINT INTEGER arithmetic.
Ranks are BIGINTs scaled by 10^12; contributions are integer floor
divisions (rank div deg), neighbor sums are exact integer sums
(order-free), and the damping update is ``base + (s * d) div 100``
with a 2-dp-quantized damping factor — no floating-point operation
exists anywhere in the loop, so the result is bit-identical in any
engine by construction. (Round 2 learned the hard way that even
"round then decimal-sum" leaves ONE fragile op per iteration:
engines disagree on round(double, n) at half boundaries — Spark
rounds the exact binary value via BigDecimal, DuckDB multiplies by
10^n in floating point — and at sf0.1 a boundary case finally
appeared.) The single float op is the output division of identical
integers, identical in IEEE on any engine. The DuckDB oracle unrolls
the fixed iteration count as CTEs (contract._pagerank_sql) and
replays every digit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "pagerank",
    "triangle_count",
    "triangle_count_degree_oriented",
    "mutual_topk_graph",
    "bfs_hops",
    "kcore",
]

#: fixed-point rank scale: ranks are BIGINTs counting 10^-12 units.
_PR_SCALE_DP = 12
_PR_SCALE = 10**_PR_SCALE_DP


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iters: int = 3,
    undirected: bool = False,
    checkpoint_every: int = 8,
    round_dp: int = 6,
    disjoint_symmetry: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank → ``(node, rank DOUBLE)`` for every
    node appearing as src or dst. ``rank`` is truncated to
    ``round_dp`` decimals; the loop runs in FIXED-POINT INTEGERS (see
    module docstring: ranks are BIGINTs scaled by 10^12, every step is
    integer floor division) so the result is bit-identical in any
    engine. ``damping`` is quantized to 2 decimals (its exact value
    is part of the cross-engine contract)."""
    if iters < 1:
        raise ValueError(f"iters={iters} must be >= 1")
    d_num = round(damping * 100)
    if not 0 < d_num < 100:
        raise ValueError(f"damping={damping} outside (0.01, 0.99)")

    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    if undirected and disjoint_symmetry:
        # Caller asserts src and dst draw from DISJOINT namespaces (a
        # bipartite graph with typed ids): (a,b) and (b,a) can never
        # both appear in the input, so distinct-THEN-symmetrize yields
        # the same edge set as symmetrize-then-distinct while the
        # distinct shuffles |E| rows instead of 2|E|. Symmetrization is
        # the repo's explode(array(...)) idiom — ONE branch over the
        # distinct output, so the dedup subtree is never evaluated
        # twice (the 2-way-union diamond rule).
        e = (
            e.distinct()
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("src"), F.col("dst")),
                        F.struct(
                            F.col("dst").alias("src"),
                            F.col("src").alias("dst"),
                        ),
                    )
                ).alias("_e")
            )
            .select("_e.src", "_e.dst")
        )
    else:
        if undirected:
            e = e.union(
                e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
        e = e.distinct()

    n_parts = e.sparkSession.sparkContext.defaultParallelism
    # cache(), deliberately, for the loop-invariant frames: a lazy
    # localCheckpoint here measures 2-3x slower end-to-end (the
    # checkpointed LogicalRDD drops the repartition's partitioning
    # from the plan, so every iteration's join re-shuffles the edges),
    # and these frames are small — cache entries are LRU-evictable, so
    # repeated invocations degrade gracefully rather than leak.
    e = e.repartition(n_parts, F.col("src")).cache()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    # e ⋈ deg is LOOP-INVARIANT: join it once (both sides partitioned
    # on src — no shuffle) and cache the joined frame; the old form
    # re-ran the deg join inside every iteration.
    ed = e.join(deg, "src").cache()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.count()  # one scalar driver action, like any stats pass

    # fixed-point: all ranks are BIGINTs scaled by _PR_SCALE; floor
    # division only — no float op until the single output division.
    r0 = _PR_SCALE // n
    base = ((100 - d_num) * _PR_SCALE) // (100 * n)
    r = nodes.withColumn("rank", F.lit(r0).cast("long"))
    for i in range(iters):
        contrib = (
            ed.join(r.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div _deg").alias("_c"),
            )
        )
        s = contrib.groupBy("node").agg(F.sum("_c").alias("_s"))
        r = nodes.join(s, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"(coalesce(_s, 0L) * {d_num}) div 100")
            ).cast("long").alias("rank"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            r = r.localCheckpoint()

    out_div = 10 ** (_PR_SCALE_DP - round_dp)
    return r.select(
        "node",
        (
            F.expr(f"rank div {out_div}").cast("double")
            / F.lit(float(10**round_dp))
        ).alias("rank"),
    )


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle participation counts over an undirected edge
    list (duplicate and reversed edges tolerated).

    Classic two-join enumeration over ORIENTED edges: each undirected
    edge is stored once as (lo, hi); a triangle {a<b<c} is found
    exactly once as (a,b)⋈(b,c) closed by (a,c) — no double counting,
    no self-pairs. Returns ``(node, n_triangles)``.

    Scale design (100 TB): the joins shuffle on single node keys, and
    the (a,b)⋈(b,c) intermediate is Σ C(deg(b), 2) — bounded for the
    degree-bounded graphs this engine builds (mutual top-k partner
    graphs, near-dup pair graphs). For power-law graphs, first rename
    ids by ascending degree so the orientation points hub-ward and the
    quadratic term lands on low-degree nodes (the standard
    degree-orientation trick; id-orientation keeps this construction
    expression-only and oracle-replayable).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .where(F.col("lo") != F.col("hi"))
        .distinct()
        # Self-join diamond: e fans into the ab/bc/ac branches and
        # Catalyst re-plans the upstream distinct per branch; one lazy
        # checkpoint materializes it once for arbitrary callers.
        .localCheckpoint(eager=False)
    )
    ab = e.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    bc = e.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    ac = e.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    tris = ab.join(bc, "b").join(ac, ["a", "c"], "left_semi")
    nodes = tris.select(
        F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias("node")
    )
    return nodes.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def triangle_count_degree_oriented(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """``triangle_count`` with DEGREE orientation — identical output
    (exact per-node triangle counts), different enumeration cost model.

    Edges are oriented low→high by ``(degree, id)`` instead of raw id,
    so every node's out-degree is bounded by its position in the degree
    order and the wedge blow-up Σ C(out-deg, 2) is O(m^1.5) on ANY
    graph (arboricity bound) — including power-law graphs where raw-id
    orientation can put Σ C(deg_hub, 2) on a single hub. Each triangle
    is still found exactly once, rooted at its minimum-(degree, id)
    corner.

    Scale design (100 TB): two extra degree joins up front (one
    groupBy + two shuffles on node id) buy a wedge intermediate that no
    skewed key can inflate; the closing check stays a semi-join. Use
    this for external/unbounded-degree graphs; plain ``triangle_count``
    for graphs this engine already degree-bounds (mutual top-k).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        # e feeds deg (twice via the union) and ek — checkpoint once.
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
        # deg fans into the du/dv joins; |V| rows, cheap to pin.
        .localCheckpoint(eager=False)
    )
    ek = (
        e.join(deg.select(F.col("n").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("n").alias("v"), F.col("deg").alias("dv")), "v")
        .select(
            "u",
            "v",
            F.struct(F.col("du").alias("d"), F.col("u").alias("i")).alias("ku"),
            F.struct(F.col("dv").alias("d"), F.col("v").alias("i")).alias("kv"),
        )
    )
    # Orient by (degree, id): s -> d with key(s) < key(d); carry d's key
    # so wedge endpoints can be ordered without re-joining degrees.
    oriented = ek.select(
        F.when(F.col("ku") < F.col("kv"), F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(F.col("ku") < F.col("kv"), F.col("v")).otherwise(F.col("u")).alias("d"),
        F.when(F.col("ku") < F.col("kv"), F.col("kv")).otherwise(F.col("ku")).alias("kd"),
        # oriented fans into x/y/close — pin it so the two degree joins
        # above run once, not three times.
    ).localCheckpoint(eager=False)
    x = oriented.select(
        F.col("s").alias("a"), F.col("d").alias("b"), F.col("kd").alias("kb")
    )
    y = oriented.select(
        F.col("s").alias("a"), F.col("d").alias("c"), F.col("kd").alias("kc")
    )
    wedges = x.join(y, "a").where(F.col("kb") < F.col("kc"))
    close = oriented.select(F.col("s").alias("b"), F.col("d").alias("c"))
    tris = wedges.join(close, ["b", "c"], "left_semi")
    nodes = tris.select(
        F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias("node")
    )
    return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


def mutual_topk_graph(
    weighted_pairs: DataFrame,
    k: int = 3,
    a_col: str = "a",
    b_col: str = "b",
    w_col: str = "w",
) -> DataFrame:
    """Sparsify a weighted pair list into each node's top-``k``
    strongest partners (union of both directions) — the kNN-graph
    construction that keeps co-occurrence projections from going
    quadratic: whatever the pair density, output degree is ≤ 2k.

    Ranking is (weight DESC, partner ASC) per node — deterministic and
    window-partitioned (WindowGroupLimit: per-partition partial top-k
    before the exchange, never a global sort). Returns oriented
    distinct edges ``(src, dst)`` with src < dst.
    """
    both = weighted_pairs.select(
        F.col(a_col).alias("n"), F.col(b_col).alias("p"), F.col(w_col).alias("w")
    ).unionByName(
        weighted_pairs.select(
            F.col(b_col).alias("n"), F.col(a_col).alias("p"), F.col(w_col).alias("w")
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("n").orderBy(F.col("w").desc(), F.col("p").asc())
    kept = both.withColumn("_r", F.row_number().over(w)).where(F.col("_r") <= k)
    return kept.select(
        F.least(F.col("n"), F.col("p")).alias("src"),
        F.greatest(F.col("n"), F.col("p")).alias("dst"),
    ).distinct()


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    max_hops: int = 10,
    undirected: bool = False,
) -> DataFrame:
    """Multi-source breadth-first search → ``(node, hops BIGINT)``:
    the minimum hop distance from any seed node, for every node
    reachable within ``max_hops``. Unreachable nodes are absent.

    Pure integer computation — no float anywhere — so the result is
    bit-identical in any engine; the DuckDB oracle is a recursive CTE
    with ``UNION`` dedup on (node, depth) + a closing ``min(d)``.

    Scale: frontier-expansion BFS, the textbook distributed form.
    Per round: one keyed join (frontier ⋈ edges on src), one distinct
    on the (small) next-frontier, one anti-join against the visited
    set. The edge list is cached pre-partitioned on the join key once
    and never reshuffled; only frontiers (bounded by |V|) move. Each
    round's frontier is ``localCheckpoint``-ed — the round count is a
    data-dependent loop, so without truncation the plan would double
    per hop. The per-round driver ``count`` doubles as the
    convergence probe (empty frontier → early exit).
    """
    if max_hops < 0:
        raise ValueError(f"max_hops={max_hops} must be >= 0")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    if undirected:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.distinct()
    n_parts = e.sparkSession.sparkContext.defaultParallelism
    e = e.repartition(n_parts, F.col("src")).cache()

    dist = (
        seeds.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0).cast("long"))
        .localCheckpoint()
    )
    frontier = dist.select("node")
    for d in range(1, max_hops + 1):
        nxt = (
            frontier.withColumnRenamed("node", "src")
            .join(e, "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(d).cast("long"))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt.select("node")
    e.unpersist()
    return dist


def kcore(
    edges: DataFrame,
    k: int,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 12,
) -> DataFrame:
    """k-core decomposition by iterative peeling → ``(node, core_deg
    BIGINT)``: the maximal subgraph where every node has degree ≥ k,
    as the surviving nodes with their within-core degree.

    Input edges are treated as UNDIRECTED (symmetrized internally).
    Pure integer computation. Cross-engine contract: each round drops
    every node whose current degree < k, and the loop exits early
    ONLY when a round drops nothing — so running extra rounds is a
    no-op and a fixed-round SQL unroll (contract._kcore_sql) matches
    the early-exiting loop exactly, at any scale, as long as both pin
    the same ``max_rounds``. If peeling hasn't converged within
    ``max_rounds`` both engines still agree (both computed exactly
    ``max_rounds`` peels); the result is then the partially-peeled
    degree table, documented rather than hidden.

    Scale: per round, one partial-agg degree count and one anti-join
    against the (small, shrinking) drop set — Catalyst broadcasts it.
    The graph only shrinks; each round's survivor edge list is
    ``localCheckpoint``-ed so the plan doesn't grow with rounds.
    """
    if k < 1:
        raise ValueError(f"k={k} must be >= 1")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    e = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    n_parts = e.sparkSession.sparkContext.defaultParallelism
    e = e.repartition(n_parts, F.col("src")).localCheckpoint()
    for _ in range(max_rounds):
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
        bad = deg.where(F.col("_deg") < k).select("src").localCheckpoint()
        if bad.isEmpty():
            break
        e = (
            e.join(bad, "src", "left_anti")
            .join(bad.withColumnRenamed("src", "dst"), "dst", "left_anti")
            .localCheckpoint()
        )
    return e.groupBy("src").agg(
        F.count(F.lit(1)).alias("core_deg")
    ).select(F.col("src").alias("node"), "core_deg")


def clustering_coefficients(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Local clustering coefficient per node over an undirected edge
    list: ``cc = 2·T(v) / (deg(v)·(deg(v)−1))``, reported in exact ppm
    (``2·T·1e6 div deg·(deg−1)`` — integer floor, no float division)
    so the relation replays bit-for-bit in SQL. Nodes with fewer than
    two neighbors report ``cc_ppm = 0``.

    Returns ``(node, degree BIGINT, n_triangles BIGINT, cc_ppm
    BIGINT)`` for every node in the edge list.

    Shape: ONE canonical distinct edge frame (localCheckpoint — it
    feeds the three triangle branches AND the degree union, the
    self-join-diamond rule), the X24 oriented triangle enumeration for
    T(v), a two-way union partial-agg for degrees, one left join to
    keep triangle-free nodes.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .where(F.col("lo") != F.col("hi"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    ab = e.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    bc = e.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    ac = e.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    tris = ab.join(bc, "b").join(ac, ["a", "c"], "left_semi")
    t = (
        tris.select(
            F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (
        e.select(F.col("lo").alias("node"))
        .unionAll(e.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    return deg.join(t, "node", "left_outer").select(
        "node",
        "degree",
        F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias(
            "n_triangles"
        ),
        F.when(
            F.col("degree") >= 2,
            F.expr(
                "(2 * coalesce(n_triangles, 0) * 1000000L)"
                " div (degree * (degree - 1))"
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("cc_ppm"),
    )
