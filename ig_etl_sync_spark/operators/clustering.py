"""Connected components over near-duplicate pair graphs.

The missing last step of corpus dedup at scale: MinHash/SimHash/LSH
blocking emits *pairs*, but transitive duplicates (A~B, B~C) must
collapse into one cluster with one canonical survivor — otherwise a
pair-wise "drop id_b" policy can drop every member of a chain or keep
two docs that are both near-dups of a third. Resolution = connected
components + keep the minimum id per component.

Algorithm: iterative min-label propagation to fixpoint. Each round,
every node takes the min of its own label and its neighbors' labels;
labels converge to the component's minimum id in O(diameter) rounds.
Near-dup clusters are shallow (dup groups of 2–10 docs, diameter ≤ 3–4
after symmetrization), so 2–4 rounds close real corpora; ``max_iter``
bounds the adversarial case, and large-star/small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond") is the documented
upgrade path if diameters ever grow.

Scale design:

- Each round is one shuffle join (edges ⋈ labels on dst) + one
  partial-agg ``min`` — both key-partitioned on node id, so AQE reuses
  the same exchange shape every round.
- ``localCheckpoint`` after every round truncates the lineage —
  without it the plan doubles per iteration and Catalyst analysis
  time, not the data, becomes the bottleneck.
- The convergence check is one aggregate action per round (a count of
  changed labels), the standard price of fixpoint iteration; at 100 TB
  you'd check every k rounds instead — ``check_every`` exposes that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    check_every: int = 1,
) -> DataFrame:
    """Resolve the undirected graph given by ``edges`` into components.

    Returns ``(id, component)`` for every node appearing in any edge,
    where ``component`` is the minimum node id in its component.
    Raises if ``max_iter`` rounds pass without convergence (returning
    a half-propagated labelling would silently split clusters).

    Round structure (round 9 — the serial checkpoint chain was the
    measured wall, not the shuffled bytes):

    - the symmetric edge set carries a SELF-LOOP per endpoint, so one
      ``join + groupBy(u).min`` computes ``min(own, neighbors)`` per
      round — the old two-join form (nbr-min then left-join back onto
      labels) is folded into one shuffle. Built with one
      ``explode(array(...))`` branch (the repo's union-of-projections
      rule): the caller's pair chain — an UNPINNED minhash blocking
      pipeline in every contract caller — evaluates once, not twice.
    - labels initialize to ``min(id, min(neighbors))`` straight off the
      edge set: round 1 of identity-label propagation, fused into the
      init aggregate (one fewer join+checkpoint round).
    - ``check_every`` is the convergence-probe cadence. Near-dup graphs
      converge in 1–2 rounds (measured sf0.1: 1 changed round), so the
      default probes EVERY round — the old every-3 default forced two
      no-op join+checkpoint rounds past the fixpoint, each costlier
      than the count it saved. The probe is monotone-safe at any
      cadence: labels only decrease, so zero changes proves the fixed
      point, and the final round always probes.
    """
    sym = (
        edges.where(F.col(src) != F.col(dst))  # pure self-loops are not edges
        .select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                    F.struct(F.col(src).alias("u"), F.col(src).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(dst).alias("v")),
                )
            ).alias("_e")
        )
        .select(F.col("_e.u").alias("u"), F.col("_e.v").alias("v"))
        .distinct()
    ).localCheckpoint()
    labels = (
        sym.groupBy("u")
        .agg(F.min("v").alias("component"))
        .select(F.col("u").alias("id"), "component")
        .localCheckpoint()
    )
    for it in range(max_iter):
        new_labels = (
            sym.join(
                labels.select(F.col("id").alias("v"), "component"), "v"
            )
            .groupBy("u")
            .agg(F.min("component").alias("component"))
            .select(F.col("u").alias("id"), "component")
        )
        probe = (it + 1) % check_every == 0 or it == max_iter - 1
        if probe:
            new_labels = new_labels.join(
                labels.select("id", F.col("component").alias("_old")), "id"
            )
        new_labels = new_labels.localCheckpoint()
        if probe:
            changed = new_labels.where(
                F.col("component") != F.col("_old")
            ).count()
            labels = new_labels.drop("_old")
            if changed == 0:
                return labels
        else:
            labels = new_labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14).

    Same contract as :func:`connected_components`, different round
    complexity: label propagation needs O(diameter) rounds — fine for
    shallow near-dup clusters, hopeless for deep graphs (a 1M-node
    chain is 1M rounds). Star rounds contract paths aggressively and
    converge in O(log² n) (O(log n) in practice), so this is the
    variant for arbitrary graph shapes: web graphs, citation networks,
    entity-resolution chains.

    Each round is two grouped-min joins over the current edge set:

    - **large-star**: every node u links its strictly-larger neighbors
      to ``m(u) = min(N(u) ∪ {u})`` — long tails hook onto small ids.
    - **small-star**: orient edges toward the smaller endpoint, link
      all ≤-neighbors (and u itself) to the minimum — stars flatten.

    Convergence: the edge set is a fixpoint (both operations leave it
    unchanged); final edges form stars centered at each component's
    minimum, read off as (id, component). Same shuffle discipline as
    label propagation — every stage hash-partitions on node id,
    ``localCheckpoint`` truncates per-round lineage.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col(src) != F.col(dst))
        .distinct()
        .localCheckpoint()
    )
    if not e.take(1):
        return e.select(F.col("u").alias("id"), F.col("v").alias("component"))

    def _star(cur: DataFrame, large: bool) -> DataFrame:
        # symmetric view for large-star; small-to-large orientation for
        # small-star (v <= u after flip)
        if large:
            nbrs = cur.union(cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
        else:
            nbrs = cur.select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
        m = nbrs.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        joined = nbrs.join(m, "u")
        if large:
            out = joined.where(F.col("v") > F.col("u")).select("v", "m")
        else:
            # v <= u by orientation; also re-link u itself to m
            out = joined.select("v", "m").union(
                joined.select(F.col("u").alias("v"), "m").distinct()
            )
        return (
            out.where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    for _ in range(max_iter):
        nxt = _star(_star(e, large=True), large=False).localCheckpoint()
        # fixpoint test: symmetric difference empty (counts first — cheap)
        if nxt.count() == e.count() and not nxt.exceptAll(e).take(1):
            # stars: every edge is (node, component-min); add centers
            comp = nxt.select(F.col("u").alias("id"), F.col("v").alias("component"))
            centers = (
                nxt.select(F.col("v").alias("id"))
                .distinct()
                .join(comp.select(F.col("id")), "id", "left_anti")
                .select("id", F.col("id").alias("component"))
            )
            return comp.union(centers)
        e = nxt
    raise RuntimeError(
        f"connected_components_star did not converge in {max_iter} rounds"
    )


def resolve_dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-dup pairs → per-doc cluster assignment + keep decision.

    Output: ``doc_id, cluster_id, cluster_size, keep`` — one row per
    document that appears in any pair; ``keep`` marks the canonical
    survivor (minimum doc_id in the cluster). Docs in no pair are
    implicitly kept and not listed (join back with a left-anti to
    apply the policy to a corpus).
    """
    comp = connected_components(pairs, src=id_a, dst=id_b)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    # No forced broadcast: component count is data-dependent (can be
    # huge at corpus scale); AQE picks broadcast when sizes is small.
    return (
        comp.join(sizes, "component")
        .select(
            F.col("id").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            "cluster_size",
            (F.col("id") == F.col("component")).alias("keep"),
        )
    )


def cluster_dilution(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    threshold: float = 0.7,
    top_n: int = 100,
) -> DataFrame:
    """X95: transitive-closure dilution audit — hard dedup deletes
    everything in a connected component, but components CHAIN (A~B~C
    where A and C never matched directly), so the audit reports, per
    near-dup cluster, how complete its direct-pair graph actually is:
    ``density_ppm = 2·|pairs|·1e6 div (size·(size-1))`` plus the
    weakest verified link. A density far below 1e6 on a large cluster
    is the signature of chained over-deletion — the evidence for
    switching that corpus to soft weighting (X82) or per-cluster
    re-verification (SemDeDup's within-cluster pass).

    Scale: pairs are the LSH-blocked relation (never all-pairs),
    components resolve by label-prop (O(log diameter) rounds), the
    per-cluster aggregation is linear in pairs, and the output is the
    deterministic top-``top_n`` by (size DESC, cluster_id ASC) like
    every pair-family contract.

    Returns ``(cluster_id, size, n_pairs, density_ppm,
    min_jaccard)``.
    """
    from ig_etl_sync_spark.operators.dedup import near_dup_pairs_minhash

    pairs = near_dup_pairs_minhash(
        docs, id_col, text_col, num_hashes, bands, shingle_k, threshold
    )
    # feeds the component resolution AND the per-cluster agg
    pairs = pairs.localCheckpoint(eager=False)
    comp = resolve_dup_clusters(pairs)
    member = comp.select(
        F.col("doc_id").alias("id_a"), "cluster_id", "cluster_size"
    )
    per = (
        pairs.join(member, "id_a")
        .groupBy("cluster_id")
        .agg(
            F.max("cluster_size").cast("long").alias("size"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.min("jaccard").alias("min_jaccard"),
        )
        .withColumn(
            "density_ppm",
            F.expr("2 * n_pairs * 1000000 div (size * (size - 1))")
            .cast("long"),
        )
    )
    return (
        per.select(
            "cluster_id", "size", "n_pairs", "density_ppm", "min_jaccard"
        )
        .orderBy(F.col("size").desc(), F.col("cluster_id").asc())
        .limit(top_n)
    )


def resolve_dup_clusters_scored(
    pairs: DataFrame,
    scores: DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """X106: quality-aware canonical selection — the production policy
    :func:`resolve_dup_clusters`'s min-id rule approximates: within
    each near-dup cluster keep the member with the HIGHEST score
    (token count, quality composite, ...), id-ascending tiebreak.
    Min-id keeps whatever crawled first; keep-longest/keep-best is
    what corpus dedup actually wants (the duplicate family usually
    contains truncated/boilerplate-wrapped variants of one best copy).

    ``scores``: ``(id_col, score_col)`` relation; members missing from
    it sort LAST (never canonical unless the whole cluster is
    unscored) rather than silently dropping from their cluster. Ids
    need not be unique in ``scores``: duplicates collapse to their MAX
    score before the join (a duplicate-id relation would otherwise
    multiply member rows, inflating cluster_size and emitting
    duplicate output rows per doc — ADVICE r07).

    Output: ``(doc_id, cluster_id, cluster_size, score, keep)`` — one
    row per doc appearing in any pair; unpaired docs are implicitly
    kept (apply with a left-anti, as with the min-id form).

    Scale: components by label-prop, one score join, one per-cluster
    window over cluster members (bounded by cluster size — the same
    shape as the min-id form's size agg).
    """
    comp = connected_components(pairs, src=id_a, dst=id_b)
    joined = comp.join(
        scores.select(
            F.col(id_col).alias("id"), F.col(score_col).alias("score")
        )
        .groupBy("id")
        .agg(F.max("score").alias("score")),
        "id",
        "left",
    )
    w_c = Window.partitionBy("component")
    w_r = w_c.orderBy(F.desc_nulls_last("score"), F.asc("id"))
    return (
        joined.withColumn("_r", F.row_number().over(w_r))
        .select(
            F.col("id").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            F.count(F.lit(1)).over(w_c).cast("long").alias("cluster_size"),
            "score",
            (F.col("_r") == 1).alias("keep"),
        )
    )
