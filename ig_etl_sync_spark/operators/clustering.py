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

from pyspark.sql import DataFrame
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
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    ).localCheckpoint()
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component"))
        .localCheckpoint()
    )
    for it in range(max_iter):
        nbr = (
            sym.join(labels, sym["v"] == labels["id"])
            .groupBy("u")
            .agg(F.min("component").alias("_nbr_min"))
        )
        new_labels = (
            labels.join(nbr, labels["id"] == nbr["u"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("_nbr_min"), F.col("component"))
                ).alias("component"),
                F.col("component").alias("_old"),
            )
        ).localCheckpoint()
        if (it + 1) % check_every == 0 or it == max_iter - 1:
            changed = new_labels.where(F.col("component") != F.col("_old")).count()
            labels = new_labels.drop("_old")
            if changed == 0:
                return labels
        else:
            labels = new_labels.drop("_old")
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
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
