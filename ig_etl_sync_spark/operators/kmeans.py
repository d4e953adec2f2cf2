"""Deterministic distributed k-means over embedding columns.

The clustering primitive under IVF indexing, corpus bucketing, and
semantic dedup — expressed so the result is CROSS-ENGINE BIT-IDENTICAL
and therefore DuckDB-oracle-checkable (the oracle unrolls the fixed
iteration count as CTEs):

- Embeddings are quantized ONCE to non-negative fixed-point BIGINTs:
  ``q_d = floor((x_d + offset) * scale)``. The affine step is three
  IEEE double ops (widen, add, multiply) that every engine rounds
  identically; everything after is integer arithmetic. The offset
  makes all quantities non-negative so Spark's ``div`` (truncate
  toward zero) and DuckDB's ``//`` agree (the repo's PageRank rule);
  it cancels in distances and is preserved exactly by centroid means.
- Init: the ``k`` ids that sort FIRST BY MD5 HASH (md5_int32 — the
  repo's cross-engine hash primitive), a deterministic pseudo-random
  draw that spreads seeds across the corpus instead of clustering
  them in one id-range corner (min-id seeding measurably failed to
  separate well-separated blobs). ``orderBy().limit(k)`` —
  TakeOrderedAndProject, never a global sort; cid = 0..k-1 in hash
  order.
- Assignment is SHUFFLE-FREE: the k centroids collapse to a ONE-ROW
  broadcast codebook (the PQ pattern, similarity.py) and each vector
  scans it with nested HOFs (zip_with diff-square + aggregate sum,
  running lexicographic (dist, cid) min) — whole-stage codegen, no
  per-row Python, no window, and the corpus never moves.
- Update: posexplode to (cluster, dim) partial sums — map-side
  combine collapses each partition to ≤ k*dims rows before the
  exchange — then integer floor-div means and an array rebuild from
  the k*dims aggregate. Empty clusters keep their previous centroid.
- Lineage: centroids are ``localCheckpoint``-ed per sweep (k rows —
  the loop would otherwise double the plan per iteration).

Scale: per sweep, the only corpus-wide work is one codegen projection
(assignment) and one partial-agg shuffle bounded at k*dims rows.
100 TB of vectors stream through; only k*dims numbers ever gather.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ig_etl_sync_spark.functions.hashing import md5_int32

__all__ = ["kmeans_assign", "quantize_embeddings"]

#: fixed-point quantization: q = floor((x + _OFFSET) * _SCALE).
#: _OFFSET must exceed max|x| so every q is strictly positive
#: (truncating and floor integer division then agree cross-engine).
_SCALE = 1_000_000
_OFFSET = 2.0

_BIG = (1 << 62) - 1


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "qv"
) -> DataFrame:
    """Non-negative fixed-point quantization of a float-array column.

    Correctness of the cross-engine contract depends on every quantized
    value being strictly positive (truncating ``div`` and floor ``//``
    agree only then), which requires every component > ``-_OFFSET``
    (−2.0). Out-of-range components raise at scan time rather than
    silently diverging centroid means."""
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(
            (x.cast("double") + F.lit(_OFFSET)) * F.lit(float(_SCALE))
        ).cast("long"),
    )
    # Guard on the quantized array itself — truncating div and floor //
    # disagree only for NEGATIVE q, so q >= 0 is the exact contract —
    # and Catalyst CSEs the transform instead of running a second array
    # pass; empty/NULL arrays have nothing out of range.
    in_range = F.coalesce(F.array_min(q) >= F.lit(0), F.lit(True))
    checked = F.when(in_range, q).otherwise(
        F.raise_error(
            F.lit(
                f"quantize_embeddings: component <= -{_OFFSET} breaks the "
                "strictly-positive quantization contract (raise _OFFSET "
                "or rescale inputs)"
            )
        )
    )
    return df.withColumn(out_col, checked)


def _dist2(qv, cv):
    """Integer squared L2 distance between two BIGINT arrays."""
    return F.aggregate(
        F.zip_with(qv, cv, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def kmeans_assign(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
) -> DataFrame:
    """Fixed-iteration k-means → ``(id_col, cluster BIGINT, dist2
    BIGINT)``: each vector's final cluster and its integer squared
    distance (in quantized units) to that cluster's centroid.

    Runs ``iters`` assign→update sweeps from the deterministic seed
    (the ``k`` ids that sort first by ``(md5_int32(id), id)`` — a
    replayable pseudo-random draw), then a final assignment against the
    last centroids. Every step is integer arithmetic on non-negative
    quantities — bit-identical in any engine (see module docstring;
    the DuckDB oracle in contract.py replays all of it).
    """
    if k < 1:
        raise ValueError(f"k={k} must be >= 1")
    if iters < 0:
        raise ValueError(f"iters={iters} must be >= 0")
    corpus = quantize_embeddings(
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")),
        vec_col="_v",
        out_col="qv",
    ).select("_id", "qv")
    # Quantization is cheap but the corpus feeds every sweep — keep the
    # scan from re-running per iteration without caching data bigger
    # than the source (qv is the same width as the input).
    corpus = corpus.localCheckpoint(eager=False)

    seed_key = md5_int32(F.col("_id").cast("string"))
    centroids = (
        corpus.withColumn("_h", seed_key)
        .orderBy("_h", "_id")
        .limit(k)
        .select(
            # bounded window: runs over the k seed rows post-limit
            (F.row_number().over(Window.orderBy("_h", "_id")) - 1)
            .cast("long")
            .alias("cid"),
            F.col("qv").alias("cv"),
        )
    )

    def codebook(c: DataFrame) -> DataFrame:
        """One-row sorted codebook: array<struct<cid,cv>> ordered by cid."""
        return c.agg(
            F.sort_array(F.collect_list(F.struct("cid", "cv"))).alias("_cb")
        )

    def assign(c: DataFrame) -> DataFrame:
        """Shuffle-free nearest-centroid pass: broadcast the one-row
        codebook, nested-HOF scan, running (dist, cid) min — the
        codebook is cid-ascending so strict `<` keeps the smallest
        cid on ties."""
        cb = codebook(c)
        scored = corpus.crossJoin(F.broadcast(cb)).select(
            "_id",
            "qv",
            F.aggregate(
                F.transform(
                    F.col("_cb"),
                    lambda s: F.struct(
                        _dist2(F.col("qv"), s["cv"]).alias("d"),
                        s["cid"].alias("c"),
                    ),
                ),
                F.struct(
                    F.lit(_BIG).cast("long").alias("d"),
                    F.lit(-1).cast("long").alias("c"),
                ),
                lambda acc, x: F.when(x["d"] < acc["d"], x).otherwise(acc),
            ).alias("_best"),
        )
        return scored.select(
            "_id",
            "qv",
            F.col("_best.c").alias("cluster"),
            F.col("_best.d").alias("dist2"),
        )

    for _ in range(iters):
        a = assign(centroids)
        # per-(cluster, dim) integer sums — map-side combine bounds the
        # exchange at k*dims rows per partition
        sums = (
            a.select("cluster", F.posexplode("qv").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(
                F.sum("val").alias("_s"),
                F.count(F.lit(1)).alias("_n"),
            )
            .select(
                "cluster", "pos", F.expr("_s div _n").alias("_m")
            )
        )
        new_c = (
            sums.groupBy("cluster")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "_m"))),
                    lambda s: s["_m"],
                ).alias("ncv")
            )
            .select(F.col("cluster").alias("cid"), "ncv")
        )
        # empty clusters keep their previous centroid
        centroids = (
            centroids.join(new_c, "cid", "left")
            .select("cid", F.coalesce("ncv", "cv").alias("cv"))
            .localCheckpoint()
        )

    return assign(centroids).select(
        F.col("_id").alias(id_col), "cluster", "dist2"
    )
