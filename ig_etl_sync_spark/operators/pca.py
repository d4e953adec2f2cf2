"""Distributed principal-component extraction by fixed-point power
iteration.

The missing embedding-whitening primitive next to k-means (X36) and the
random projection (round 4): find the top eigenvector of the embedding
covariance without ever materializing the covariance matrix.  Each
iteration is one corpus scan with the direction vector embedded as a
64-literal array (the k-means codebook pattern) plus a ``dims``-row
partial-agg shuffle — the classic scalable formulation (Halko et al.
2011, public).

Why fixed-point: the contract oracle replays every iteration in DuckDB
(PageRank/k-means precedent), and float matmuls are not bit-stable
across engines.  All arithmetic is BIGINT:

- quantize with :func:`~ig_etl_sync_spark.operators.kmeans.quantize_embeddings`
  (``floor((x + 2) * 1e6)``, strictly positive);
- center on the floor per-dimension mean (``sum div n`` — exact because
  quantized values are non-negative);
- per-row scores and the updated vector are renormalized each round by
  **data-adaptive truncating division** (``a div (max|a| div SCALE + 1)``).
  Spark ``div``, DuckDB ``//`` and the driver-side :func:`_tdiv` all
  truncate toward zero (verified: ``-7 div 2 = -7 // 2 = -3``), so the
  replay is exact for NEGATIVE intermediates too — unlike the
  floor-vs-trunc trap the strictly positive k-means contract sidesteps.

Driver-side state is DIMS-BOUNDED, never corpus-bounded: per iteration
the driver collects one scalar (the score divisor) and ``dims`` partial
sums — the same posture as the bloom filter's n_bits/32 ints.  The
corpus-side centered frame is ``localCheckpoint``-materialized once and
re-scanned per iteration (at petabyte scale swap the checkpoint for a
parquet temp or recompute-from-scan; the loop structure is unchanged).

Overflow headroom (documented bound, not a runtime check): with
``|cq| <= 2.5e6`` (quantized spread), ``s <= 2^16`` and ``v <= 2^20``,
the per-dimension update ``sum(cq*s)`` stays under BIGINT for corpora
up to ~5e11 rows, and the dot product under ``2.5e6 * 2^20 * dims``
— 64 dims leaves 5 orders of magnitude of slack.

Reference parity: the reference engine (672-line Go ETL sync) has no
linear-algebra surface; this extends the X-series LLM-pipeline ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ig_etl_sync_spark.operators.kmeans import quantize_embeddings

__all__ = ["power_iteration_pc1"]

#: renormalization targets — the updated direction is L∞-normalized to
#: V_SCALE, per-row scores to S_SCALE; both are BIGINT literals in SQL.
V_SCALE = 1 << 20
S_SCALE = 1 << 16


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division — Python ``//`` floors, so
    negative numerators need the sign split to match Spark ``div`` and
    DuckDB ``//``."""
    return -((-a) // b) if a < 0 else a // b


def _dot(a, b):
    """Integer dot product of two BIGINT array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _lit_arr(vals: list[int]):
    return F.array(*[F.lit(int(x)).cast("long") for x in vals])


def power_iteration_pc1(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 6,
    dims: int | None = None,
) -> DataFrame:
    """Project every vector onto the dominant covariance eigenvector.

    Returns ``(id_col, pc1_proj BIGINT)`` — the integer dot product of
    the centered quantized vector with the converged (L∞-normalized,
    scale ``2^20``) direction.  Sign is deterministic (a function of
    the all-ones start vector), not canonical.

    ``iters`` is a FIXED count with no early exit, so the unrolled SQL
    replay is exact at any scale (the k-core lesson applies only to
    converge-then-stop loops).
    """
    if iters < 1:
        raise ValueError(f"iters={iters} must be >= 1")
    if dims is None:
        first = df.select(F.size(vec_col).alias("n")).first()
        if first is None:
            raise ValueError("power_iteration_pc1: empty input")
        dims = first["n"]

    q = quantize_embeddings(df, vec_col, "qv").select(id_col, "qv")

    # Floor per-dimension mean: one (d, sum, count) partial-agg shuffle
    # collapsing to dims rows; div == floor because quantized values
    # are >= 0.
    mrows = (
        q.select(F.posexplode("qv").alias("d", "x"))
        .groupBy("d")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        .select("d", F.expr("s div n").alias("m"))
        .collect()
    )
    mv = [r.m for r in sorted(mrows, key=lambda r: r.d)]

    # Centered corpus frame — consumed twice per iteration, so
    # materialize it once (self-join-diamond rule).
    cent = q.select(
        id_col,
        F.zip_with("qv", _lit_arr(mv), lambda a, b: a - b).alias("cq"),
    ).localCheckpoint(eager=False)

    v = [V_SCALE] * dims
    for _ in range(iters):
        # Pass A materializes (id, cq, dot) once; the global-max divisor
        # and the per-row scores of pass B both read it without
        # recomputing the dot (diamond rule again).
        dots = cent.select(
            id_col, "cq", _dot(F.col("cq"), _lit_arr(v)).alias("dot")
        ).localCheckpoint(eager=False)
        mx = dots.agg(F.max(F.abs("dot"))).collect()[0][0]
        if mx is None:  # empty input: projection relation is empty too
            break
        dv = _tdiv(int(mx), S_SCALE) + 1
        # The bounded score lands in its own select BEFORE the explode
        # so it is evaluated once per input row, never per exploded row.
        urows = (
            dots.select("cq", F.expr(f"dot div {dv}").alias("s"))
            .select(F.posexplode("cq").alias("d", "x"), "s")
            .groupBy("d")
            .agg(F.sum(F.col("x") * F.col("s")).alias("u"))
            .collect()
        )
        u = [r.u for r in sorted(urows, key=lambda r: r.d)]
        um = _tdiv(max(abs(x) for x in u), V_SCALE) + 1
        v = [_tdiv(x, um) for x in u]

    return cent.select(
        id_col, _dot(F.col("cq"), _lit_arr(v)).alias("pc1_proj")
    )
