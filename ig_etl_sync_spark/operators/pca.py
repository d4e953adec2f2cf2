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

__all__ = ["power_iteration_pc1", "power_iteration_top2"]

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
    # one py4j call for the whole array: F.array(*64 lits) costs ~130
    # JVM round trips PER PLAN, which at 2 plans x 12 iterations was
    # ~1.5 s of pure driver chatter in power_iteration_top2 (measured;
    # the resolved literal is bit-identical either way)
    return F.lit([int(x) for x in vals]).cast("array<bigint>")


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

    cent = _centered(df, id_col, vec_col)
    v = _iterate(cent, dims, iters)
    return cent.select(
        id_col, _dot(F.col("cq"), _lit_arr(v)).alias("pc1_proj")
    )


def _centered(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Quantize + floor-mean-center; localCheckpoint (every iteration
    reads it — self-join-diamond rule)."""
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
    return q.select(
        id_col,
        F.zip_with("qv", _lit_arr(mv), lambda a, b: a - b).alias("cq"),
    ).localCheckpoint(eager=False)


def _iterate(cent: DataFrame, dims: int, iters: int) -> list[int]:
    """The power-iteration loop over a centered BIGINT-array frame
    (column ``cq``); returns the final direction (L∞ scale V_SCALE)."""
    v = [V_SCALE] * dims
    for _ in range(iters):
        # Two bounded collects per iteration over the UNPINNED dots
        # plan (round 9): the max pass and the score pass each rescan
        # the checkpointed cent and recompute the dot fold — cheaper
        # than the old per-iteration dots.cache(), whose
        # InMemoryRelation encode duplicated cq's storage for one
        # reread (A/B lean at sf0.1: quiet-window mins 4.98/5.29 vs
        # cached 5.76/5.83 on embedding_top2_pcs; never worse outside
        # weather bursts). The second collect CANNOT fuse into the
        # first: the per-row score is `dot div dv` with dv a driver
        # function of the first pass's max, and the truncating per-row
        # division does not commute with the sum — fusing would change
        # the oracled fixed-point values. (Other measured rejections:
        # broadcast-scalar join fusion ~35% slower per iteration;
        # parameterizing v as a broadcast column ~2.4x slower.)
        dots = cent.select(
            "cq", _dot(F.col("cq"), _lit_arr(v)).alias("dot")
        )
        mx = dots.agg(F.max(F.abs("dot"))).collect()[0][0]
        if mx is None:  # empty input: keep the start vector
            break
        dv = _tdiv(int(mx), S_SCALE) + 1
        # The bounded score lands in its own select BEFORE the
        # explode so it is evaluated once per input row, never per
        # exploded row.
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
    return v


#: deflation scales: the direction is re-expressed at D_SCALE before
#: the division-free Gram-Schmidt so the products stay in BIGINT, and
#: deflated rows renormalize to Q_SCALE (the centered data's own range).
D_SCALE = 1 << 10
Q_SCALE = 1 << 21


def power_iteration_top2(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 6,
    dims: int | None = None,
) -> DataFrame:
    """Top TWO principal directions: PC1 by power iteration, then
    DIVISION-FREE integer deflation, then power iteration again.

    The deflation is exact Gram-Schmidt with no division at all::

        cq2 = cq * (vd . vd)  -  vd * (vd . cq)

    which satisfies ``vd . cq2 = 0`` EXACTLY in integers (substitute:
    ``(vd.cq)(vd.vd) - (vd.vd)(vd.cq)``) — so the second iteration
    provably searches the orthogonal complement with zero rounding
    leakage. ``vd = v1 div 2^10`` bounds the products (|cq·(vd.vd)| ≤
    2.5e6·64·2^20 ≈ 1.7e14, |vd·(vd.cq)| ≈ 1.6e14), and deflated rows
    renormalize to ``Q_SCALE`` by the same data-adaptive truncating
    division the score pass uses — every step replays in SQL.

    Returns ``(id_col, pc1_proj BIGINT, pc2_proj BIGINT)`` where
    ``pc2_proj`` is measured against the DEFLATED (renormalized) data —
    the standard deflated-projection convention.
    """
    if iters < 1:
        raise ValueError(f"iters={iters} must be >= 1")
    if dims is None:
        first = df.select(F.size(vec_col).alias("n")).first()
        if first is None:
            raise ValueError("power_iteration_top2: empty input")
        dims = first["n"]

    cent = _centered(df, id_col, vec_col)
    v1 = _iterate(cent, dims, iters)

    vd = [_tdiv(x, V_SCALE // D_SCALE) for x in v1]
    s2 = sum(x * x for x in vd)
    if s2 == 0:  # degenerate direction: PC2 degenerates to PC1's path
        s2 = 1
    vd_arr = _lit_arr(vd)
    # The per-row dot is hoisted to its own select: inside the zip_with
    # lambda it would re-evaluate per ELEMENT after projection collapse
    # (the element_at trap's sibling).
    defl = cent.select(
        id_col, "cq", _dot(F.col("cq"), vd_arr).alias("_p")
    ).select(
        id_col,
        "cq",
        F.zip_with(
            "cq",
            vd_arr,
            lambda c, w: c * F.lit(s2).cast("long") - w * F.col("_p"),
        ).alias("cq2"),
    ).localCheckpoint(eager=False)
    m = defl.agg(
        F.max(
            F.aggregate(
                "cq2",
                F.lit(0).cast("long"),
                lambda acc, x: F.greatest(acc, F.abs(x)),
            )
        )
    ).collect()[0][0]
    if m is None:  # empty input: both projection relations are empty
        return cent.select(
            id_col,
            _dot(F.col("cq"), _lit_arr(v1)).alias("pc1_proj"),
            F.lit(0).cast("long").alias("pc2_proj"),
        )
    qd = _tdiv(int(m), Q_SCALE) + 1
    cent2 = defl.select(
        id_col,
        F.transform("cq2", _tdiv_by(qd)).alias("cq"),
    ).localCheckpoint(eager=False)
    v2 = _iterate(cent2, dims, iters)

    return (
        cent.select(
            id_col, _dot(F.col("cq"), _lit_arr(v1)).alias("pc1_proj")
        )
        .join(
            cent2.select(
                id_col, _dot(F.col("cq"), _lit_arr(v2)).alias("pc2_proj")
            ),
            id_col,
        )
    )


def _tdiv_by(d: int):
    """Element-wise truncating division by a positive literal, exact in
    integers: ``(|x| - |x| % d) / d`` is exactly divisible, so the
    double division is a correctly-rounded EXACT integer (< 2^53);
    sign-split restores truncation toward zero (≡ ``div`` / ``//``).
    (HOF lambdas must be unary — repo rule — so close over ``d``.)"""

    def f(x):
        ax = F.abs(x)
        q = ((ax - ax % F.lit(d)) / F.lit(d)).cast("long")
        return F.when(x < 0, -q).otherwise(q)

    return f
