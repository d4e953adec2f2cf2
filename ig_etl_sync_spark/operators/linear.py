"""Deterministic distributed linear-model training (fixed-point GD).

The missing closing loop of a training-data pipeline: the engine that
APPLIES a quality filter can also TRAIN one. This is linear regression
/ linear-probe classification by full-batch gradient descent where
every step is integer arithmetic:

- features and labels quantize to BIGINT at scale ``2^10`` (1024),
- weights live at scale ``2^20``,
- the prediction descale, the gradient average, and the learning-rate
  multiply are all floor divisions by powers of two,

so the ENTIRE training trajectory — not just the final weights — is
bit-identical in any engine; contract.py replays it as unrolled DuckDB
CTEs exactly like the k-means and PageRank oracles. (A sigmoid would
need exp() and break cross-engine exactness; squared loss over a 0/1
label — a linear probe — is the standard exact-arithmetic-friendly
choice.)

Scale: one partial-agg scan per iteration producing k+1 numbers (the
gradient sums and the row count); the weight state is a ONE-ROW frame
(never collected to the driver), ``localCheckpoint``-ed per sweep to
truncate the growing lineage. 100 TB of feature rows stream through
each sweep; only k numbers ever shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["linear_probe_train", "X_SCALE", "W_SCALE"]

#: feature/label quantization scale (power of two: exact floor-divs).
X_SCALE = 1 << 10
#: weight scale.
W_SCALE = 1 << 20


def linear_probe_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    *,
    iters: int = 5,
    lr_num: int = 512,
) -> DataFrame:
    """Full-batch GD for ``w ≈ argmin Σ (x·w − y)²`` over quantized
    features. ``feature_cols``/``label_col`` must already be BIGINT
    columns at scale ``X_SCALE`` (quantize upstream — keeping the
    quantization in the caller makes the feature recipe part of the
    replayable contract). In real units the learning rate is
    ``lr_num * X_SCALE / W_SCALE`` — the update divides the raw
    integer gradient by ``X_SCALE`` once and lands at weight scale
    ``W_SCALE``; at the shipped scales (``W_SCALE == X_SCALE**2``)
    that simplifies to ``lr_num / X_SCALE``.

    Per iteration, with integer state ``w_j`` (scale ``W_SCALE``)::

        r_i  = (Σ_j x_ij * w_j) div W_SCALE  -  y_i      -- scale X_SCALE
        G_j  = Σ_i x_ij * r_i
        w_j' = w_j - (lr_num * (G_j div n)) div X_SCALE

    Returns a ONE-ROW DataFrame ``(w_<feature>... BIGINT,
    l1_loss BIGINT)`` where ``l1_loss = Σ |r_i|`` under the FINAL
    weights (an exact-integer fit diagnostic).
    """
    if iters < 0:
        raise ValueError(f"iters={iters} must be >= 0")
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    k = len(feature_cols)
    d = df.select(
        *[F.col(c).cast("long").alias(f"x{j}") for j, c in enumerate(feature_cols)],
        F.col(label_col).cast("long").alias("y"),
    ).localCheckpoint(eager=False)  # consumed once per sweep + final loss

    if d.isEmpty():
        # n = 0 would make every `g div _n` NULL and silently propagate
        # NULL weights/loss — fail loudly like the other operators
        raise ValueError("linear_probe_train: empty input DataFrame")

    spark = df.sparkSession
    w = spark.range(1).select(
        *[F.lit(0).cast("long").alias(f"w{j}") for j in range(k)]
    )

    for _ in range(iters):
        joined = d.crossJoin(F.broadcast(w))
        r = (F.expr(f"({_dot_sql(k)}) div {W_SCALE}") - F.col("y")).alias("_r")
        g = joined.select(
            *[F.col(f"x{j}") for j in range(k)],
            *[F.col(f"w{j}") for j in range(k)],
            r,
        ).agg(
            *[F.sum(F.col(f"x{j}") * F.col("_r")).cast("long").alias(f"g{j}")
              for j in range(k)],
            F.count(F.lit(1)).cast("long").alias("_n"),
            *[F.min(f"w{j}").alias(f"w{j}") for j in range(k)],
        )
        w = g.select(
            *[
                (
                    F.col(f"w{j}")
                    - F.expr(f"({lr_num} * (g{j} div _n)) div {X_SCALE}")
                ).cast("long").alias(f"w{j}")
                for j in range(k)
            ]
        ).localCheckpoint(eager=False)

    final = d.crossJoin(F.broadcast(w))
    loss = final.agg(
        *[F.min(f"w{j}").alias(f"w{j}") for j in range(k)],
        F.sum(
            F.abs(F.expr(f"({_dot_sql(k)}) div {W_SCALE}") - F.col("y"))
        ).cast("long").alias("l1_loss"),
    )
    return loss.select(
        *[F.col(f"w{j}").alias(f"w_{c}") for j, c in enumerate(feature_cols)],
        "l1_loss",
    )


def _dot_sql(k: int) -> str:
    return " + ".join(f"x{j} * w{j}" for j in range(k))
