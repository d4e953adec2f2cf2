"""Aggregation strategies for skew: two-phase exact distinct counting.

``count_distinct`` aggregates carry every distinct value of a group to
that group's single reducer — a hot key (one event_type owning half the
corpus) serializes on one task. The two-phase form shuffles on
``(keys..., value)`` FIRST: partial aggregation collapses duplicates
map-side, the value column spreads the hot key across all reducers,
and the second (tiny) shuffle counts collapsed rows per key. Same
exact answer, no single-reducer bottleneck — the standard rewrite
AQE cannot apply for you (it is a semantic transformation, not a
physical one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["two_phase_count_distinct"]


def two_phase_count_distinct(
    df: DataFrame,
    keys: list[str],
    col: str,
    out_col: str = "ndv",
) -> DataFrame:
    """Exact per-key distinct count of ``col`` → ``(keys..., out_col
    BIGINT)`` with FULL ``COUNT(DISTINCT col)`` semantics: NULL values
    are not counted, but a key whose values are all NULL still appears
    with 0 (the group exists; its distinct set is empty).

    The key universe is one extra partial-agg pass over (keys) — it
    collapses map-side to |keys| rows, so the dominant cost stays the
    (keys, value) distinct."""
    counted = (
        df.select(*keys, col)
        .where(F.col(col).isNotNull())
        .distinct()
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(out_col))
    )
    universe = df.select(*keys).distinct()
    return universe.join(counted, keys, "left").select(
        *keys, F.coalesce(F.col(out_col), F.lit(0)).cast("long").alias(out_col)
    )
