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
    with 0 (the group exists; its distinct set is empty), and NULL
    group keys form their own group exactly like SQL ``GROUP BY``.

    Single input scan: the (keys, value) distinct keeps NULL-valued
    rows, so every key survives into the second phase (each key
    contributes at least one distinct row), and ``count(col)`` —
    which ignores NULLs — is then the exact NDV. No key-universe
    join, no null-safe-equality pitfalls."""
    return (
        df.select(*keys, col)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(F.col(col)).cast("long").alias(out_col))
    )
