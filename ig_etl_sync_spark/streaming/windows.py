"""Watermarked windowed aggregation over event streams (SURVEY §2.9 X7).

Late data handling the reference lacks entirely: a watermark bounds
state (events later than the watermark are dropped, windows older than
it are finalized and evicted), so the aggregation runs indefinitely at
bounded memory — the requirement for a 100 TB/day event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def watermarked_window_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_duration: str = "1 hour",
    watermark_delay: str = "10 minutes",
    value_col: str | None = "value",
) -> DataFrame:
    """Tumbling-window counts (and value sums) with late-data bound.

    Works on both batch and streaming frames — the batch equivalent is
    the ``events_hourly`` contract query, which is how this operator is
    oracle-checked (same plan minus the watermark node).
    """
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 2).alias("sum_value"))
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark_delay)
    return (
        df.groupBy(F.window(ts_col, window_duration).alias("w"), F.col(key_col))
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            *[c for c in ("n", "sum_value") if value_col is not None or c == "n"],
        )
    )
