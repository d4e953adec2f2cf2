"""Streaming distinct-count sketching: the HLL register table as a
native streaming aggregation.

The batch sketch (``operators/sketches.hll_registers``) is
``select(bucket, rank) → groupBy.max`` — and ``max`` is a supported
Structured Streaming aggregate, so the streaming twin is the SAME
operator applied to a streaming DataFrame in *update* mode: Spark's
state store holds one max-rank per (group, bucket) — bounded at
``m`` rows per group forever, no watermark needed — and each
micro-batch emits only the registers it changed. That the identical
code path serves batch and streaming is the point of the mergeable
sketch design (max is commutative/idempotent), not an accident.

Reading the estimate: registers land in a sink table; run
``operators/sketches.hll_estimate`` over it whenever a current
distinct-count is wanted. The estimate is NOT computed in-stream —
chaining a second aggregation after a streaming agg needs
complete-mode gymnastics for no benefit when the register table is
tiny and queryable at rest.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from ig_etl_sync_spark.operators.sketches import hll_registers


def streaming_hll_registers(
    stream: DataFrame,
    value_col: str,
    m: int = 64,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Cross-batch HLL register maintenance over a streaming frame.

    Write with ``outputMode("update")``; state is exactly the register
    table (≤ m rows per group). Identical register values to running
    the batch sketch over everything the stream has ever delivered —
    asserted by the mergeability test.
    """
    if not stream.isStreaming:
        raise ValueError("streaming_hll_registers needs a streaming DataFrame")
    return hll_registers(stream, value_col, m=m, group_cols=group_cols)


def streaming_cms_sketch(
    stream: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Cross-batch count-min counter maintenance (update mode).

    Counters are a streaming ``count`` aggregate — additive, so unlike
    the idempotent HLL max this depends on the source's exactly-once
    replay (checkpointed offsets): a re-delivered row would double-count.
    State is bounded at d·w counter rows regardless of stream volume.
    Query the sink table with ``operators/sketches.cms_lookup``.
    """
    from ig_etl_sync_spark.operators.sketches import cms_sketch

    if not stream.isStreaming:
        raise ValueError("streaming_cms_sketch needs a streaming DataFrame")
    return cms_sketch(stream, value_col, depth=depth, width=width)
