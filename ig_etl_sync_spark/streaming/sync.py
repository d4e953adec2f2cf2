"""Streaming sync: the reference's poll → diff → write loop as
Structured Streaming (SURVEY §2.6 C3 → §2.9 X7).

The reference re-runs the whole batch pipeline per tick
(``main.go:281-296``). The idiomatic Spark scale-up is a streaming
source + ``foreachBatch``: each micro-batch is a "tick" whose payload is
diffed against the durable snapshot and written through the same
graph-sink path — identical semantics, but incremental, checkpointed,
and restartable. Batch and streaming share ONE code path (the batch
``PipelineRunner`` logic), which is the point: no second implementation
to drift.

At scale: the source is Kafka/files; state (snapshot table) is the same
key-partitioned table the batch engine uses, so a streaming sync and a
backfill batch sync can interleave safely (version-pinned reads, atomic
commits).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ig_etl_sync_spark.operators.graph import GraphStore
from ig_etl_sync_spark.operators.reconcile import Reconciler


def streaming_sync(
    source: DataFrame,
    reconciler: Reconciler,
    graph: GraphStore,
    integration_key: str,
    function_key: str,
    label: str,
    checkpoint_dir: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    trigger_once: bool = False,
    mode: str = "upsert",
) -> StreamingQuery:
    """Run the diff+upsert sync per micro-batch of ``source`` (a
    streaming DataFrame).

    ``mode="full_state"``: each batch IS the full source state
    (reference semantics — one doc per tick): missing keys are deleted.
    ``mode="upsert"`` (default): each batch is a delta (the natural
    shape of append-only sources like files/Kafka): keys absent from a
    batch are untouched, and the snapshot is MERGED, not replaced.
    """
    if mode not in ("upsert", "full_state"):
        raise ValueError(f"unknown mode {mode!r}")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # A SPURIOUS empty micro-batch (no source data this tick) must
        # be a no-op: in full_state mode it would otherwise read as
        # "the source is now empty" and wipe everything. A non-empty
        # batch whose TRANSFORM yields zero records is different — that
        # IS the legitimate delete-all path (reference main.go:289-292).
        if batch_df.isEmpty():
            return
        records = (transform(batch_df) if transform else batch_df).cache()
        try:
            diff = reconciler.reconcile(integration_key, function_key, records)
            to_create = diff.to_create.cache()
            to_delete = (
                diff.to_delete.cache() if mode == "full_state" else None
            )
            try:
                n_create = to_create.limit(1).count()
                n_delete = to_delete.limit(1).count() if to_delete is not None else 0
                graph.write_nodes(
                    label,
                    to_create=to_create if n_create else None,
                    to_delete=to_delete if n_delete else None,
                )
                if mode == "full_state":
                    reconciler.commit(integration_key, function_key, records)
                else:
                    reconciler.commit_merge(integration_key, function_key, records)
            finally:
                to_create.unpersist()
                if to_delete is not None:
                    to_delete.unpersist()
        finally:
            records.unpersist()

    writer = (
        source.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
