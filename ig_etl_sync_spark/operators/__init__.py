from ig_etl_sync_spark.operators.reconcile import (
    Reconciler,
    SnapshotStore,
    reconcile,
    snapshot_of,
)
from ig_etl_sync_spark.operators.graph import GraphStore

__all__ = [
    "Reconciler",
    "SnapshotStore",
    "reconcile",
    "snapshot_of",
    "GraphStore",
]
