"""End-to-end CDC sync demo: the reference's whole lifecycle (fetch →
transform → reconcile → graph sink → convergence check) on an
in-memory document. Run: python examples/sync_demo.py

Mirrors the reference flow (main.go:121-296) with the engine's Spark
stores; see plans/pipeline.py for the integration spec format.
"""

from __future__ import annotations

import copy
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ig_etl_sync_spark.operators.graph import GraphStore
from ig_etl_sync_spark.operators.reconcile import SnapshotStore
from ig_etl_sync_spark.plans.pipeline import (
    PipelineRunner,
    packer_registry_integration,
)
from ig_etl_sync_spark.session import get_spark
from ig_etl_sync_spark.sources.json_source import read_json_document
from tests.conftest import SOURCE_DOC


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4,
                      app_name="sync-demo")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="sync-demo-")
    runner = PipelineRunner(
        spark,
        SnapshotStore(spark, os.path.join(root, "snapshots")),
        GraphStore(spark, os.path.join(root, "graph")),
    )

    def integ(doc):
        return packer_registry_integration(lambda s: read_json_document(s, doc))

    print("== initial sync")
    r1 = runner.run(integ(SOURCE_DOC))
    for k, v in sorted(r1.created.items()):
        print(f"  created {k}: {v}")
    print("  orphan edges:", runner.graph.orphan_edge_count())

    print("== identical re-sync (must be a node-level no-op)")
    r2 = runner.run(integ(SOURCE_DOC))
    print("  node creates:", {k: v for k, v in r2.created.items()
                              if k.startswith("CREATE_NODE")})

    print("== bump one updated-at (must create exactly 1)")
    doc3 = copy.deepcopy(SOURCE_DOC)
    doc3["buckets"][0]["updated-at"] = "2030-01-01T00:00:00Z"
    r3 = runner.run(integ(doc3))
    print("  node creates:", {k: v for k, v in r3.created.items()
                              if k.startswith("CREATE_NODE") and v})


if __name__ == "__main__":
    main()
