"""Structured-Streaming demo: the engine's stateful operators on a
file-backed micro-batch stream — cross-batch dedup, running counts,
transition pairs, and the unbounded fixed-point EWMA.
Run: python examples/streaming_demo.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ig_etl_sync_spark.session import get_spark
from ig_etl_sync_spark.streaming.stateful import (
    streaming_ewma,
    streaming_first_seen,
    streaming_transitions,
)

SCHEMA = "user_id long, ts timestamp, event_id long, event_type string, value double"


def tick(src: str, i: int, rows: list[dict]) -> None:
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, f"t{i}.json"), "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in rows)


def drain(spark, src, ckpt, out, op, mode):
    stream = spark.readStream.schema(SCHEMA).json(src)
    q = (
        op(stream)
        .writeStream.foreachBatch(
            lambda df, _id: df.write.mode("append").json(out)
        )
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4,
                      app_name="streaming-demo")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="streaming-demo-")
    src = os.path.join(base, "src")

    b0 = [
        {"user_id": 1, "ts": "2024-01-01 00:00:00", "event_id": 1,
         "event_type": "view", "value": 10.0},
        {"user_id": 1, "ts": "2024-01-01 00:01:00", "event_id": 2,
         "event_type": "click", "value": 20.5},
        {"user_id": 2, "ts": "2024-01-01 00:00:30", "event_id": 3,
         "event_type": "view", "value": 5.0},
    ]
    b1 = [
        {"user_id": 1, "ts": "2024-01-01 00:02:00", "event_id": 4,
         "event_type": "purchase", "value": 99.0},
        {"user_id": 2, "ts": "2024-01-01 00:01:30", "event_id": 5,
         "event_type": "click", "value": 7.5},
    ]

    for name, op, mode, out_schema in [
        ("first_seen", lambda s: streaming_first_seen(s, "user_id"),
         "append", SCHEMA),
        ("transitions", streaming_transitions, "append",
         "user_id long, src_type string, dst_type string"),
        ("ewma", streaming_ewma, "append",
         "user_id long, event_id long, ewma double"),
    ]:
        ckpt = os.path.join(base, f"ckpt_{name}")
        out = os.path.join(base, f"out_{name}")
        tick(src + name, 0, b0)
        drain(spark, src + name, ckpt, out, op, mode)
        tick(src + name, 1, b1)  # state carries across this boundary
        drain(spark, src + name, ckpt, out, op, mode)
        print(f"-- {name} --")
        spark.read.schema(out_schema).json(out).orderBy(
            out_schema.split(",")[0].split()[0]
        ).show(10, truncate=False)


if __name__ == "__main__":
    main()
