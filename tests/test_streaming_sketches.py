"""Streaming HLL registers (streaming/sketches.py): cross-batch state
equals the batch sketch over the union of all batches."""

from __future__ import annotations

import json
import os

import pytest

from ig_etl_sync_spark.operators.sketches import hll_estimate, hll_registers
from ig_etl_sync_spark.streaming.sketches import streaming_hll_registers

SCHEMA = "user string"


def write_batch(src_dir: str, name: str, users: list[str]) -> None:
    with open(os.path.join(src_dir, name), "w") as f:
        for u in users:
            f.write(json.dumps({"user": u}) + "\n")


REGISTERS: dict = {}


def run_tick(spark, src_dir: str, checkpoint: str) -> None:
    stream = spark.readStream.schema(SCHEMA).json(src_dir)
    out = streaming_hll_registers(stream, "user", m=64)

    def sink(batch_df, batch_id):  # update mode: rows are changed registers
        for r in batch_df.collect():
            REGISTERS[r["_b"]] = r["_m"]

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_registers_equal_batch_sketch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    REGISTERS.clear()

    b1 = [f"u{i}" for i in range(0, 300)]
    b2 = [f"u{i}" for i in range(150, 500)]  # overlaps b1: idempotent max
    write_batch(str(src), "b1.json", b1)
    run_tick(spark, str(src), ckpt)
    write_batch(str(src), "b2.json", b2)
    run_tick(spark, str(src), ckpt)

    union = spark.createDataFrame([(u,) for u in sorted(set(b1) | set(b2))], ["user"])
    expect = {r["_b"]: r["_m"] for r in hll_registers(union, "user", m=64).collect()}
    assert REGISTERS == expect

    # estimate derived from the streamed registers matches batch estimate
    regs_df = spark.createDataFrame(
        [(b, m) for b, m in REGISTERS.items()], ["_b", "_m"]
    )
    [stream_est] = hll_estimate(regs_df, m=64).collect()
    [batch_est] = hll_estimate(hll_registers(union, "user", m=64), m=64).collect()
    assert stream_est.hll_est == pytest.approx(batch_est.hll_est, abs=1e-4)
    assert abs(stream_est.hll_est - 500) / 500 < 0.35


COUNTERS: dict = {}


def test_streaming_cms_accumulates_across_batches(spark, tmp_path):
    from ig_etl_sync_spark.operators.sketches import cms_sketch
    from ig_etl_sync_spark.streaming.sketches import streaming_cms_sketch

    src = tmp_path / "csrc"
    src.mkdir()
    ckpt = str(tmp_path / "cckpt")
    COUNTERS.clear()

    def tick():
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        out = streaming_cms_sketch(stream, "user", depth=4, width=64)
        q = (
            out.writeStream.foreachBatch(
                lambda b, _id: COUNTERS.update(
                    {(r["_d"], r["_b"]): r["c"] for r in b.collect()}
                )
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    b1 = [f"u{i % 30}" for i in range(300)]
    b2 = [f"u{i % 50}" for i in range(200)]
    write_batch(str(src), "c1.json", b1)
    tick()
    write_batch(str(src), "c2.json", b2)
    tick()

    union = spark.createDataFrame([(u,) for u in b1 + b2], ["user"])
    expect = {
        (r["_d"], r["_b"]): r["c"]
        for r in cms_sketch(union, "user", depth=4, width=64).collect()
    }
    assert COUNTERS == expect
