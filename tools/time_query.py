"""Targeted same-session timing for declared contract queries.

Usage: python tools/time_query.py <query> [<query> ...] [--reps N] [--sf DIR]

Times each named query with the noop sink (guide §1.4) in ONE warm
session, interleaving queries across reps (A/B/A/B, not A/A/B/B) so
host weather hits both sides equally — the CLAUDE.md rule for
accepting/rejecting an optimization. Prints per-rep walls plus min and
median. A first untimed warmup rep per query absorbs JIT/codegen.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ig_etl_sync_spark.contract import QUERIES  # noqa: E402
from ig_etl_sync_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(app_name="time_query")
    spark.sparkContext.setLogLevel("ERROR")

    samples: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(reps + 1):  # rep 0 = warmup, untimed in stats
        for name in names:
            fn = QUERIES[name][0]
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            spark.sparkContext.setJobDescription(None)
            if rep > 0:
                samples[name].append(dt)
            print(f"  rep{rep} {name:<36s} {dt:7.2f}s", flush=True)
    print()
    for name in names:
        s = samples[name]
        print(
            f"{name:<38s} min {min(s):7.2f}s  median "
            f"{statistics.median(s):7.2f}s  n={len(s)}"
        )


if __name__ == "__main__":
    main()
