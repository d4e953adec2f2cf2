"""Dump ``explain("formatted")`` for named contract queries to files.

Usage: python tools/dump_plan.py <out_dir> <suffix> <query> [<query>...]
       python tools/dump_plan.py plans/r08 before span_coverage_chark

Writes ``<out_dir>/<query>_<suffix>.txt`` with the pre-execution
formatted physical plan at sf0.001 (plan SHAPE is SF-independent:
exchanges, join strategies, pushed filters; only AQE's runtime
coalescing differs). These are the judge-facing evidence files for
optimization rounds.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ig_etl_sync_spark.contract import QUERIES  # noqa: E402
from ig_etl_sync_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(master="local[4]", shuffle_partitions=4,
                      app_name="dump-plan")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name][0](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")


if __name__ == "__main__":
    main()
