"""Physical-plan audit over every contract query: count the operators
that matter at 100 TB (exchanges = shuffles, broadcast joins, sort
nodes, whole-stage-codegen spans, nested-loop joins, pushed filters)
WITHOUT executing anything — plans are built at the given SF dir and
string-scanned.

Usage: python tools/plan_audit.py [sf_dir] [--write-md]

``--write-md`` refreshes PLANS.md (the per-query table the docs link).
A true ``CartesianProduct`` anywhere is a hard error (exit 1); the
pytest twin (tests/test_plans.py::test_no_cartesian_in_any_contract_query)
enforces the same bound in CI. BroadcastNestedLoopJoin is reported but
allowed — every occurrence here is a crossJoin against a broadcast
one-row aggregate (global totals, codebooks), which is the documented
scalar-join idiom, not an O(n²) plan.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ig_etl_sync_spark.contract import QUERIES  # noqa: E402
from ig_etl_sync_spark.session import get_spark  # noqa: E402

COUNTERS = {
    "exchanges": r"Exchange hashpartitioning|Exchange rangepartitioning|Exchange RoundRobinPartitioning",
    "broadcasts": r"BroadcastExchange",
    "bnlj": r"BroadcastNestedLoopJoin",
    "cartesian": r"CartesianProduct",
    "sorts": r"(?<!Take)(?<!Ordered)Sort ",
}


def audit_plan(plan: str) -> dict[str, int]:
    # NOTE: no codegen-span column — under AQE the pre-execution plan
    # string carries no `*(n)` annotations, so it would read 0
    # everywhere and mislead.
    return {k: len(re.findall(rx, plan)) for k, rx in COUNTERS.items()}


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    write_md = "--write-md" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.001"

    spark = get_spark(master="local[4]", shuffle_partitions=4,
                      app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    hard_fail = []
    for name, (fn, _sql) in QUERIES.items():
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        c = audit_plan(plan)
        rows.append((name, c))
        if c["cartesian"]:
            hard_fail.append(name)

    rows.sort(key=lambda r: (-r[1]["exchanges"], r[0]))
    header = f"{'query':34s} {'xchg':>4} {'bcast':>5} {'bnlj':>4} {'sort':>4}"
    print(header)
    for name, c in rows:
        print(
            f"{name:34s} {c['exchanges']:4d} {c['broadcasts']:5d} "
            f"{c['bnlj']:4d} {c['sorts']:4d}"
        )

    if write_md:
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "PLANS.md"), "w") as f:
            f.write(
                "# Physical-plan audit (static, pre-execution, "
                f"{len(rows)} contract queries)\n\n"
                "Counts from `executedPlan` strings at sf0.001 — what each\n"
                "query costs in shuffles before AQE refines it. Regenerate:\n"
                "`python tools/plan_audit.py --write-md`.\n\n"
                "`bnlj` occurrences are crossJoins against broadcast one-row\n"
                "aggregates (global totals / codebooks) — the scalar-join\n"
                "idiom, not O(n²) plans. `CartesianProduct` is FORBIDDEN\n"
                "(tested).\n\n"
                "| query | exchanges | broadcasts | bnlj | sorts |\n"
                "|---|---|---|---|---|\n"
            )
            for name, c in rows:
                f.write(
                    f"| {name} | {c['exchanges']} | {c['broadcasts']} | "
                    f"{c['bnlj']} | {c['sorts']} |\n"
                )

    if hard_fail:
        print(f"\nCARTESIAN PRODUCT in: {hard_fail}", file=sys.stderr)
        return 1
    print(f"\n{len(rows)} plans audited, no CartesianProduct anywhere")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
