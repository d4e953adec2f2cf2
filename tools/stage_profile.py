"""Per-stage wall/task profile of a declared contract query.

Usage: python tools/stage_profile.py <query> [<query>...]

Runs each query once warm (noop sink) with the local UI enabled, then
dumps every stage of the SECOND run from the REST API: duration, task
count, and the first line of the stage's name — enough to map slow
stages back to operators and spot AQE-coalesced compute-heavy stages
(few tasks, long wall) without a browser.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ig_etl_sync_spark.contract import QUERIES  # noqa: E402
from ig_etl_sync_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="stage_profile",
        extra_confs={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4049/api/v1/applications/{app_id}"

    def stages() -> list[dict]:
        with urllib.request.urlopen(f"{base}/stages?status=complete") as r:
            return json.load(r)

    for name in names:
        fn = QUERIES[name][0]
        # warmup
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        seen = {s["stageId"] for s in stages()}
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.monotonic() - t0
        new = [s for s in stages() if s["stageId"] not in seen]
        new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        print(f"\n=== {name}: wall {wall:.2f}s, {len(new)} stages ===")
        total_run = sum(s.get("executorRunTime") or 0 for s in new)
        print(f"  sum executorRunTime {total_run/1000:.2f}s")
        for s in new[:14]:
            dur = (s.get("executorRunTime") or 0) / 1000
            sub = (s.get("submissionTime") or "")[11:23]
            nm = (s.get("name") or "").split("\n")[0][:70]
            print(
                f"  stage {s['stageId']:>5} tasks {s['numCompleteTasks']:>3} "
                f"run {dur:6.2f}s  submit {sub}  {nm}"
            )


if __name__ == "__main__":
    main()
