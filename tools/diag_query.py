"""One instrumented run of any registry query at a given sf_dir: wall
clock + executed (AQE-final) plan + top stages by executor time from the
REST API.

Usage: python tools/diag_query.py <name> [sf_dir] [--plan-out PATH]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_table_providers_spark.core.memo import clear_memo_caches  # noqa: E402
from datafusion_table_providers_spark.session import get_spark  # noqa: E402
from datafusion_table_providers_spark.suite import FULL_SUITE  # noqa: E402


def main():
    args = list(sys.argv[1:])
    plan_out = None
    if "--plan-out" in args:
        i = args.index("--plan-out")
        plan_out = args[i + 1]
        del args[i : i + 2]
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/repo/.sf1"
    spark = get_spark("diag_query")
    spark.sparkContext.setLogLevel("ERROR")
    clear_memo_caches()
    df = FULL_SUITE[name].fn(spark, sf_dir)
    t0 = time.time()
    n = df.count()
    print(f"{name}: {time.time()-t0:.2f}s ({n} rows)", flush=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    if plan_out:
        with open(plan_out, "w") as f:
            f.write(plan)
    print(f"plan lines: {len(plan.splitlines())}")
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete")
    )
    stages.sort(key=lambda s: -(s.get("executorRunTime", 0)))
    for s in stages[:14]:
        print(
            f"stage {s['stageId']}: run {s['executorRunTime']/1000:.1f}s cpu "
            f"{s.get('executorCpuTime',0)/1e9:.1f}s tasks {s['numCompleteTasks']} "
            f"in {s.get('inputRecords',0):,} sh-r {s.get('shuffleReadRecords',0):,} "
            f"sh-w {s.get('shuffleWriteRecords',0):,} | {s.get('name','')[:70]}"
        )
    for s in stages[:4]:
        try:
            q = json.load(
                urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{app}/stages/{s['stageId']}/"
                    f"{s['attemptId']}/taskSummary?quantiles=0,0.5,0.95,1.0"
                )
            )
            dur = [x / 1000 for x in q["executorRunTime"]]
            gc = [x / 1000 for x in q["jvmGcTime"]]
            outr = q.get("shuffleWriteRecords") or q.get("outputRecords") or []
            print(
                f"stage {s['stageId']} task run min/med/p95/max = "
                f"{'/'.join(f'{d:.1f}' for d in dur)}s gc {'/'.join(f'{d:.1f}' for d in gc)}s "
                f"sh-w-rec {'/'.join(f'{x:,.0f}' for x in outr)}"
            )
        except Exception as e:  # noqa: BLE001
            print(f"stage {s['stageId']} taskSummary failed: {e}")


if __name__ == "__main__":
    main()
