"""Stable A/B metrics for named headline queries: total executor run
time, executor CPU time, shuffle bytes and input bytes per query, summed
over the stages of one measured noop pass (after the usual warmups).

Wall seconds at sf0.1 on an idle 32-core host swing by double-digit
percent run to run (VERDICT r9: median 15%, p90 71% single-shot); the
aggregate executor metrics are far tighter AND are the quantity that
matters on a saturated cluster, where wall ≈ total-work / cores. Use
this next to time_queries.py when a change's wall delta is inside the
noise band.

Usage: python scripts/ab_metrics.py query [query ...]
Prints one JSON line: {query: {wall, exec_run_s, exec_cpu_s, shuf_r_mb,
shuf_w_mb, input_mb, tasks}}.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    from __spark_entry__ import queries

    from colnade_spark.session import get_spark

    spark = get_spark("colnade-ab-metrics")
    qs = queries()

    from pyspark.sql import functions as F

    _noop = F.pandas_udf(lambda s: s, "long")
    spark.range(0, 100_000, 1, 64).select(_noop("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def get(path):
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/{path}"
        ) as r:
            return json.load(r)

    out = {}
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        fn = qs[name]
        if os.path.isdir(warm_dir):
            fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

        stages_before = {s["stageId"] for s in get("stages")}
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        agg = dict(run=0, cpu=0, sr=0, sw=0, inp=0, tasks=0)
        for st in get("stages"):
            if st["stageId"] in stages_before or st.get("status") == "SKIPPED":
                continue
            agg["run"] += st.get("executorRunTime", 0)
            agg["cpu"] += st.get("executorCpuTime", 0)
            agg["sr"] += st.get("shuffleReadBytes", 0)
            agg["sw"] += st.get("shuffleWriteBytes", 0)
            agg["inp"] += st.get("inputBytes", 0)
            agg["tasks"] += st.get("numCompleteTasks", 0)
        out[name] = {
            "wall": round(wall, 3),
            "exec_run_s": round(agg["run"] / 1000, 2),
            "exec_cpu_s": round(agg["cpu"] / 1e9, 2),
            "shuf_w_mb": round(agg["sw"] / 1e6, 2),
            "input_mb": round(agg["inp"] / 1e6, 2),
            "tasks": agg["tasks"],
        }
    print(json.dumps({"queries": out, "sf_dir": SF_DIR}))


if __name__ == "__main__":
    main()
