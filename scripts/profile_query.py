"""Profile one headline query: per-job and per-stage wall times via the
Spark status REST API (the UI's data), after a warm pass.

Usage: python scripts/profile_query.py <query> [reps]

Runs the query once at sf0.001 and once at $SPARK_GRAFT_SF_DIR to warm
codegen/workers, then a measured pass; prints every job/stage the measured
pass submitted with durations, shuffle bytes and task counts.
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
    name = sys.argv[1]
    from __spark_entry__ import queries

    from colnade_spark.session import get_spark

    spark = get_spark("colnade-profile")
    qs = queries()
    fn = qs[name]

    from pyspark.sql import functions as F

    _noop = F.pandas_udf(lambda s: s, "long")
    spark.range(0, 100_000, 1, 64).select(_noop("id")).write.format("noop").mode(
        "overwrite"
    ).save()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
    # warm pass at measured scale too (parquet footers, broadcast relations)
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def get(path):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/{path}") as r:
            return json.load(r)

    jobs_before = {j["jobId"] for j in get("jobs")}

    t0 = time.time()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0

    jobs = [j for j in get("jobs") if j["jobId"] not in jobs_before]
    jobs.sort(key=lambda j: j["jobId"])
    print(f"query={name} wall={wall:.3f}s jobs={len(jobs)}")
    total_job = 0.0
    for j in jobs:
        sub = j.get("submissionTime", "")
        comp = j.get("completionTime", "")
        # parse ISO-ish "2026-08-17T10:00:00.000GMT"
        def ts(s):
            from datetime import datetime

            return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

        dur = ts(comp) - ts(sub) if sub and comp else float("nan")
        total_job += dur if dur == dur else 0.0
        print(
            f"  job {j['jobId']:4d}  {dur:7.3f}s  stages={len(j.get('stageIds', []))}"
            f"  tasks={j.get('numTasks', 0):4d}  {j.get('description', '')[:90]}"
        )
        for sid in sorted(j.get("stageIds", [])):
            try:
                sts = get(f"stages/{sid}")
            except Exception:
                continue
            for st in sts:
                if st.get("status") == "SKIPPED":
                    continue
                ms = st.get("executorRunTime", 0)
                print(
                    f"    stage {sid:4d} [{st.get('status','?'):9s}] "
                    f"tasks={st.get('numCompleteTasks',0):4d} "
                    f"execRun={ms/1000:7.2f}s "
                    f"shufR={st.get('shuffleReadBytes',0)>>10}KB "
                    f"shufW={st.get('shuffleWriteBytes',0)>>10}KB "
                    f"in={st.get('inputBytes',0)>>10}KB  {st.get('name','')[:60]}"
                )
    print(f"sum(job durations)={total_job:.3f}s (gaps to wall = driver-side work)")


if __name__ == "__main__":
    main()
