"""Time a subset of headline queries with the bench methodology.

Usage: python scripts/time_queries.py [-r REPS] query [query ...]

Same warmup discipline as bench.py (worker-pool prefork + one sf0.001 pass
per named query), then min-of-REPS (default 3) noop-sink wall seconds at
$SPARK_GRAFT_SF_DIR. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-r":
        reps = int(args[1])
        args = args[2:]
    names = args

    from __spark_entry__ import queries

    from colnade_spark.session import get_spark

    spark = get_spark("colnade-spark-timequeries")
    qs = queries()

    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    from pyspark.sql import functions as F

    _noop = F.pandas_udf(lambda s: s, "long")
    spark.range(0, 100_000, 1, 64).select(_noop("id")).write.format("noop").mode(
        "overwrite"
    ).save()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in names:
            try:
                qs[name](spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:
                pass

    per_query: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        best = None
        for _ in range(max(1, reps)):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        per_query[name] = round(best, 3)

    print(json.dumps({"queries": per_query, "sf_dir": SF_DIR, "reps": reps}))


if __name__ == "__main__":
    main()
