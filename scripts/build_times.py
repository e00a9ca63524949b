"""Measure per-query DataFrame CONSTRUCTION time (driver-side plan build:
py4j traffic + any driver fits), no job execution.

Usage: python scripts/build_times.py [query ...]   (default: all)

Construction cost is inside the bench's timed region (bench.py times
``fn(spark, SF_DIR).write...save()``), so seconds spent building literal
trees or running driver-side fits count against every rep. Prints one JSON
line sorted by descending build seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]

    from __spark_entry__ import queries

    from colnade_spark.session import get_spark

    spark = get_spark("colnade-spark-buildtimes")
    qs = queries()
    if not names:
        names = list(qs)

    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    out: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        qs[name](spark, SF_DIR)
        out[name] = round(time.time() - t0, 3)

    ranked = dict(sorted(out.items(), key=lambda kv: -kv[1]))
    print(json.dumps({"build_sec": ranked, "sf_dir": SF_DIR}))


if __name__ == "__main__":
    main()
