"""Dump .explain("formatted") for every bench headline query.

Usage: python scripts/dump_plans.py <suffix> [query ...]

Writes plans/r10/<query>_<suffix>.txt for each query (default: all of
bench.HEADLINE). Plans are captured WITHOUT executing the query (initial
AQE plan), which is exactly what `df.explain("formatted")` prints.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])

    from bench import HEADLINE

    from __spark_entry__ import queries
    from colnade_spark.session import get_spark

    spark = get_spark("colnade-spark-plandump")
    qs = queries()
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANS_DIR", "r11"))
    os.makedirs(outdir, exist_ok=True)
    names = [n for n in HEADLINE if not only or n in only]
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR building plan: {type(e).__name__}: {e}\n"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(name, "ok" if not txt.startswith("ERROR") else "ERR", flush=True)


if __name__ == "__main__":
    main()
