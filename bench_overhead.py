"""Typed-surface overhead vs hand-written PySpark — the Spark analog of the
reference's headline artifact (/root/reference/benchmarks/bench_overhead.py:
77-120, typed layer vs raw engine on identical pipelines).

Three layers of evidence, strongest first:

1. PLAN IDENTITY — for each representative pipeline, the typed build and the
   hand-written ``pyspark.sql`` build must produce the SAME optimized
   logical plan (modulo auto-generated expression ids). If the plans are
   identical, cluster-side cost is identical BY CONSTRUCTION: the typed
   layer can add only driver-side microseconds. (Also enforced in CI by
   tests/integration/test_overhead_parity.py.)
2. DRIVER-SIDE BUILD OVERHEAD — µs to construct each pipeline (lazy, no
   action) typed vs raw: the actual price of the AST + translation layer.
3. END-TO-END — build + collect wall time typed vs raw on real parquet.
   With identical plans this difference is sampling noise; it is reported
   to make that claim falsifiable rather than argued.

Prints one JSON line:
  {"metric": "typed_overhead", "plan_identity": {...}, "build_us": {...},
   "e2e_sec": {...}, "sf": ...}

Run: python bench_overhead.py   (env SPARK_GRAFT_SF_DIR to change data dir)
"""

from __future__ import annotations

import json
import os
import re
import timeit

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

import colnade_spark as cs
from colnade_spark.dtypes import Float64, Int64, Utf8
from colnade_spark.schema import Column, Schema
from colnade_spark.session import get_spark
from colnade_spark.tpch import Customer, Lineitem, Orders, table_path


class CustOrder(Schema):
    """Flat join-result schema for the join_agg pipeline."""

    c_custkey: Column[Int64]
    c_mktsegment: Column[Utf8]
    o_totalprice: Column[Float64]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _norm_plan(df: SparkDF) -> str:
    """Optimized logical plan with auto-generated expression ids and plan
    ids masked — the invariant part that determines cluster-side cost."""
    s = df._jdf.queryExecution().optimizedPlan().toString()
    s = re.sub(r"#\d+L?", "#x", s)
    s = re.sub(r"plan_id=\d+", "plan_id=x", s)
    return s


# ---------------------------------------------------------------------------
# Pipelines: (name, typed builder, raw builder) — each pair must express the
# SAME query. Raw twins spell out the typed layer's semantics explicitly
# (nulls-last sorts, aliased aggregates, declared-column projection).
# ---------------------------------------------------------------------------


def pipelines(spark):
    cust_t = cs.scan_parquet(table_path(SF_DIR, "customer"), Customer, spark=spark)
    ord_t = cs.scan_parquet(table_path(SF_DIR, "orders"), Orders, spark=spark)
    li_t = cs.scan_parquet(table_path(SF_DIR, "lineitem"), Lineitem, spark=spark)

    cust_r = spark.read.parquet(table_path(SF_DIR, "customer")).select(
        *Customer._columns
    )
    ord_r = spark.read.parquet(table_path(SF_DIR, "orders")).select(
        *Orders._columns
    )
    li_r = spark.read.parquet(table_path(SF_DIR, "lineitem")).select(
        *Lineitem._columns
    )

    def t_filter_sort_select() -> SparkDF:
        return (
            cust_t.filter(Customer.c_acctbal > 1000.0)
            .sort(Customer.c_acctbal.desc())
            .select(Customer.c_name, Customer.c_acctbal)
            .native
        )

    def r_filter_sort_select() -> SparkDF:
        return (
            cust_r.filter(F.col("c_acctbal") > 1000.0)
            .orderBy(F.col("c_acctbal").desc_nulls_last())
            .select("c_name", "c_acctbal")
        )

    def t_group_agg() -> SparkDF:
        return (
            li_t.group_by(Lineitem.l_returnflag, Lineitem.l_linestatus)
            .agg(
                Lineitem.l_quantity.sum().alias("sum_qty"),
                Lineitem.l_extendedprice.mean().alias("avg_price"),
                Lineitem.l_orderkey.count().alias("n"),
            )
            .native
        )

    def r_group_agg() -> SparkDF:
        return li_r.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.count("l_orderkey").alias("n"),
        )

    def t_join_agg() -> SparkDF:
        return (
            cust_t.join(ord_t, on=Customer.c_custkey == Orders.o_custkey)
            .cast_schema(CustOrder)
            .group_by(CustOrder.c_mktsegment)
            .agg(CustOrder.o_totalprice.sum().alias("revenue"))
            .native
        )

    def r_join_agg() -> SparkDF:
        return (
            cust_r.join(ord_r, cust_r["c_custkey"] == ord_r["o_custkey"], "inner")
            .select("c_custkey", "c_mktsegment", "o_totalprice")
            .groupBy("c_mktsegment")
            .agg(F.sum("o_totalprice").alias("revenue"))
        )

    def t_exprs() -> SparkDF:
        return (
            ord_t.filter(Orders.o_orderstatus != "F")
            .with_columns(
                (Orders.o_totalprice * 1.1).alias("gross"),
                Orders.o_orderpriority.str_slice(0, 1).alias("pri"),
            )
            .native
        )

    def r_exprs() -> SparkDF:
        return ord_r.filter(F.col("o_orderstatus") != "F").withColumns(
            {
                "gross": F.col("o_totalprice") * 1.1,
                "pri": F.substring(F.col("o_orderpriority"), 1, 1),
            }
        )

    def t_window() -> SparkDF:
        return ord_t.with_columns(
            Orders.o_totalprice.sum().over(Orders.o_custkey).alias("cust_total")
        ).native

    def r_window() -> SparkDF:
        from pyspark.sql import Window

        return ord_r.withColumn(
            "cust_total",
            F.sum("o_totalprice").over(Window.partitionBy("o_custkey")),
        )

    return {
        "filter_sort_select": (t_filter_sort_select, r_filter_sort_select),
        "group_agg": (t_group_agg, r_group_agg),
        "join_agg": (t_join_agg, r_join_agg),
        "expr_pipeline": (t_exprs, r_exprs),
        "window": (t_window, r_window),
    }


def main() -> None:
    spark = get_spark()
    pipes = pipelines(spark)

    # 0. expression-construction micro (pure driver, no Spark involved)
    iters = 2000
    raw_us = timeit.timeit(lambda: F.col("c_acctbal") > 25, number=iters) / iters * 1e6
    typed_us = timeit.timeit(lambda: Customer.c_acctbal > 25, number=iters) / iters * 1e6
    expr_construction = {"raw_us": round(raw_us, 2), "typed_us": round(typed_us, 2)}

    plan_identity: dict[str, bool] = {}
    build_us: dict[str, dict[str, float]] = {}
    e2e_sec: dict[str, dict[str, float]] = {}

    for name, (typed, raw) in pipes.items():
        plan_identity[name] = _norm_plan(typed()) == _norm_plan(raw())

        n = 20
        b_typed = timeit.timeit(typed, number=n) / n * 1e6
        b_raw = timeit.timeit(raw, number=n) / n * 1e6
        build_us[name] = {
            "raw_us": round(b_raw, 1),
            "typed_us": round(b_typed, 1),
            "overhead_us": round(b_typed - b_raw, 1),
        }

        t_df, r_df = typed(), raw()
        t_df.collect(), r_df.collect()  # warm codegen/JIT for both plans
        t_sec = timeit.timeit(lambda: t_df.collect(), number=3) / 3
        r_sec = timeit.timeit(lambda: r_df.collect(), number=3) / 3
        e2e_sec[name] = {"raw_sec": round(r_sec, 3), "typed_sec": round(t_sec, 3)}

    total_overhead_us = round(sum(v["overhead_us"] for v in build_us.values()), 1)
    print(
        json.dumps(
            {
                "metric": "typed_overhead",
                "value": total_overhead_us,
                "unit": "us",
                "expr_construction": expr_construction,
                "plan_identity": plan_identity,
                "all_plans_identical": all(plan_identity.values()),
                "build_us": build_us,
                "e2e_sec": e2e_sec,
                "sf": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    main()
