"""Mergeable HLL sketch tables: the build-once / merge-anywhere contract.

The load-bearing property is LOSSLESS merge: estimate(union of per-day
sketches) == estimate(one sketch over all days) — exact equality, because
HLL register state is a function of the input SET only. If that breaks,
pre-aggregated sketch tables silently stop being trustworthy.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from colnade_spark.operators.sketches import (
    build_sketch_table,
    estimate,
    merge_sketch_table,
)
from colnade_spark.tpch import table_path


def _events(spark, sf_dir):
    return (
        spark.read.parquet(table_path(sf_dir, "events"))
        .withColumn("day", F.to_date("ts"))
    )


def test_merged_estimate_equals_direct_estimate(spark, sf_dir):
    ev = _events(spark, sf_dir)
    daily = build_sketch_table(ev, ["event_type", "day"], "user_id")
    per_type_merged = estimate(merge_sketch_table(daily, ["event_type"]))
    per_type_direct = estimate(build_sketch_table(ev, ["event_type"], "user_id"))
    m = {r.event_type: r.n_distinct_est for r in per_type_merged.collect()}
    d = {r.event_type: r.n_distinct_est for r in per_type_direct.collect()}
    assert m == d and len(m) >= 2


def test_global_rollup_and_accuracy(spark, sf_dir):
    ev = _events(spark, sf_dir)
    daily = build_sketch_table(ev, ["day"], "user_id")
    est = estimate(merge_sketch_table(daily, [])).first().n_distinct_est
    exact = ev.select("user_id").distinct().count()
    assert abs(est - exact) <= max(2, 0.05 * exact), (est, exact)


def test_sketch_table_parquet_round_trip(spark, sf_dir, tmp_path):
    """The persisted sketch table must survive parquet and merge to the
    same estimates — this is what makes it a TABLE, not a query artifact."""
    ev = _events(spark, sf_dir)
    daily = build_sketch_table(ev, ["event_type", "day"], "user_id")
    dest = str(tmp_path / "sketches")
    daily.write.parquet(dest)
    back = spark.read.parquet(dest)
    a = {
        r.event_type: r.n_distinct_est
        for r in estimate(merge_sketch_table(back, ["event_type"])).collect()
    }
    b = {
        r.event_type: r.n_distinct_est
        for r in estimate(merge_sketch_table(daily, ["event_type"])).collect()
    }
    assert a == b


def test_incremental_day_arrives(spark, sf_dir):
    """New day's sketch unions into the existing table without touching
    old raw data — the incremental maintenance story."""
    ev = _events(spark, sf_dir)
    days = sorted(r.day for r in ev.select("day").distinct().collect())
    head, tail = days[:-1], days[-1]
    old = build_sketch_table(ev.filter(F.col("day").isin(head)), ["day"], "user_id")
    new = build_sketch_table(ev.filter(F.col("day") == tail), ["day"], "user_id")
    merged = estimate(merge_sketch_table(old.unionByName(new), []))
    direct = estimate(build_sketch_table(ev, [], "user_id"))
    assert merged.first().n_distinct_est == direct.first().n_distinct_est


def test_streaming_sketch_maintenance_matches_batch(spark, sf_dir, tmp_path):
    """Stream the events backlog through maintain_sketch_table; merging
    the persisted per-batch sketches must estimate EXACTLY what one batch
    pass over all data estimates (lossless union), and a redelivered
    batch must not change the table (overwrite-by-batch_id)."""
    from colnade_spark.operators.sketches import maintain_sketch_table
    from colnade_spark.streaming import scan_stream_parquet
    from colnade_spark.tpch import Events

    dest = str(tmp_path / "sketch_table")
    ck = str(tmp_path / "ck")
    sf = scan_stream_parquet(table_path(sf_dir, "events"), Events, spark=spark)
    q = maintain_sketch_table(
        sf.native, ["event_type"], "user_id", dest, ck
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    back = spark.read.parquet(dest)
    streamed = {
        r.event_type: r.n_distinct_est
        for r in estimate(merge_sketch_table(back, ["event_type"])).collect()
    }
    ev = _events(spark, sf_dir)
    direct = {
        r.event_type: r.n_distinct_est
        for r in estimate(build_sketch_table(ev, ["event_type"], "user_id")).collect()
    }
    assert streamed == direct

    # redelivery: rewriting an existing batch partition with the same data
    # leaves the merged estimates unchanged
    import os

    parts = [p for p in os.listdir(dest) if p.startswith("batch_id=")]
    assert parts, "no batch partitions written"
    bid = parts[0].split("=", 1)[1]
    from colnade_spark.operators.sketches import build_sketch_table as _b

    _b(ev, ["event_type"], "user_id").write.mode("overwrite").parquet(
        f"{dest}/batch_id={bid}"
    )
    again = {
        r.event_type: r.n_distinct_est
        for r in estimate(
            merge_sketch_table(spark.read.parquet(dest), ["event_type"])
        ).collect()
    }
    assert again == direct
