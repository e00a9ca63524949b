"""events.parquet carries TIMESTAMP(NANOS) — no Spark type. The scan
normalization (io._normalize_scan) must surface it as a microsecond
timestamp, in integer space (double math loses precision at 1e18 ns)."""

from __future__ import annotations

import datetime

from pyspark.sql import types as T

from colnade_spark import read_parquet
from colnade_spark.tpch import Events, table_path


def test_events_ts_reads_as_timestamp(spark, sf_dir):
    e = read_parquet(table_path(sf_dir, "events"), Events, spark=spark)
    field = dict((f.name, f.dataType) for f in e.native.schema.fields)["ts"]
    assert isinstance(field, (T.TimestampType, T.TimestampNTZType)), field
    row = e.native.selectExpr("min(ts) AS lo", "max(ts) AS hi").first()
    assert row.lo.year == 2024 and row.hi.year == 2024


def test_events_micros_precision_not_truncated(spark, sf_dir):
    """The microsecond component must survive (div 1000 in long space)."""
    e = read_parquet(table_path(sf_dir, "events"), Events, spark=spark)
    rows = e.native.select("ts").limit(50).collect()
    assert any(r.ts.microsecond != 0 for r in rows)
    assert all(isinstance(r.ts, datetime.datetime) for r in rows)
