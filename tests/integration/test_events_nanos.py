"""TIMESTAMP(NANOS) parquet columns have no Spark type. The scan
normalization (io._normalize_scan) must surface them as microsecond
timestamps, in integer space (double math loses precision at 1e18 ns).

The driver's events.parquet has shipped both ways across rounds —
TIMESTAMP(NANOS) in round 1, timestamp[us] in round 2 — so these tests
synthesize a nanos file rather than assuming either shape, and only
assert engine-agnostic facts about the real events table."""

from __future__ import annotations

import datetime

from pyspark.sql import types as T

from colnade_spark import read_parquet
from colnade_spark.dtypes import Datetime, Int64
from colnade_spark.schema import Column, Schema
from colnade_spark.tpch import Events, table_path


class PlainTs(Schema):
    event_id: Column[Int64]
    ts: Column[Datetime]


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


def test_plain_int64_not_mistaken_for_nanos(spark, tmp_path):
    """Regression: a declared-Datetime column whose parquet type is PLAIN
    INT64 (not TIMESTAMP(NANOS)) must NOT be silently divided by 1000 — it
    stays Long and structural validation rejects it."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from colnade_spark.errors import SchemaError
    from colnade_spark.io import _nanos_columns

    p = str(tmp_path / "plain_int64.parquet")
    pq.write_table(
        pa.table({"event_id": pa.array([1, 2], pa.int64()),
                  "ts": pa.array([1_700_000_000_000_000, 1_700_000_000_000_001],
                                 pa.int64())}),
        p,
    )
    assert _nanos_columns(p) == set()

    # with validation off the column simply stays Long (no silent div 1000)
    raw = read_parquet(p, PlainTs, spark=spark)
    assert isinstance(raw.native.schema["ts"].dataType, T.LongType)
    assert raw.native.orderBy("event_id").first().ts == 1_700_000_000_000_000

    from colnade_spark.validation import get_validation, set_validation

    prev = get_validation()
    set_validation("structural")
    try:
        with pytest.raises(SchemaError):
            read_parquet(p, PlainTs, spark=spark)
    finally:
        set_validation(prev)


def test_nanos_metadata_detected_and_normalized(spark, tmp_path):
    """A synthesized TIMESTAMP(NANOS) file is detected by _nanos_columns and
    read back as a microsecond timestamp with sub-second precision intact."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from colnade_spark.io import _nanos_columns

    base_ns = 1_700_000_000_123_456_789  # ...123456789 ns → ...123456 µs
    p = str(tmp_path / "nanos.parquet")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array([base_ns, base_ns + 1_000], pa.timestamp("ns")),
            }
        ),
        p,
        store_schema=False,  # force readers to see the parquet logical type
    )
    cols = _nanos_columns(p)
    assert cols is not None and "ts" in cols

    e = read_parquet(p, PlainTs, spark=spark)
    field = dict((f.name, f.dataType) for f in e.native.schema.fields)["ts"]
    assert isinstance(field, (T.TimestampType, T.TimestampNTZType)), field
    assert e.native.orderBy("event_id").first().ts.microsecond == 123456


def test_stream_plain_int64_not_mistaken_for_nanos(spark, tmp_path):
    """Streaming twin of the batch regression: a streamed column whose
    parquet type is PLAIN INT64 (not TIMESTAMP(NANOS)) must round-trip
    unchanged — the stream reader's nanos conf/division is gated on parquet
    logical-type metadata exactly like batch io, not blanket-applied."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from colnade_spark.streaming import scan_stream_parquet

    d = tmp_path / "stream_plain"
    d.mkdir()
    vals = [1_700_000_000_000_000, 1_700_000_000_000_001]
    pq.write_table(
        pa.table({"event_id": pa.array([1, 2], pa.int64()),
                  "ts": pa.array(vals, pa.int64())}),
        str(d / "part-0.parquet"),
    )
    sf = scan_stream_parquet(str(d), PlainTs, spark=spark)
    # declared Datetime but metadata says plain INT64: stays Long, no div
    assert isinstance(sf.native.schema["ts"].dataType, T.LongType)
    q = (
        sf.native.writeStream.format("memory")
        .queryName("plain_int64_stream")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.event_id: r.ts for r in spark.table("plain_int64_stream").collect()}
    assert got == {1: vals[0], 2: vals[1]}  # bit-identical round-trip


def test_stream_nanos_metadata_normalized(spark, tmp_path):
    """A streamed TIMESTAMP(NANOS) file still converts to microsecond
    timestamps (the gate engages when metadata confirms nanos)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from colnade_spark.streaming import scan_stream_parquet

    d = tmp_path / "stream_nanos"
    d.mkdir()
    base_ns = 1_700_000_000_123_456_789
    pq.write_table(
        pa.table({"event_id": pa.array([1, 2], pa.int64()),
                  "ts": pa.array([base_ns, base_ns + 1_000],
                                 pa.timestamp("ns"))}),
        str(d / "part-0.parquet"),
        store_schema=False,
    )
    sf = scan_stream_parquet(str(d), PlainTs, spark=spark)
    assert isinstance(
        sf.native.schema["ts"].dataType, (T.TimestampType, T.TimestampNTZType)
    )
    q = (
        sf.native.writeStream.format("memory")
        .queryName("nanos_stream")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table("nanos_stream").orderBy("event_id").collect()
    assert rows[0].ts.microsecond == 123456
