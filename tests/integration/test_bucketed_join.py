"""Bucketed tables: co-bucketed fact⋈fact joins must plan with ZERO shuffle
exchanges — the write-time pre-partitioning that makes 100 TB joins viable."""

from __future__ import annotations

import io as _io
from contextlib import redirect_stdout

import pytest

from colnade_spark import read_parquet, read_table, write_bucketed_table
from colnade_spark.dtypes import Float64, Int64, Utf8
from colnade_spark.schema import Column, Schema
from colnade_spark.tpch import Lineitem, Orders, table_path


class OrderRev(Schema):
    o_orderkey: Column[Int64]
    o_orderstatus: Column[Utf8]
    l_extendedprice: Column[Float64]


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    o = read_parquet(table_path(sf_dir, "orders"), Orders, spark=spark)
    li = read_parquet(table_path(sf_dir, "lineitem"), Lineitem, spark=spark)
    write_bucketed_table(o, "orders_b", bucket_by=[Orders.o_orderkey], num_buckets=8)
    write_bucketed_table(
        li, "lineitem_b", bucket_by=[Lineitem.l_orderkey], num_buckets=8
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_cobucketed_join_has_no_shuffle(spark, bucketed_tables):
    o_name, l_name = bucketed_tables
    o = read_table(o_name, Orders, spark=spark)
    li = read_table(l_name, Lineitem, spark=spark)
    # disable auto-broadcast so the test exercises the bucketed-join path,
    # not a broadcast (at real scale neither side broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = li.join(o, on=Lineitem.l_orderkey == Orders.o_orderkey)
        buf = _io.StringIO()
        with redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        for line in plan.splitlines():
            if "Exchange" in line and "Broadcast" not in line:
                raise AssertionError(f"shuffle in co-bucketed join: {line}\n{plan}")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_results_match_plain(spark, sf_dir, bucketed_tables):
    o_name, l_name = bucketed_tables
    o_b = read_table(o_name, Orders, spark=spark)
    li_b = read_table(l_name, Lineitem, spark=spark)
    got = (
        li_b.join(o_b, on=Lineitem.l_orderkey == Orders.o_orderkey)
        .cast_schema(OrderRev)
        .height
    )
    o = read_parquet(table_path(sf_dir, "orders"), Orders, spark=spark)
    li = read_parquet(table_path(sf_dir, "lineitem"), Lineitem, spark=spark)
    want = (
        li.join(o, on=Lineitem.l_orderkey == Orders.o_orderkey)
        .cast_schema(OrderRev)
        .height
    )
    assert got == want
