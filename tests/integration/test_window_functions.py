"""Ordered window functions (typed extension): row_number/rank/lag/lead."""

from __future__ import annotations

import pytest

from colnade_spark import lag, lead, rank, read_parquet, row_number
from colnade_spark.dataframe import DataFrame
from colnade_spark.dtypes import Float64, Int64, Utf8
from colnade_spark.errors import ColumnGuardError
from colnade_spark.schema import Column, Schema
from colnade_spark.tpch import Orders, table_path


class T(Schema):
    k: Column[Utf8]
    v: Column[Int64]


def _f(spark):
    return DataFrame.from_dict(
        {"k": ["a", "a", "a", "b", "b"], "v": [3, 1, 2, 10, 20]}, T
    )


def test_row_number_and_rank(spark):
    f = _f(spark).with_columns(
        row_number(partition_by=T.k, order_by=T.v).alias("rn"),
        rank(partition_by=T.k, order_by=T.v.desc()).alias("rk"),
    )
    got = {(r.k, r.v): (r.rn, r.rk) for r in f.native.collect()}
    assert got[("a", 1)] == (1, 3)
    assert got[("a", 3)] == (3, 1)
    assert got[("b", 20)] == (2, 1)


def test_lag_lead(spark):
    f = _f(spark).with_columns(
        lag(T.v, 1, partition_by=T.k, order_by=T.v).alias("prev"),
        lead(T.v, 1, partition_by=T.k, order_by=T.v).alias("nxt"),
    )
    got = {(r.k, r.v): (r.prev, r.nxt) for r in f.native.collect()}
    assert got[("a", 1)] == (None, 2)
    assert got[("a", 2)] == (1, 3)
    assert got[("b", 20)] == (10, None)


def test_window_requires_order_by(spark):
    with pytest.raises(ValueError):
        row_number(partition_by=T.k)


def test_window_cross_schema_guard(spark):
    f = _f(spark)
    with pytest.raises(ColumnGuardError):
        f.with_columns(
            row_number(partition_by=Orders.o_custkey, order_by=T.v).alias("rn")
        )


def test_keep_newest_per_key(spark, sf_dir):
    """The canonical training-pipeline use: newest order per customer."""
    o = read_parquet(table_path(sf_dir, "orders"), Orders, spark=spark)
    rn = row_number(
        partition_by=Orders.o_custkey,
        order_by=(Orders.o_orderdate.desc(), Orders.o_orderkey),
    )
    latest = o.with_columns(rn.alias("rn")).with_raw(
        lambda d: d.filter("rn = 1").drop("rn")
    )
    n_cust = o.native.select("o_custkey").distinct().count()
    assert latest.height == n_cust
