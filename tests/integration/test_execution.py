"""End-to-end execution of every frame operator against the driver testdata
(sf0.001), modeled on the reference's per-backend execution-parity tests
(reference: tests/integration/test_polars_execution.py)."""

from __future__ import annotations

import pytest

from colnade_spark import (
    DataFrame,
    concat,
    lit,
    read_parquet,
    scan_parquet,
    when,
)
from colnade_spark.dtypes import Datetime, Float64, Int32, Int64, Utf8
from colnade_spark.errors import ColumnGuardError, SchemaError
from colnade_spark.schema import Column, Schema, mapped_from
from colnade_spark.tpch import Customer, Lineitem, Nation, Orders, Region, table_path


@pytest.fixture(scope="module")
def customer(spark, sf_dir):
    return read_parquet(table_path(sf_dir, "customer"), Customer, spark=spark)


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return read_parquet(table_path(sf_dir, "orders"), Orders, spark=spark)


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return read_parquet(table_path(sf_dir, "lineitem"), Lineitem, spark=spark)


def test_read_height_width(customer):
    assert customer.height > 0
    assert customer.width == 5


def test_filter(customer):
    out = customer.filter(Customer.c_acctbal > 0)
    for row in out.rows():
        assert row.c_acctbal > 0


def test_filter_guard_rejects_foreign_columns(customer):
    with pytest.raises(ColumnGuardError) as ei:
        customer.filter(Orders.o_totalprice > 0)
    assert "o_totalprice" in ei.value.missing_columns


def test_sort_desc_and_limit(customer):
    out = customer.sort(Customer.c_acctbal.desc()).limit(10)
    vals = [r.c_acctbal for r in out.rows()]
    assert vals == sorted(vals, reverse=True)
    assert len(vals) == 10


def test_sort_multi_direction(customer):
    out = customer.sort(Customer.c_mktsegment.asc(), Customer.c_acctbal.desc()).limit(50)
    rows = out.rows()
    segs = [r.c_mktsegment for r in rows]
    assert segs == sorted(segs)


def test_unique(orders):
    out = orders.unique(Orders.o_orderstatus)
    statuses = [r.o_orderstatus for r in out.rows()]
    assert len(statuses) == len(set(statuses))


def test_unique_all_columns_when_no_subset(customer):
    assert customer.unique().height == customer.height


def test_drop_nulls_noop_on_non_null(customer):
    assert customer.drop_nulls(Customer.c_acctbal).height == customer.height


def test_with_columns(lineitem):
    out = lineitem.with_columns(
        (Lineitem.l_extendedprice * (1 - Lineitem.l_discount)).alias("disc_price"),
        (Lineitem.l_quantity > 25).alias("bulk"),
    )
    row = out.native.select("l_extendedprice", "l_discount", "disc_price", "bulk").first()
    assert row.disc_price == pytest.approx(row.l_extendedprice * (1 - row.l_discount))


def test_select_erases_schema_then_cast_schema(customer):
    class Slim(Schema):
        c_custkey: Column[Int64]
        c_acctbal: Column[Float64]

    erased = customer.select(Customer.c_custkey, Customer.c_acctbal)
    assert erased.schema is None
    bound = erased.cast_schema(Slim)
    assert bound.schema is Slim
    assert bound.width == 2


def test_group_by_agg(lineitem):
    class Agg(Schema):
        l_returnflag: Column[Utf8]
        sum_qty: Column[Float64]
        avg_price: Column[Float64]
        n: Column[Int64]

    out = (
        lineitem.group_by(Lineitem.l_returnflag)
        .agg(
            Lineitem.l_quantity.sum().alias("sum_qty"),
            Lineitem.l_extendedprice.mean().alias("avg_price"),
            Lineitem.l_orderkey.count().alias("n"),
        )
        .cast_schema(Agg)
    )
    rows = out.rows()
    assert len(rows) >= 2
    assert all(r.n > 0 for r in rows)


def test_ungrouped_agg(lineitem):
    out = lineitem.agg(
        Lineitem.l_quantity.sum().alias("total_qty"),
        Lineitem.l_orderkey.n_unique().alias("orders"),
    )
    assert out.native.count() == 1


def test_join_inner_and_cast_schema(customer, orders):
    class CustOrder(Schema):
        c_name: Column[Utf8]
        o_totalprice: Column[Float64]

    joined = customer.join(orders, on=Customer.c_custkey == Orders.o_custkey)
    out = joined.cast_schema(CustOrder)
    assert out.height > 0


def test_join_collision_rename_and_rowlevel_filter(spark):
    class A(Schema):
        id: Column[Int64]
        v: Column[Int64]

    class B(Schema):
        id: Column[Int64]
        v: Column[Int64]

    a = DataFrame.from_dict({"id": [1, 2, 3], "v": [10, 20, 30]}, A)
    b = DataFrame.from_dict({"id": [1, 2, 4], "v": [1, 2, 4]}, B)
    j = a.join(b, on=A.id == B.id, how="inner")
    # row-level filter on the RIGHT schema's colliding column name
    out = j.filter(B.v >= 2)
    assert out.native.count() == 1

    class Flat(Schema):
        id: Column[Int64] = mapped_from(A.id)
        left_v: Column[Int64] = mapped_from(A.v)
        right_v: Column[Int64] = mapped_from(B.v)

    flat = j.cast_schema(Flat)
    rows = {r.id: (r.left_v, r.right_v) for r in flat.rows()}
    assert rows[2] == (20, 2)


def test_join_ambiguous_cast_requires_mapping(spark):
    class A(Schema):
        id: Column[Int64]
        v: Column[Int64]

    class B(Schema):
        id: Column[Int64]
        v: Column[Int64]

    class Flat(Schema):
        v: Column[Int64]

    a = DataFrame.from_dict({"id": [1], "v": [10]}, A)
    b = DataFrame.from_dict({"id": [1], "v": [1]}, B)
    j = a.join(b, on=A.id == B.id)
    with pytest.raises(SchemaError, match="ambiguous"):
        j.cast_schema(Flat)


def test_join_left_and_outer(customer, orders):
    inner = customer.join(orders, on=Customer.c_custkey == Orders.o_custkey)
    left = customer.join(orders, on=Customer.c_custkey == Orders.o_custkey, how="left")
    outer = customer.join(orders, on=Customer.c_custkey == Orders.o_custkey, how="outer")
    ih, lh, oh = inner.height, left.height, outer.height
    assert lh >= ih
    assert oh >= lh


def test_cross_join(spark, sf_dir):
    region = read_parquet(table_path(sf_dir, "region"), Region, spark=spark)
    nation = read_parquet(table_path(sf_dir, "nation"), Nation, spark=spark)
    crossed = region.join(nation, how="cross")
    assert crossed.height == region.height * nation.height


def test_concat(customer):
    a = customer.filter(Customer.c_acctbal > 0)
    b = customer.filter(Customer.c_acctbal <= 0)
    both = concat([a, b])
    assert both.height == customer.height


def test_concat_rejects_different_schema(customer, orders):
    with pytest.raises(SchemaError):
        concat([customer, orders])


def test_when_then_otherwise(customer):
    out = customer.with_columns(
        when(Customer.c_acctbal > 5000)
        .then(lit("high"))
        .when(Customer.c_acctbal > 0)
        .then(lit("mid"))
        .otherwise(lit("low"))
        .alias("bucket")
    )
    buckets = {r["bucket"] for r in out.native.select("bucket").distinct().collect()}
    assert buckets <= {"high", "mid", "low"}


def test_str_functions(customer):
    out = customer.with_columns(
        Customer.c_name.str_to_uppercase().alias("upper"),
        Customer.c_name.str_len().alias("ln"),
        Customer.c_name.str_contains("1").alias("has1"),
        Customer.c_name.str_replace("Customer", "X").alias("rep"),
    )
    row = out.native.first()
    assert row.upper == row.c_name.upper()
    assert row.ln == len(row.c_name)


def test_math_functions(customer):
    import math

    out = customer.with_columns(
        Customer.c_acctbal.abs().alias("ab"),
        Customer.c_acctbal.round(1).alias("rd"),
        Customer.c_acctbal.floor().alias("fl"),
        Customer.c_acctbal.ceil().alias("ce"),
        Customer.c_acctbal.abs().sqrt().alias("sq"),
        Customer.c_acctbal.exp().alias("ex"),
        Customer.c_acctbal.pow(2).alias("p2"),
        Customer.c_acctbal.ln().alias("ln_"),
    )
    for r in out.native.limit(20).collect():
        assert r.ab == abs(r.c_acctbal)
        # Spark rounds half-up, Python half-even: allow one 0.1 tick
        assert abs(r.rd - round(r.c_acctbal, 1)) <= 0.1 + 1e-9
        assert r.fl == math.floor(r.c_acctbal)
        assert r.ce == math.ceil(r.c_acctbal)
        assert abs(r.sq - math.sqrt(abs(r.c_acctbal))) < 1e-9
        assert abs(r.p2 - r.c_acctbal**2) < 1e-6 * max(1.0, r.c_acctbal**2)
        if r.c_acctbal > 0:
            assert abs(r.ln_ - math.log(r.c_acctbal)) < 1e-9
        else:
            assert r.ln_ is None  # non-positive → null


def test_math_gate_rejects_string(customer):
    with pytest.raises(TypeError):
        Customer.c_name.abs()
    with pytest.raises(TypeError):
        Customer.c_name.sqrt()


def test_regex_functions(customer):
    out = customer.with_columns(
        Customer.c_name.str_extract(r"(\d+)$", 1).alias("num"),
        Customer.c_name.str_matches(r"\d{3}").alias("has3d"),
        Customer.c_name.str_split("#").alias("parts"),
        Customer.c_name.str_slice(0, 8).alias("head8"),
        Customer.c_name.str_extract(r"ZZZNOMATCHZZZ").alias("nomatch"),
    )
    import re as _re

    for r in out.native.limit(20).collect():
        m = _re.search(r"(\d+)$", r.c_name)
        assert r.num == (m.group(1) if m else None)
        assert r.has3d == bool(_re.search(r"\d{3}", r.c_name))
        assert r.parts == r.c_name.split("#")
        assert r.head8 == r.c_name[:8]
        assert r.nomatch is None  # '' from Spark normalized to NULL


class _SplitT(Schema):
    s: Column[Utf8]


def test_str_split_literal_not_regex(spark):
    """The delimiter is literal: '.' must not behave as regex any-char."""
    df = DataFrame.from_dict({"s": ["a.b.c", "abc"]}, _SplitT)
    out = df.with_columns(_SplitT.s.str_split(".").alias("parts"))
    rows = sorted((r.s, tuple(r.parts)) for r in out.native.collect())
    assert rows == [("a.b.c", ("a", "b", "c")), ("abc", ("abc",))]


def test_json_extract(spark):
    df = DataFrame.from_dict(
        {
            "s": [
                '{"k": 7, "tags": ["a", "b"]}',
                '{"other": 1}',
                "not json",
            ]
        },
        _SplitT,
    )
    out = df.with_columns(
        _SplitT.s.json_extract("$.k").alias("k"),
        _SplitT.s.json_extract("$.tags[0]").alias("t0"),
    )
    rows = [(r.k, r.t0) for r in out.native.collect()]
    assert sorted(rows, key=str) == sorted(
        [("7", "a"), (None, None), (None, None)], key=str
    )
    with pytest.raises(ValueError):
        _SplitT.s.json_extract("k")  # path must start with $


def test_is_in_membership(customer):
    out = customer.filter(Customer.c_mktsegment.is_in(["BUILDING", "MACHINERY"]))
    segs = {r.c_mktsegment for r in out.native.select("c_mktsegment").distinct().collect()}
    assert segs == {"BUILDING", "MACHINERY"}
    with pytest.raises(ValueError):
        Customer.c_mktsegment.is_in([])


def test_dt_functions(orders):
    out = orders.with_columns(
        Orders.o_orderdate.dt_year().alias("y"),
        Orders.o_orderdate.dt_month().alias("m"),
        Orders.o_orderdate.dt_truncate("month").alias("mstart"),
    )
    row = out.native.first()
    assert row.y == row.o_orderdate.year
    assert row.mstart.day == 1


def test_dt_add_and_diff(orders):
    out = orders.with_columns(
        Orders.o_orderdate.dt_add("day", 30).alias("due"),
        Orders.o_orderdate.dt_add("hour", -1).alias("before"),
        Orders.o_orderdate.dt_diff(
            "day", Orders.o_orderdate.dt_truncate("year")
        ).alias("yday"),
    )
    r = out.native.first()
    assert (r.due - r.o_orderdate).days == 30
    assert (r.o_orderdate - r.before).total_seconds() == 3600
    assert 0 <= r.yday <= 366


class _Tm(Schema):
    a: Column[Datetime]
    b: Column[Datetime]


def test_dt_diff_counts_complete_units(spark):
    """25 hours apart = 1 complete day (truncation toward zero), unlike
    calendar-boundary counting."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 23, 0)
    df = DataFrame.from_dict(
        {"a": [t0], "b": [t0 + dt.timedelta(hours=25)]}, _Tm
    )
    out = df.with_columns(_Tm.b.dt_diff("day", _Tm.a).alias("d"))
    assert out.native.first().d == 1  # boundary counting would say 2


def test_greatest_least_concat_count(customer):
    from colnade_spark import concat_str, greatest, least

    out = customer.with_columns(
        greatest(Customer.c_acctbal, 0.0).alias("g"),
        least(Customer.c_acctbal, 0.0).alias("l"),
        concat_str(Customer.c_name, Customer.c_mktsegment, sep="/").alias("t"),
        Customer.c_name.str_count_matches("0").alias("zeros"),
    )
    for r in out.native.limit(20).collect():
        assert r.g == max(r.c_acctbal, 0.0) and r.l == min(r.c_acctbal, 0.0)
        assert r.t == f"{r.c_name}/{r.c_mktsegment}"
        assert r.zeros == r.c_name.count("0")
    import pytest as _pt

    with _pt.raises(ValueError):
        greatest(Customer.c_acctbal)


def test_describe_one_row_per_numeric_column(customer):
    import statistics

    d = customer.describe()  # all numeric columns by default
    rows = {r.col_name: r for r in d.native.collect()}
    assert set(rows) == {"c_custkey", "c_nationkey", "c_acctbal"}
    vals = [r.c_acctbal for r in customer.native.select("c_acctbal").collect()]
    got = rows["c_acctbal"]
    assert got.n_non_null == len(vals)
    assert abs(got.mean - statistics.fmean(vals)) < 1e-6
    assert abs(got.std - statistics.stdev(vals)) < 1e-6
    assert got.lo == min(vals) and got.hi == max(vals)


def test_describe_guards(customer):
    with pytest.raises(TypeError):
        customer.describe(Customer.c_name)  # non-numeric
    with pytest.raises(ColumnGuardError):
        customer.describe("o_totalprice")  # foreign column
    lazy = customer.lazy().describe(Customer.c_acctbal).collect()
    assert lazy.height == 1


def test_window_over(customer):
    out = customer.with_columns(
        Customer.c_acctbal.mean().over(Customer.c_mktsegment).alias("seg_avg"),
        Customer.c_custkey.n_unique().over(Customer.c_mktsegment).alias("seg_n"),
    )
    rows = out.native.select("c_mktsegment", "seg_avg", "seg_n").collect()
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r.c_mktsegment, set()).add((round(r.seg_avg, 6), r.seg_n))
    for seg, vals in by_seg.items():
        assert len(vals) == 1  # constant within partition


def test_tail_and_sample(customer):
    t = customer.sort(Customer.c_custkey).tail(7)
    assert t.height == 7
    s = customer.sample(5, seed=1)
    assert s.height == 5
    # explicit seed → reproducible
    a = sorted(r.c_custkey for r in customer.sample(5, seed=1).rows())
    b = sorted(r.c_custkey for r in customer.sample(5, seed=1).rows())
    assert a == b


def test_sample_without_seed_is_random(customer):
    # regression: seed=None used to silently substitute a fixed seed 42, so
    # "random" sampling always returned the same rows. Unseeded F.rand()
    # draws a fresh seed per plan — two calls must (overwhelmingly) differ.
    draws = {
        tuple(sorted(r.c_custkey for r in customer.sample(10).rows()))
        for _ in range(4)
    }
    assert len(draws) > 1


def test_item_and_is_empty(customer):
    top = (
        customer.sort(Customer.c_acctbal.desc())
        .limit(1)
        .select(Customer.c_custkey)
    )
    assert isinstance(top.item(), int)
    empty = customer.filter(Customer.c_acctbal > 1e18)
    assert empty.is_empty()


def test_lazy_collect_equivalence(spark, sf_dir):
    lazy = scan_parquet(table_path(sf_dir, "customer"), Customer, spark=spark)
    eager = read_parquet(table_path(sf_dir, "customer"), Customer, spark=spark)
    a = (
        lazy.filter(Customer.c_acctbal > 100)
        .sort(Customer.c_custkey)
        .limit(5)
        .collect()
    )
    b = eager.filter(Customer.c_acctbal > 100).sort(Customer.c_custkey).limit(5)
    assert [r.c_custkey for r in a.rows()] == [r.c_custkey for r in b.rows()]


def test_with_raw_escape_hatch(customer):
    from pyspark.sql import functions as F

    out = customer.with_raw(lambda df: df.withColumn("c_acctbal", F.abs("c_acctbal")))
    assert out.filter(Customer.c_acctbal < 0).height == 0
