"""Typed relational extensions: semi/anti joins, cube/rollup grouping
sets, melt (unpivot). All are extensions beyond the reference surface
(SURVEY.md §2.6 lists them as absent there)."""

from __future__ import annotations

import pytest

import colnade_spark as cs
from colnade_spark.errors import ColumnGuardError, SchemaError
from colnade_spark.tpch import Customer, Lineitem, Orders, table_path


@pytest.fixture(scope="module")
def customer(spark, sf_dir):
    return cs.read_parquet(table_path(sf_dir, "customer"), Customer, spark=spark)


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return cs.read_parquet(table_path(sf_dir, "orders"), Orders, spark=spark)


# -- semi / anti -------------------------------------------------------------


def test_semi_anti_partition_the_left(customer, orders):
    urgent = orders.filter(Orders.o_orderpriority == "1-URGENT")
    semi = customer.semi_join(urgent, Customer.c_custkey == Orders.o_custkey)
    anti = customer.anti_join(urgent, Customer.c_custkey == Orders.o_custkey)
    assert semi.height + anti.height == customer.height
    # disjoint id sets
    s = {r.c_custkey for r in semi.rows()}
    a = {r.c_custkey for r in anti.rows()}
    assert not (s & a)


def test_semi_join_keeps_schema_and_no_duplication(customer, orders):
    semi = customer.semi_join(orders, Customer.c_custkey == Orders.o_custkey)
    # left schema preserved: typed ops still work, no right columns leak
    assert semi.native.columns == customer.native.columns
    # multiplicity 1 even though customers have many orders
    ids = [r.c_custkey for r in semi.rows()]
    assert len(ids) == len(set(ids))
    # typed pipeline continues on the result
    out = semi.filter(Customer.c_acctbal > 0)
    assert out.height <= semi.height


def test_semi_join_matches_inner_join_distinct(customer, orders):
    semi = customer.semi_join(orders, Customer.c_custkey == Orders.o_custkey)
    expect = (
        customer.join(orders, Customer.c_custkey == Orders.o_custkey)
        .cast_schema(Customer)
        .unique(Customer.c_custkey)
    )
    assert semi.height == expect.height


def test_semi_join_guard_rejects_non_condition(customer, orders):
    with pytest.raises(SchemaError):
        customer.semi_join(orders, None)  # type: ignore[arg-type]


def test_semi_join_lazy_parity(spark, sf_dir, customer, orders):
    lc = cs.scan_parquet(table_path(sf_dir, "customer"), Customer, spark=spark)
    lo = cs.scan_parquet(table_path(sf_dir, "orders"), Orders, spark=spark)
    urgent = lo.filter(Orders.o_orderpriority == "1-URGENT")
    lazy = lc.anti_join(urgent, Customer.c_custkey == Orders.o_custkey).collect()
    eager = customer.anti_join(
        orders.filter(Orders.o_orderpriority == "1-URGENT"),
        Customer.c_custkey == Orders.o_custkey,
    )
    assert lazy.height == eager.height


# -- cube / rollup -----------------------------------------------------------


def test_cube_covers_all_grouping_sets(orders):
    out = orders.cube(Orders.o_orderstatus, Orders.o_orderpriority).agg(
        Orders.o_orderkey.count().alias("n")
    )
    rows = out.native.collect()
    gids = {r.gid for r in rows}
    assert gids == {0, 1, 2, 3}
    # the gid=3 grand total equals the frame height
    total = [r for r in rows if r.gid == 3]
    assert len(total) == 1 and total[0].n == orders.height
    # subtotal NULLs are flagged by gid, first key = MSB
    for r in rows:
        assert (r.o_orderstatus is None) == bool(r.gid & 2)
        assert (r.o_orderpriority is None) == bool(r.gid & 1)


def test_rollup_is_prefix_hierarchy(orders):
    out = orders.rollup(Orders.o_orderstatus, Orders.o_orderpriority).agg(
        Orders.o_orderkey.count().alias("n")
    )
    gids = sorted({r.gid for r in out.native.collect()})
    assert gids == [0, 1, 3]  # no "priority only" set in a rollup


def test_cube_group_level_matches_group_by(orders):
    cube_rows = {
        (r.o_orderstatus, r.o_orderpriority): r.n
        for r in orders.cube(Orders.o_orderstatus, Orders.o_orderpriority)
        .agg(Orders.o_orderkey.count().alias("n"))
        .native.collect()
        if r.gid == 0
    }
    plain = {
        (r.o_orderstatus, r.o_orderpriority): r.n
        for r in orders.group_by(Orders.o_orderstatus, Orders.o_orderpriority)
        .agg(Orders.o_orderkey.count().alias("n"))
        .native.collect()
    }
    assert cube_rows == plain


def test_cube_guard_rejects_foreign_columns(orders):
    with pytest.raises(ColumnGuardError):
        orders.cube(Customer.c_mktsegment).agg(
            Orders.o_orderkey.count().alias("n")
        )


# -- melt --------------------------------------------------------------------


def test_melt_row_multiplicity_and_values(customer):
    m = customer.melt(
        [Customer.c_custkey], [Customer.c_acctbal], value_name="v"
    )
    assert m.height == customer.height
    back = {r.c_custkey: r.v for r in m.native.collect()}
    orig = {r.c_custkey: r.c_acctbal for r in customer.rows()}
    assert back == orig
    assert {r.variable for r in m.native.collect()} == {"c_acctbal"}


def test_melt_two_measures_doubles_rows(spark, sf_dir):
    li = cs.read_parquet(table_path(sf_dir, "lineitem"), Lineitem, spark=spark)
    m = li.melt(
        [Lineitem.l_orderkey, Lineitem.l_linenumber],
        [Lineitem.l_discount, Lineitem.l_tax],
    )
    assert m.height == 2 * li.height
    assert m.native.columns == ["l_orderkey", "l_linenumber", "variable", "value"]


def test_melt_requires_values(customer):
    with pytest.raises(SchemaError):
        customer.melt([Customer.c_custkey], [])


def test_melt_guard_rejects_foreign_columns(customer):
    with pytest.raises(ColumnGuardError):
        customer.melt([Customer.c_custkey], [Orders.o_totalprice])
