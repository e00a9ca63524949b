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

# -- set operations ----------------------------------------------------------


def test_intersect_except_partition_filtered_frame(orders):
    hi = orders.filter(Orders.o_totalprice > 100000.0)
    lo = orders.filter(Orders.o_totalprice <= 200000.0)
    both = hi.intersect(lo)
    only = hi.except_(lo)
    # o_orderkey is unique, so distinct set ops partition hi exactly
    assert both.height + only.height == hi.height
    mid = {r.o_orderkey for r in both.rows()}
    assert all(100000.0 < r.o_totalprice <= 200000.0 for r in both.rows())
    assert not mid & {r.o_orderkey for r in only.rows()}


class _Xs(cs.Schema):
    x: cs.Column[cs.Int64]


def test_intersect_all_keeps_count_matched_duplicates(spark):
    a = cs.DataFrame.from_dict({"x": [1, 1, 1, 2]}, _Xs)
    b = cs.DataFrame.from_dict({"x": [1, 1, 3]}, _Xs)
    assert a.intersect(b).height == 1          # distinct semantics
    assert a.intersect(b, all=True).height == 2  # min(3,2) occurrences
    assert a.except_(b).height == 1            # {2}
    assert a.except_(b, all=True).height == 2  # [1, 2] (3-2 ones survive)


def test_set_op_requires_same_schema_class(customer, orders):
    with pytest.raises(SchemaError):
        customer.intersect(orders)  # type: ignore[arg-type]


def test_set_op_rejects_mixed_lazy_eager(spark, sf_dir, customer):
    lc = cs.scan_parquet(table_path(sf_dir, "customer"), Customer, spark=spark)
    with pytest.raises(TypeError):
        customer.except_(lc)  # type: ignore[arg-type]


def test_set_op_lazy_parity(spark, sf_dir, orders):
    lo = cs.scan_parquet(table_path(sf_dir, "orders"), Orders, spark=spark)
    hi = lo.filter(Orders.o_totalprice > 100000.0)
    lo2 = lo.filter(Orders.o_totalprice <= 200000.0)
    lazy = hi.intersect(lo2).collect()
    eager_hi = orders.filter(Orders.o_totalprice > 100000.0)
    eager_lo = orders.filter(Orders.o_totalprice <= 200000.0)
    assert lazy.height == eager_hi.intersect(eager_lo).height


# -- pivot -------------------------------------------------------------------


def test_pivot_matches_group_by(orders):
    piv = orders.group_by(Orders.o_orderpriority).pivot(
        Orders.o_orderstatus, ["F", "O", "P"]
    ).agg(Orders.o_orderkey.count().alias("n"))
    plain = {
        (r.o_orderpriority, r.o_orderstatus): r.n
        for r in orders.group_by(Orders.o_orderpriority, Orders.o_orderstatus)
        .agg(Orders.o_orderkey.count().alias("n"))
        .native.collect()
    }
    for r in piv.native.collect():
        for status in ("F", "O", "P"):
            assert (r[status] or 0) == plain.get((r.o_orderpriority, status), 0)


def test_pivot_undeclared_value_dropped(orders):
    piv = orders.group_by(Orders.o_orderpriority).pivot(
        Orders.o_orderstatus, ["F"]
    ).agg(Orders.o_orderkey.count().alias("n"))
    assert piv.native.columns == ["o_orderpriority", "F"]


def test_pivot_requires_values(orders):
    with pytest.raises(SchemaError):
        orders.group_by(Orders.o_orderpriority).pivot(Orders.o_orderstatus, [])


def test_pivot_not_on_cube(orders):
    with pytest.raises(SchemaError):
        orders.cube(Orders.o_orderpriority).pivot(Orders.o_orderstatus, ["F"])


def test_pivot_guard_rejects_foreign_pivot_col(orders):
    with pytest.raises(ColumnGuardError):
        orders.group_by(Orders.o_orderpriority).pivot(
            Customer.c_mktsegment, ["BUILDING"]
        )


# -- cumulative windows ------------------------------------------------------


def test_cum_sum_matches_python_model(orders):
    from colnade_spark import cum_sum

    out = orders.with_columns(
        cum_sum(
            Orders.o_totalprice,
            partition_by=Orders.o_orderstatus,
            order_by=Orders.o_orderkey,
        ).alias("run")
    )
    rows = sorted(
        ((r.o_orderstatus, r.o_orderkey, r.o_totalprice, r.run)
         for r in out.native.collect()),
        key=lambda t: (t[0], t[1]),
    )
    acc: dict = {}
    for status, _key, price, run in rows:
        acc[status] = acc.get(status, 0.0) + price
        assert abs(acc[status] - run) < 1e-6 * max(1.0, abs(run))


class _Series(cs.Schema):
    k: cs.Column[cs.Utf8]
    day: cs.Column[cs.Int64]
    val: cs.Column[cs.Int64]


def test_rolling_rows_frame_matches_python_model(spark):
    from colnade_spark import rolling_sum

    df = cs.DataFrame.from_dict(
        {
            "k": ["a"] * 5 + ["b"] * 3,
            "day": [1, 2, 3, 4, 5, 1, 2, 3],
            "val": [10, 20, 30, 40, 50, 1, 2, 3],
        },
        _Series,
    )
    out = df.with_columns(
        rolling_sum(
            _Series.val, partition_by=_Series.k, order_by=_Series.day, preceding=2
        ).alias("roll")
    )
    got = {(r.k, r.day): r.roll for r in out.native.collect()}
    assert got[("a", 1)] == 10
    assert got[("a", 3)] == 60  # 10+20+30
    assert got[("a", 5)] == 120  # 30+40+50 — frame slides, not cumulative
    assert got[("b", 3)] == 6


def test_rolling_range_frame_is_tie_insensitive(spark):
    from colnade_spark import rolling_count, rolling_sum

    # two rows share day=2: a RANGE frame includes both peers in BOTH rows
    df = cs.DataFrame.from_dict(
        {
            "k": ["a"] * 4,
            "day": [1, 2, 2, 5],
            "val": [1, 10, 100, 1000],
        },
        _Series,
    )
    res = df.with_columns(
        rolling_sum(
            _Series.val, partition_by=_Series.k, order_by=_Series.day,
            preceding=1, range_frame=True,
        ).alias("roll"),
        rolling_count(
            _Series.val, partition_by=_Series.k, order_by=_Series.day,
            preceding=1, range_frame=True,
        ).alias("n"),
    )
    rolls = sorted((r.day, r.val, r.roll, r.n) for r in res.native.collect())
    # day=2 rows both see 1+10+100 (day 1 in range, both day-2 peers)
    assert rolls == [(1, 1, 1, 1), (2, 10, 111, 3), (2, 100, 111, 3), (5, 1000, 1000, 1)]


def test_rolling_validation_errors(spark):
    from colnade_spark import rolling_mean, rolling_sum

    with pytest.raises(ValueError):
        rolling_sum(
            _Series.val, partition_by=_Series.k, order_by=_Series.day, preceding=-1
        )
    with pytest.raises(ValueError):
        rolling_mean(
            _Series.val,
            partition_by=_Series.k,
            order_by=[_Series.day, _Series.val],
            preceding=1,
            range_frame=True,
        )
    with pytest.raises(ValueError):
        rolling_sum(_Series.val, partition_by=_Series.k, preceding=1)


def test_ntile_bucket_sizes_balanced(orders):
    from colnade_spark import ntile

    out = orders.with_columns(
        ntile(4, partition_by=Orders.o_orderstatus,
              order_by=Orders.o_orderkey).alias("q")
    )
    from collections import Counter
    for status_rows in (
        Counter((r.o_orderstatus, r.q) for r in out.native.collect()),
    ):
        by_status: dict = {}
        for (status, q), n in status_rows.items():
            by_status.setdefault(status, {})[q] = n
        for status, qs in by_status.items():
            assert set(qs) == {1, 2, 3, 4}
            assert max(qs.values()) - min(qs.values()) <= 1


def test_percent_rank_and_cume_dist_model(spark):
    from colnade_spark import cume_dist, percent_rank

    df = cs.DataFrame.from_dict(
        {"k": ["a"] * 4, "day": [1, 2, 2, 4], "val": [0, 0, 0, 0]}, _Series
    )
    out = df.with_columns(
        percent_rank(partition_by=_Series.k, order_by=_Series.day).alias("pr"),
        cume_dist(partition_by=_Series.k, order_by=_Series.day).alias("cd"),
    )
    rows = sorted((r.day, r.pr, r.cd) for r in out.native.collect())
    # ties (day=2) share rank 2 -> pr=(2-1)/3; cume_dist counts both peers
    assert rows == [
        (1, 0.0, 0.25),
        (2, 1 / 3, 0.75),
        (2, 1 / 3, 0.75),
        (4, 1.0, 1.0),
    ]


def test_cum_requires_order_by(orders):
    from colnade_spark.expr import cum_sum

    with pytest.raises(ValueError):
        cum_sum(Orders.o_totalprice, partition_by=Orders.o_orderstatus)


def test_cum_guard_rejects_foreign_columns(orders):
    from colnade_spark import cum_sum

    with pytest.raises(ColumnGuardError):
        orders.with_columns(
            cum_sum(
                Customer.c_acctbal,
                partition_by=Orders.o_orderstatus,
                order_by=Orders.o_orderkey,
            ).alias("run")
        )


# -- multi-key joins ---------------------------------------------------------


class _LiKeys(cs.Schema):
    k_orderkey: cs.Column[cs.Int64]
    k_linenumber: cs.Column[cs.Int32]
    k_qty: cs.Column[cs.Float64]


def test_multi_key_join_exact_multiplicity(spark, sf_dir):
    li = cs.read_parquet(table_path(sf_dir, "lineitem"), Lineitem, spark=spark)
    keys = (
        li.select(Lineitem.l_orderkey, Lineitem.l_linenumber, Lineitem.l_quantity)
        .native.toDF("k_orderkey", "k_linenumber", "k_qty")
    )
    keyed = cs.DataFrame(keys, _LiKeys)
    j = li.join(
        keyed,
        [
            Lineitem.l_orderkey == _LiKeys.k_orderkey,
            Lineitem.l_linenumber == _LiKeys.k_linenumber,
        ],
    )
    # self-join on the composite key: count must be EXACTLY sum(n_g^2)
    # over (orderkey, linenumber) groups — join-then-filter or key-dropping
    # bugs break this equality
    from pyspark.sql import functions as F

    expected = (
        li.native.groupBy("l_orderkey", "l_linenumber")
        .count()
        .agg(F.sum(F.col("count") * F.col("count")))
        .collect()[0][0]
    )
    assert j.native.count() == expected
    # every matched pair shares the composite key, so quantities can only
    # disagree within a genuine duplicate-key group
    agree = j.native.filter("l_orderkey = k_orderkey AND l_linenumber = k_linenumber")
    assert agree.count() == expected


def test_single_key_join_still_works_and_differs(spark, sf_dir):
    li = cs.read_parquet(table_path(sf_dir, "lineitem"), Lineitem, spark=spark)
    keys = (
        li.select(Lineitem.l_orderkey, Lineitem.l_linenumber, Lineitem.l_quantity)
        .native.toDF("k_orderkey", "k_linenumber", "k_qty")
    )
    keyed = cs.DataFrame(keys, _LiKeys)
    j1 = li.join(keyed, Lineitem.l_orderkey == _LiKeys.k_orderkey)
    # single-key join fans out across line numbers -> strictly more rows
    assert j1.native.count() > li.height


def test_multi_key_join_rejects_empty_list(spark, sf_dir):
    li = cs.read_parquet(table_path(sf_dir, "lineitem"), Lineitem, spark=spark)
    keys = li.select(
        Lineitem.l_orderkey, Lineitem.l_linenumber, Lineitem.l_quantity
    ).native.toDF("k_orderkey", "k_linenumber", "k_qty")
    keyed = cs.DataFrame(keys, _LiKeys)
    with pytest.raises(SchemaError):
        li.join(keyed, [])


def test_multi_key_join_is_one_composite_shuffle(spark, sf_dir):
    """Both equalities must land in ONE join's key list — never
    join-on-first-key-then-filter."""
    import io as _io
    from contextlib import redirect_stdout

    li = cs.read_parquet(table_path(sf_dir, "lineitem"), Lineitem, spark=spark)
    keys = li.select(
        Lineitem.l_orderkey, Lineitem.l_linenumber, Lineitem.l_quantity
    ).native.toDF("k_orderkey", "k_linenumber", "k_qty")
    keyed = cs.DataFrame(keys, _LiKeys)
    j = li.join(
        keyed,
        [
            Lineitem.l_orderkey == _LiKeys.k_orderkey,
            Lineitem.l_linenumber == _LiKeys.k_linenumber,
        ],
    )
    buf = _io.StringIO()
    with redirect_stdout(buf):
        j.explain("formatted")
    plan = buf.getvalue()
    import re
    m = re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin).*keys.*\n", plan)
    # the join node must carry BOTH keys
    joins = [ln for ln in plan.splitlines() if "Left keys" in ln]
    assert joins and all("l_orderkey" in ln and "l_linenumber" in ln for ln in joins), plan


# -- typed explode -----------------------------------------------------------


class _Bags(cs.Schema):
    id: cs.Column[cs.Int64]
    xs: cs.Column[cs.List[cs.Int64]]


def test_explode_multiplicity_and_values(spark):
    df = cs.DataFrame.from_dict(
        {"id": [1, 2, 3], "xs": [[10, 11], [20], []]}, _Bags
    )
    flat = df.explode(_Bags.xs)
    rows = sorted((r.id, r.xs) for r in flat.native.collect())
    assert rows == [(1, 10), (1, 11), (2, 20)]  # empty list drops the row


def test_explode_outer_keeps_empty(spark):
    df = cs.DataFrame.from_dict(
        {"id": [1, 2], "xs": [[7], []]}, _Bags
    )
    flat = df.explode(_Bags.xs, outer=True)
    rows = sorted(
        (r.id, r.xs) for r in flat.native.collect()
    )
    assert rows == [(1, 7), (2, None)]


def test_explode_guard_rejects_foreign_column(spark):
    df = cs.DataFrame.from_dict({"id": [1], "xs": [[1]]}, _Bags)
    with pytest.raises(ColumnGuardError):
        df.explode(Orders.o_orderkey)


def test_explode_lazy_parity(spark):
    df = cs.DataFrame.from_dict({"id": [1, 2], "xs": [[1, 2, 3], [4]]}, _Bags)
    lazy = df.lazy().explode(_Bags.xs).collect()
    assert lazy.height == 4


class _SBags(cs.Schema):
    id: cs.Column[cs.Int64]
    ws: cs.Column[cs.List[cs.Utf8 | None]]


def test_list_ext_ops_unique_sort_slice_join(spark):
    df = cs.DataFrame.from_dict(
        {"id": [1, 2], "ws": [["b", "a", "b", None, "c"], []]}, _SBags
    )
    out = df.with_columns(
        _SBags.ws.list.unique().list.len().alias("nu"),
        _SBags.ws.list.sort().list.get(0).alias("lo"),
        _SBags.ws.list.slice(1, 2).list.join("|").alias("mid"),
    )
    got = {r.id: (r.nu, r.lo, r.mid) for r in out.native.collect()}
    # unique keeps null as a distinct element; sort is asc nulls-last;
    # join skips nulls
    assert got[1] == (4, "a", "a|b")
    assert got[2] == (0, None, "")


def test_list_ext_chained_on_computed_expr(spark):
    class _Txt(cs.Schema):
        s: cs.Column[cs.Utf8]

    df = cs.DataFrame.from_dict({"s": ["c b a d", "x"]}, _Txt)
    out = df.with_columns(
        _Txt.s.str_split(" ").list.sort().list.slice(0, 2).list.join(" ").alias("lo2")
    )
    assert sorted(r.lo2 for r in out.native.collect()) == ["a b", "x"]


def test_list_slice_validates_args(spark):
    with pytest.raises(ValueError):
        _SBags.ws.list.slice(-1, 2)
    with pytest.raises(ValueError):
        _SBags.ws.list.slice(0, -2)


# -- map_batches / broadcast -------------------------------------------------


class _DocLen(cs.Schema):
    doc_id: cs.Column[cs.Int64]
    n_upper: cs.Column[cs.Int64]


def test_map_batches_arrow_transform(spark, sf_dir):
    from colnade_spark.tpch import Documents

    docs = cs.read_parquet(table_path(sf_dir, "documents"), Documents, spark=spark)

    def count_upper(pdf):
        import pandas as pd

        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_upper": pdf["text"].str.count(r"[A-Z]").astype("int64"),
            }
        )

    out = docs.map_batches(count_upper, _DocLen)
    assert out.schema is _DocLen
    assert out.height == docs.height
    # spot check one row against the driver-side computation
    row = out.sort(_DocLen.doc_id).head(1).rows()[0]
    text = docs.filter(Documents.doc_id == row.doc_id).rows()[0].text
    assert row.n_upper == sum(1 for ch in text if ch.isupper())


def test_map_batches_schema_mismatch_raises(spark, sf_dir):
    from colnade_spark.tpch import Documents

    docs = cs.read_parquet(table_path(sf_dir, "documents"), Documents, spark=spark)

    def bad(pdf):
        import pandas as pd

        return pd.DataFrame({"doc_id": pdf["doc_id"]})  # missing n_upper

    out = docs.map_batches(bad, _DocLen)
    # missing column surfaces as an execution-time error on materialize
    with pytest.raises(Exception):
        out.height


def test_map_batches_typed_pipeline_continues(spark, sf_dir):
    from colnade_spark.tpch import Documents

    docs = cs.read_parquet(table_path(sf_dir, "documents"), Documents, spark=spark)

    def ident(pdf):
        import pandas as pd

        return pd.DataFrame(
            {"doc_id": pdf["doc_id"], "n_upper": pdf["n_chars"].astype("int64")}
        )

    out = docs.map_batches(ident, _DocLen).filter(_DocLen.n_upper > 100)
    assert 0 < out.height <= docs.height


def test_broadcast_hint_forces_broadcast_join(spark, sf_dir):
    import io as _io
    from contextlib import redirect_stdout

    from colnade_spark import broadcast
    from colnade_spark.tpch import Nation

    c = cs.read_parquet(table_path(sf_dir, "customer"), Customer, spark=spark)
    n = cs.read_parquet(table_path(sf_dir, "nation"), Nation, spark=spark)
    j = c.join(broadcast(n), Customer.c_nationkey == Nation.n_nationkey)
    buf = _io.StringIO()
    with redirect_stdout(buf):
        j.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_broadcast_preserves_schema_type(spark, sf_dir):
    from colnade_spark import broadcast
    from colnade_spark.tpch import Nation

    n = cs.read_parquet(table_path(sf_dir, "nation"), Nation, spark=spark)
    b = broadcast(n)
    assert b.schema is Nation
    assert b.filter(Nation.n_nationkey >= 0).height == n.height
