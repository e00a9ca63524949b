"""E2E: aggregation pipelines (grouped + ungrouped, eager + lazy) with
values checked against plain-Python recomputation (reference shape:
tests/e2e/test_aggregation_pipeline.py)."""

from __future__ import annotations

import math

from colnade_spark import read_parquet, scan_parquet
from colnade_spark.dtypes import Float64, Int64
from colnade_spark.schema import Column, Schema
from tests.e2e.conftest import Orders, Users, make_orders, make_users

USERS = make_users()
ORDERS = make_orders()


class UserSpend(Schema):
    user_id: Column[Int64]
    total: Column[Float64]
    n_orders: Column[Int64]


def test_single_ungrouped_agg(spark, users_parquet):
    out = read_parquet(users_parquet, Users, spark=spark).agg(
        Users.age.sum().alias("age_sum")
    )
    assert out.item("age_sum") == sum(USERS["age"])


def test_multi_agg(spark, orders_parquet):
    out = read_parquet(orders_parquet, Orders, spark=spark).agg(
        Orders.amount.sum().alias("total"),
        Orders.amount.min().alias("lo"),
        Orders.amount.max().alias("hi"),
        Orders.id.count().alias("n"),
    )
    row = out.rows()[0]
    assert math.isclose(row[0], sum(ORDERS["amount"]), rel_tol=1e-12)
    assert row[1] == min(ORDERS["amount"])
    assert row[2] == max(ORDERS["amount"])
    assert row[3] == len(ORDERS["id"])


def test_group_agg_then_cast_schema(spark, orders_parquet):
    out = (
        read_parquet(orders_parquet, Orders, spark=spark)
        .group_by(Orders.user_id)
        .agg(Orders.amount.sum().alias("total"), Orders.id.count().alias("n_orders"))
        .cast_schema(UserSpend)
    )
    want_total: dict[int, float] = {}
    want_n: dict[int, int] = {}
    for uid, amt in zip(ORDERS["user_id"], ORDERS["amount"]):
        want_total[uid] = want_total.get(uid, 0.0) + amt
        want_n[uid] = want_n.get(uid, 0) + 1
    got = {r.user_id: (r.total, r.n_orders) for r in out.rows()}
    assert set(got) == set(want_total)
    for uid, (total, n) in got.items():
        assert n == want_n[uid]
        assert math.isclose(total, want_total[uid], rel_tol=1e-9)


def test_filter_then_agg(spark, users_parquet):
    out = (
        read_parquet(users_parquet, Users, spark=spark)
        .filter(Users.age >= 40)
        .agg(Users.id.count().alias("n"))
    )
    assert out.item("n") == sum(1 for a in USERS["age"] if a >= 40)


def test_lazy_group_agg_collect(spark, orders_parquet):
    lazy = (
        scan_parquet(orders_parquet, Orders, spark=spark)
        .group_by(Orders.user_id)
        .agg(Orders.id.count().alias("n_orders"))
    )
    eager = lazy.collect()
    want_n: dict[int, int] = {}
    for uid in ORDERS["user_id"]:
        want_n[uid] = want_n.get(uid, 0) + 1
    # erased frame → tuples in (group key, agg) column order
    got = {r[0]: r[1] for r in eager.rows()}
    assert got == want_n


def test_mean_and_nunique(spark, orders_parquet):
    out = read_parquet(orders_parquet, Orders, spark=spark).agg(
        Orders.amount.mean().alias("avg_amount"),
        Orders.user_id.n_unique().alias("n_users"),
    )
    row = out.rows()[0]
    assert math.isclose(
        row[0], sum(ORDERS["amount"]) / len(ORDERS["amount"]), rel_tol=1e-12
    )
    assert row[1] == len(set(ORDERS["user_id"]))
