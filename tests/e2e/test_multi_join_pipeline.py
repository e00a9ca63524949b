"""E2E: join pipelines across users/orders/products/order_items, values
checked against a plain-Python hash join of the same seeded data
(reference shape: tests/e2e/test_multi_join_pipeline.py)."""

from __future__ import annotations

import math

from colnade_spark import mapped_from, read_parquet
from colnade_spark.dtypes import Float64, Int64, Utf8
from colnade_spark.schema import Column, Schema
from tests.e2e.conftest import (
    OrderItems,
    Orders,
    Products,
    Users,
    make_order_items,
    make_orders,
    make_products,
    make_users,
)

USERS = make_users()
ORDERS = make_orders()
PRODUCTS = make_products()
ITEMS = make_order_items()


class UserOrder(Schema):
    user_id: Column[Int64] = mapped_from(Users.id)
    user_name: Column[Utf8] = mapped_from(Users.name)
    amount: Column[Float64]


class ItemRevenue(Schema):
    order_id: Column[Int64]
    product_name: Column[Utf8]
    revenue: Column[Float64]


def test_users_join_orders_height(spark, users_parquet, orders_parquet):
    u = read_parquet(users_parquet, Users, spark=spark)
    o = read_parquet(orders_parquet, Orders, spark=spark)
    j = u.join(o, on=Users.id == Orders.user_id)
    # every order's user_id ∈ [1, 100] and users has exactly ids 1..100
    assert j.height == len(ORDERS["id"])


def test_join_then_cast_schema(spark, users_parquet, orders_parquet):
    u = read_parquet(users_parquet, Users, spark=spark)
    o = read_parquet(orders_parquet, Orders, spark=spark)
    out = u.join(o, on=Users.id == Orders.user_id).cast_schema(UserOrder)
    by_user: dict[int, float] = {}
    for uid, amt in zip(ORDERS["user_id"], ORDERS["amount"]):
        by_user[uid] = by_user.get(uid, 0.0) + amt
    got: dict[int, float] = {}
    names: dict[int, str] = {}
    for r in out.rows():
        got[r.user_id] = got.get(r.user_id, 0.0) + r.amount
        names[r.user_id] = r.user_name
    assert set(got) == set(by_user)
    for uid in got:
        assert math.isclose(got[uid], by_user[uid], rel_tol=1e-9)
        assert names[uid] == f"user_{uid:03d}"


def test_join_filter_then_cast(spark, users_parquet, orders_parquet):
    u = read_parquet(users_parquet, Users, spark=spark)
    o = read_parquet(orders_parquet, Orders, spark=spark)
    out = (
        u.join(o, on=Users.id == Orders.user_id)
        .filter(Orders.amount > 400.0)
        .cast_schema(UserOrder)
    )
    want = sum(1 for a in ORDERS["amount"] if a > 400.0)
    assert out.height == want


def test_join_sort_limit(spark, users_parquet, orders_parquet):
    u = read_parquet(users_parquet, Users, spark=spark)
    o = read_parquet(orders_parquet, Orders, spark=spark)
    out = (
        u.join(o, on=Users.id == Orders.user_id)
        .sort(Orders.amount.desc())
        .limit(5)
        .cast_schema(UserOrder)
    )
    top5 = sorted(ORDERS["amount"], reverse=True)[:5]
    got = sorted((r.amount for r in out.rows()), reverse=True)
    assert got == top5


def test_items_join_products_revenue(spark, order_items_parquet, products_parquet):
    it = read_parquet(order_items_parquet, OrderItems, spark=spark)
    p = read_parquet(products_parquet, Products, spark=spark)
    out = (
        it.join(p, on=OrderItems.product_id == Products.product_id)
        .with_columns((OrderItems.quantity * Products.price).alias("revenue"))
        .cast_schema(ItemRevenue)
    )
    price = dict(zip(PRODUCTS["product_id"], PRODUCTS["price"]))
    want_total = sum(q * price[pid] for q, pid in zip(ITEMS["quantity"], ITEMS["product_id"]))
    got_total = sum(r.revenue for r in out.rows())
    assert out.height == len(ITEMS["order_id"])
    assert math.isclose(got_total, want_total, rel_tol=1e-9)


def test_left_join_keeps_unmatched(spark, users_parquet, orders_parquet):
    u = read_parquet(users_parquet, Users, spark=spark)
    o = read_parquet(orders_parquet, Orders, spark=spark)
    j = u.join(o, on=Users.id == Orders.user_id, how="left")
    users_with_orders = set(ORDERS["user_id"])
    unmatched = len(USERS["id"]) - len(users_with_orders)
    assert j.height == len(ORDERS["id"]) + unmatched
