"""cogroup_map: the two-table custom-op escape hatch (applyInPandas over a
cogroup). Covers: per-key custom merge correctness vs a join-built
equivalent, full-outer key semantics (one-sided keys still reach fn),
boundary schema enforcement, ownership guards, and lazy/eager parity."""

from __future__ import annotations

import pytest

from colnade_spark.dataframe import DataFrame
from colnade_spark.dtypes import Float64, Int64, Utf8
from colnade_spark.errors import ColumnGuardError, SchemaError
from colnade_spark.schema import Column, Schema


class Users(Schema):
    uid: Column[Int64]
    name: Column[Utf8]


class Orders(Schema):
    user_id: Column[Int64]
    amount: Column[Float64]


class UserSpend(Schema):
    uid: Column[Int64]
    n_orders: Column[Int64]
    total: Column[Float64]


def _users(spark) -> DataFrame[Users]:
    return DataFrame.from_dict(
        {"uid": [1, 2, 3], "name": ["ann", "bo", "cy"]}, Users
    )


def _orders(spark) -> DataFrame[Orders]:
    return DataFrame.from_dict(
        {"user_id": [1, 1, 2, 9], "amount": [10.0, 5.0, 7.5, 99.0]}, Orders
    )


def _spend_fn(users_pdf, orders_pdf):
    import pandas as pd

    if not len(users_pdf):  # order-only key (user_id=9): drop
        return None
    return pd.DataFrame(
        {
            "uid": [int(users_pdf["uid"].iloc[0])],
            "n_orders": [len(orders_pdf)],
            "total": [float(orders_pdf["amount"].sum())],
        }
    )


def test_cogroup_map_per_key_merge(spark):
    out = _users(spark).cogroup_map(
        _orders(spark), Users.uid == Orders.user_id, _spend_fn, UserSpend
    )
    got = {r.uid: (r.n_orders, r.total) for r in out.rows()}
    # uid=3 has NO orders but still reaches fn with an empty right frame
    assert got == {1: (2, 15.0), 2: (1, 7.5), 3: (0, 0.0)}


def test_cogroup_condition_orientation_irrelevant(spark):
    out = _users(spark).cogroup_map(
        _orders(spark), Orders.user_id == Users.uid, _spend_fn, UserSpend
    )
    assert out.height == 3


def test_cogroup_guards_foreign_keys(spark):
    class Other(Schema):
        x: Column[Int64]

    # condition pairing a FOREIGN schema with Orders: ownership guard fires
    with pytest.raises(ColumnGuardError):
        _users(spark).cogroup_map(
            _orders(spark), Other.x == Orders.user_id, _spend_fn, UserSpend
        )
    # same-schema == builds a filter BinOp, not a JoinCondition: rejected
    with pytest.raises(SchemaError):
        _users(spark).cogroup_map(
            _orders(spark), Users.uid == Users.uid, _spend_fn, UserSpend
        )
    with pytest.raises(SchemaError):
        _users(spark).cogroup_map(_orders(spark), None, _spend_fn, UserSpend)


def test_cogroup_lazy_matches_eager(spark):
    lazy = (
        _users(spark)
        .lazy()
        .cogroup_map(
            _orders(spark).lazy(), Users.uid == Orders.user_id, _spend_fn, UserSpend
        )
    )
    assert {r.uid: (r.n_orders, r.total) for r in lazy.collect().rows()} == {
        1: (2, 15.0),
        2: (1, 7.5),
        3: (0, 0.0),
    }


def test_cogroup_mixing_eager_and_lazy_rejected(spark):
    with pytest.raises(TypeError):
        _users(spark).cogroup_map(
            _orders(spark).lazy(), Users.uid == Orders.user_id, _spend_fn, UserSpend
        )


def test_cogroup_output_schema_enforced(spark):
    def bad_fn(u, o):
        import pandas as pd

        return pd.DataFrame({"wrong": [1]})

    with pytest.raises(Exception):  # missing target columns surface loudly
        _users(spark).cogroup_map(
            _orders(spark), Users.uid == Orders.user_id, bad_fn, UserSpend
        ).rows()


def test_cogroup_matches_join_equivalent(spark):
    """The cogroup merge must agree with the declarative join+agg twin."""
    from pyspark.sql import functions as F

    u, o = _users(spark), _orders(spark)
    out = u.cogroup_map(o, Users.uid == Orders.user_id, _spend_fn, UserSpend)
    twin = (
        u.native.join(o.native, u.native["uid"] == o.native["user_id"], "left")
        .groupBy("uid")
        .agg(
            F.count("user_id").alias("n_orders"),
            F.coalesce(F.sum("amount"), F.lit(0.0)).alias("total"),
        )
    )
    got = {r.uid: (r.n_orders, r.total) for r in out.rows()}
    want = {r.uid: (r.n_orders, r.total) for r in twin.collect()}
    assert got == want
