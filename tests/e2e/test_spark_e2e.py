"""E2E: full-stack pipelines — read, transform, aggregate, join, validate,
write, read back — the Spark twin of the reference's backend e2e file
(reference shape: tests/e2e/test_polars_e2e.py)."""

from __future__ import annotations

import math

import pytest

from colnade_spark import (
    SchemaError,
    mapped_from,
    read_csv,
    read_parquet,
    set_validation,
    write_csv,
    write_parquet,
)
from colnade_spark.dtypes import Float64, Int64, Utf8
from colnade_spark.schema import Column, Schema
from tests.e2e.conftest import Orders, Users, make_orders, make_users

USERS = make_users()
ORDERS = make_orders()


class SegTotals(Schema):
    age: Column[Int64]
    total_score: Column[Float64]


class UserOrder(Schema):
    user_id: Column[Int64] = mapped_from(Users.id)
    amount: Column[Float64]


def test_full_pipeline(spark, users_parquet):
    out = (
        read_parquet(users_parquet, Users, spark=spark)
        .filter(Users.score.is_not_null())
        .with_columns((Users.age - Users.age % 10).alias("age"))
        .group_by(Users.age)
        .agg(Users.score.sum().alias("total_score"))
        .cast_schema(SegTotals)
        .sort(SegTotals.age)
    )
    want: dict[int, float] = {}
    for a, s in zip(USERS["age"], USERS["score"]):
        if s is not None:
            decade = a - a % 10
            want[decade] = want.get(decade, 0.0) + s
    got = {r.age: r.total_score for r in out.rows()}
    assert set(got) == set(want)
    for k in got:
        assert math.isclose(got[k], want[k], rel_tol=1e-9)


def test_join_agg_roundtrip(spark, users_parquet, orders_parquet, tmp_path):
    u = read_parquet(users_parquet, Users, spark=spark)
    o = read_parquet(orders_parquet, Orders, spark=spark)
    flat = u.join(o, on=Users.id == Orders.user_id).cast_schema(UserOrder)
    dest = str(tmp_path / "user_orders.parquet")
    write_parquet(flat, dest)
    back = read_parquet(dest, UserOrder, spark=spark)
    assert back.height == len(ORDERS["id"])
    assert math.isclose(
        sum(r.amount for r in back.rows()), sum(ORDERS["amount"]), rel_tol=1e-9
    )


def test_csv_roundtrip_pipeline(spark, users_parquet, tmp_path):
    df = read_parquet(users_parquet, Users, spark=spark).drop_nulls(Users.score)
    dest = str(tmp_path / "users_csv")
    write_csv(df, dest)
    back = read_csv(dest, Users, spark=spark)
    n_scored = sum(1 for s in USERS["score"] if s is not None)
    assert back.height == n_scored


def test_validated_read_catches_wrong_schema(spark, users_parquet):
    class WrongTypes(Schema):
        id: Column[Utf8]  # file has int64
        name: Column[Utf8]

    set_validation("structural")
    try:
        with pytest.raises(SchemaError):
            read_parquet(users_parquet, WrongTypes, spark=spark)
    finally:
        set_validation("off")


def test_validated_pipeline_passes_on_good_data(spark, users_parquet):
    set_validation("structural")
    try:
        out = (
            read_parquet(users_parquet, Users, spark=spark)
            .filter(Users.age >= 18)
            .cast_schema(Users)
        )
        assert out.height == len(USERS["id"])
    finally:
        set_validation("off")
