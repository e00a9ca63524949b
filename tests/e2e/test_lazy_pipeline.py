"""E2E: lazy pipelines — scan_parquet → transforms → collect, and
eager/lazy result equivalence (reference shape: tests/e2e/test_lazy_pipeline.py)."""

from __future__ import annotations

from colnade_spark import LazyFrame, read_parquet, scan_parquet
from colnade_spark.dtypes import Int64, Utf8
from colnade_spark.schema import Column, Schema
from tests.e2e.conftest import NullableUsers, Users, make_users

EXPECTED = make_users()


class Slim(Schema):
    id: Column[Int64]
    name: Column[Utf8]


def test_scan_returns_lazyframe(spark, users_parquet):
    lf = scan_parquet(users_parquet, Users, spark=spark)
    assert isinstance(lf, LazyFrame)


def test_scan_filter_collect(spark, users_parquet):
    out = (
        scan_parquet(users_parquet, Users, spark=spark)
        .filter(Users.age >= 50)
        .collect()
    )
    want = sum(1 for a in EXPECTED["age"] if a >= 50)
    assert out.height == want


def test_scan_filter_sort_limit_collect(spark, users_parquet):
    out = (
        scan_parquet(users_parquet, Users, spark=spark)
        .filter(Users.age >= 30)
        .sort(Users.id)
        .limit(7)
        .collect()
    )
    want = [i for i, a in zip(EXPECTED["id"], EXPECTED["age"]) if a >= 30][:7]
    assert [r.id for r in out.rows()] == want


def test_scan_select_cast_collect(spark, users_parquet):
    out = (
        scan_parquet(users_parquet, Users, spark=spark)
        .select(Users.id, Users.name)
        .cast_schema(Slim)
        .collect()
    )
    assert out.width == 2 and out.height == len(EXPECTED["id"])


def test_lazy_results_match_eager(spark, users_parquet):
    eager = (
        read_parquet(users_parquet, Users, spark=spark)
        .filter(Users.age > 40)
        .sort(Users.id)
    )
    lazy = (
        scan_parquet(users_parquet, Users, spark=spark)
        .filter(Users.age > 40)
        .sort(Users.id)
        .collect()
    )
    assert [r.id for r in eager.rows()] == [r.id for r in lazy.rows()]


def test_eager_to_lazy_to_eager(spark, users_parquet):
    df = read_parquet(users_parquet, Users, spark=spark)
    out = df.lazy().filter(Users.age >= 18).collect()
    assert out.height == len(EXPECTED["id"])


def test_lazy_unique_collect(spark, users_parquet):
    out = scan_parquet(users_parquet, Users, spark=spark).unique(Users.age).collect()
    assert out.height == len(set(EXPECTED["age"]))


def test_lazy_drop_nulls_collect(spark, nullable_users_parquet):
    from tests.e2e.conftest import make_nullable_users

    data = make_nullable_users()
    out = (
        scan_parquet(nullable_users_parquet, NullableUsers, spark=spark)
        .drop_nulls(NullableUsers.age)
        .collect()
    )
    assert out.height == sum(1 for a in data["age"] if a is not None)
