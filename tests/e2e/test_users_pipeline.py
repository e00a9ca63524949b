"""E2E: read → transform → cast → (write → read-back) on the users table.

Every test runs a full pipeline through the typed surface against seeded
parquet and checks values against plain-Python recomputation of the same
seeded data (reference shape: tests/e2e/test_users_pipeline.py)."""

from __future__ import annotations

from colnade_spark import mapped_from, read_parquet, write_parquet
from colnade_spark.dtypes import Float64, Int64, Utf8
from colnade_spark.schema import Column, Schema
from tests.e2e.conftest import Users, make_users

EXPECTED = make_users()


class Adults(Schema):
    id: Column[Int64]
    name: Column[Utf8]


class Renamed(Schema):
    user_id: Column[Int64] = mapped_from(Users.id)
    user_name: Column[Utf8] = mapped_from(Users.name)


class Scored(Schema):
    id: Column[Int64]
    name: Column[Utf8]
    age: Column[Int64]
    score: Column[Float64 | None]


def test_filter_then_select_then_cast(spark, users_parquet):
    out = (
        read_parquet(users_parquet, Users, spark=spark)
        .filter(Users.age >= 30)
        .select(Users.id, Users.name)
        .cast_schema(Adults)
    )
    want = {i for i, a in zip(EXPECTED["id"], EXPECTED["age"]) if a >= 30}
    got = {r.id for r in out.rows()}
    assert got == want and out.width == 2


def test_filter_then_sort_then_limit(spark, users_parquet):
    out = (
        read_parquet(users_parquet, Users, spark=spark)
        .filter(Users.age >= 30)
        .sort(Users.age.desc(), Users.id.asc())
        .limit(10)
    )
    rows = out.rows()
    eligible = sorted(
        (
            (i, a)
            for i, a in zip(EXPECTED["id"], EXPECTED["age"])
            if a >= 30
        ),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    assert [(r.id, r.age) for r in rows] == eligible


def test_with_columns_then_filter(spark, users_parquet):
    out = (
        read_parquet(users_parquet, Users, spark=spark)
        .with_columns((Users.age + 10).alias("age"))
        .filter(Users.age >= 70)
    )
    want = {i for i, a in zip(EXPECTED["id"], EXPECTED["age"]) if a + 10 >= 70}
    assert {r.id for r in out.rows()} == want


def test_cast_schema_with_mapped_from(spark, users_parquet):
    out = read_parquet(users_parquet, Users, spark=spark).cast_schema(Renamed)
    rows = sorted(out.rows(), key=lambda r: r.user_id)
    assert rows[0].user_id == 1 and rows[0].user_name == "user_001"
    assert len(rows) == len(EXPECTED["id"])


def test_transform_write_read_back(spark, users_parquet, tmp_path):
    df = (
        read_parquet(users_parquet, Users, spark=spark)
        .filter(Users.score.is_not_null())
        .with_columns((Users.score * 2.0).alias("score"))
    )
    dest = str(tmp_path / "doubled.parquet")
    write_parquet(df, dest)
    back = read_parquet(dest, Scored, spark=spark)
    want = {
        i: s * 2.0
        for i, s in zip(EXPECTED["id"], EXPECTED["score"])
        if s is not None
    }
    got = {r.id: r.score for r in back.rows()}
    assert got == want


def test_chained_operations_preserve_data(spark, users_parquet):
    df = read_parquet(users_parquet, Users, spark=spark)
    out = df.filter(Users.age > 0).sort(Users.id).unique(Users.id).drop_nulls(Users.id)
    assert out.height == len(EXPECTED["id"])
    first = out.limit(1).rows()[0]
    assert (first.id, first.name) == (1, "user_001")
