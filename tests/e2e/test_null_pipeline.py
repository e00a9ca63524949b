"""E2E: null handling — fill_null / drop_nulls / is_null filters on seeded
data with planted nulls (reference shape: tests/e2e/test_null_pipeline.py)."""

from __future__ import annotations

from colnade_spark import read_parquet
from tests.e2e.conftest import NullableUsers, make_nullable_users

DATA = make_nullable_users()
N_AGE_NULL = sum(1 for a in DATA["age"] if a is None)
N_SCORE_NULL = sum(1 for s in DATA["score"] if s is None)


def test_fill_null_score(spark, nullable_users_parquet):
    df = read_parquet(nullable_users_parquet, NullableUsers, spark=spark)
    out = df.with_columns(NullableUsers.score.fill_null(0.0).alias("score"))
    got = {r.id: r.score for r in out.rows()}
    for i, s in zip(DATA["id"], DATA["score"]):
        assert got[i] == (0.0 if s is None else s)


def test_fill_null_then_filter(spark, nullable_users_parquet):
    df = read_parquet(nullable_users_parquet, NullableUsers, spark=spark)
    out = df.with_columns(NullableUsers.age.fill_null(0).alias("age")).filter(
        NullableUsers.age == 0
    )
    assert out.height == N_AGE_NULL


def test_drop_nulls_single_column(spark, nullable_users_parquet):
    df = read_parquet(nullable_users_parquet, NullableUsers, spark=spark)
    assert df.drop_nulls(NullableUsers.age).height == len(DATA["id"]) - N_AGE_NULL


def test_drop_nulls_multiple_columns(spark, nullable_users_parquet):
    df = read_parquet(nullable_users_parquet, NullableUsers, spark=spark)
    want = sum(
        1 for a, s in zip(DATA["age"], DATA["score"]) if a is not None and s is not None
    )
    assert df.drop_nulls(NullableUsers.age, NullableUsers.score).height == want


def test_filter_null_rows(spark, nullable_users_parquet):
    df = read_parquet(nullable_users_parquet, NullableUsers, spark=spark)
    assert df.filter(NullableUsers.age.is_null()).height == N_AGE_NULL


def test_filter_not_null_rows(spark, nullable_users_parquet):
    df = read_parquet(nullable_users_parquet, NullableUsers, spark=spark)
    assert df.filter(NullableUsers.score.is_not_null()).height == (
        len(DATA["id"]) - N_SCORE_NULL
    )


def test_is_null_and_regular_filter(spark, nullable_users_parquet):
    df = read_parquet(nullable_users_parquet, NullableUsers, spark=spark)
    out = df.filter(NullableUsers.score.is_null() & (NullableUsers.id <= 25))
    want = sum(
        1 for i, s in zip(DATA["id"], DATA["score"]) if s is None and i <= 25
    )
    assert out.height == want


def test_full_null_cleanup_pipeline(spark, nullable_users_parquet):
    df = read_parquet(nullable_users_parquet, NullableUsers, spark=spark)
    out = (
        df.with_columns(NullableUsers.score.fill_null(50.0).alias("score"))
        .drop_nulls(NullableUsers.age)
        .filter(NullableUsers.score >= 0.0)
    )
    assert out.height == len(DATA["id"]) - N_AGE_NULL
    assert all(r.score is not None for r in out.rows())
