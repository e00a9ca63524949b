"""E2E: nested (struct / list) columns through parquet → typed pipeline
(reference shape: tests/e2e/test_nested_pipeline.py)."""

from __future__ import annotations

from colnade_spark import read_parquet
from tests.e2e.conftest import (
    Address,
    ListUsers,
    StructUsers,
    make_list_users,
    make_struct_users,
)

STRUCTS = make_struct_users()
LISTS = make_list_users()


def test_read_struct_data(spark, struct_users_parquet):
    df = read_parquet(struct_users_parquet, StructUsers, spark=spark)
    assert df.height == len(STRUCTS["id"])


def test_filter_by_struct_field(spark, struct_users_parquet):
    df = read_parquet(struct_users_parquet, StructUsers, spark=spark)
    out = df.filter(StructUsers.address.field(Address.city) == "Riverton")
    want = {
        i for i, a in zip(STRUCTS["id"], STRUCTS["address"]) if a["city"] == "Riverton"
    }
    assert {r.id for r in out.rows()} == want


def test_struct_field_projection(spark, struct_users_parquet):
    df = read_parquet(struct_users_parquet, StructUsers, spark=spark)
    out = df.with_columns(StructUsers.address.field("street").alias("name"))
    got = {r.id: r.name for r in out.rows()}
    assert got[1] == "100 Main St"


def test_read_list_data(spark, list_users_parquet):
    df = read_parquet(list_users_parquet, ListUsers, spark=spark)
    assert df.height == len(LISTS["id"])


def test_filter_by_list_contains(spark, list_users_parquet):
    df = read_parquet(list_users_parquet, ListUsers, spark=spark)
    out = df.filter(ListUsers.tags.list.contains("admin"))
    want = {i for i, t in zip(LISTS["id"], LISTS["tags"]) if "admin" in t}
    assert {r.id for r in out.rows()} == want


def test_list_len_filter(spark, list_users_parquet):
    df = read_parquet(list_users_parquet, ListUsers, spark=spark)
    out = df.filter(ListUsers.tags.list.len() >= 2)
    want = {i for i, t in zip(LISTS["id"], LISTS["tags"]) if len(t) >= 2}
    assert {r.id for r in out.rows()} == want


def test_list_sum_in_with_columns(spark, list_users_parquet):
    df = read_parquet(list_users_parquet, ListUsers, spark=spark)
    out = df.with_columns(ListUsers.scores.list.sum().alias("scores"))
    got = {r.id: r.scores for r in out.rows()}
    for i, scores in zip(LISTS["id"], LISTS["scores"]):
        assert abs(got[i] - sum(scores)) < 1e-9
