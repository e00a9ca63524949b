"""Nested struct/list execution (model: reference tests/e2e/test_nested_pipeline.py)."""

from __future__ import annotations

from colnade_spark import DataFrame
from colnade_spark.dtypes import Float64, Int64, List, Struct, Utf8
from colnade_spark.schema import Column, Schema


class Address(Schema):
    street: Column[Utf8]
    city: Column[Utf8]


class Profile(Schema):
    id: Column[Int64]
    address: Column[Struct[Address]]


class ListUser(Schema):
    id: Column[Int64]
    tags: Column[List[Utf8]]
    scores: Column[List[Float64]]


def test_struct_field_access(spark):
    df = DataFrame.from_dict(
        {
            "id": [1, 2],
            "address": [
                {"street": "100 Main St", "city": "New York"},
                {"street": "200 Elm St", "city": "Boston"},
            ],
        },
        Profile,
    )
    out = df.filter(Profile.address.field(Address.city) == "New York")
    assert out.height == 1
    proj = df.with_columns(Profile.address.field("city").alias("city_name"))
    assert {r["city_name"] for r in proj.native.select("city_name").collect()} == {
        "New York",
        "Boston",
    }


def test_list_ops_execution(spark):
    df = DataFrame.from_dict(
        {
            "id": [1, 2, 3],
            "tags": [["admin", "user"], ["viewer"], []],
            "scores": [[1.0, 2.0, 3.0], [10.0], []],
        },
        ListUser,
    )
    out = df.with_columns(
        ListUser.tags.list.len().alias("n_tags"),
        ListUser.tags.list.get(0).alias("first_tag"),
        ListUser.tags.list.contains("admin").alias("is_admin"),
        ListUser.scores.list.sum().alias("s_sum"),
        ListUser.scores.list.mean().alias("s_mean"),
        ListUser.scores.list.min().alias("s_min"),
        ListUser.scores.list.max().alias("s_max"),
    )
    rows = {r.id: r for r in out.native.collect()}
    assert rows[1].n_tags == 2 and rows[1].first_tag == "admin" and rows[1].is_admin
    assert rows[1].s_sum == 6.0 and rows[1].s_mean == 2.0
    assert rows[1].s_min == 1.0 and rows[1].s_max == 3.0
    assert rows[3].n_tags == 0
    assert rows[3].s_mean is None  # empty list mean -> null
    assert rows[3].first_tag is None  # OOB get -> null
