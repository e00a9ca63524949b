"""Map dtype (EXTENSION — the reference dtype set has no Map, SURVEY §1.2):
declaration, conversion, accessor semantics, and dtype gating. The accessor
surface is deliberately deterministic: get/contains/len plus SORTED keys();
raw entry order is never exposed (it is engine-defined)."""

from __future__ import annotations

import pytest

from colnade_spark.dataframe import DataFrame
from colnade_spark.dtypes import Int64, Map, Utf8
from colnade_spark.schema import Column, Schema


class Tagged(Schema):
    id: Column[Int64]
    tags: Column[Map[Utf8, Int64] | None]


def _frame(spark) -> DataFrame[Tagged]:
    return DataFrame.from_dict(
        {
            "id": [1, 2, 3],
            "tags": [{"a": 10, "b": 20}, {}, None],
        },
        Tagged,
    )


def test_map_roundtrip_and_len(spark):
    f = _frame(spark).with_columns(Tagged.tags.map.len().alias("n"))
    got = {r.id: r.n for r in f.native.collect()}
    assert got == {1: 2, 2: 0, 3: None}


def test_map_get_missing_and_null(spark):
    f = _frame(spark).with_columns(
        Tagged.tags.map.get("a").alias("va"),
        Tagged.tags.map.get("zz").alias("vz"),
    )
    got = {r.id: (r.va, r.vz) for r in f.native.collect()}
    assert got[1] == (10, None)  # present / missing key
    assert got[2] == (None, None)  # empty map
    assert got[3] == (None, None)  # null map propagates


def test_map_contains_and_sorted_keys(spark):
    f = _frame(spark).with_columns(
        Tagged.tags.map.contains("b").alias("has_b"),
        Tagged.tags.map.keys().alias("ks"),
    )
    got = {r.id: (r.has_b, r.ks) for r in f.native.collect()}
    assert got[1] == (True, ["a", "b"])
    assert got[2] == (False, [])
    assert got[3] == (None, None)


def test_map_keys_chain_into_list_ops(spark):
    f = _frame(spark).with_columns(
        Tagged.tags.map.keys().list.join("|").alias("tag_str")
    )
    got = {r.id: r.tag_str for r in f.native.collect()}
    assert got[1] == "a|b" and got[2] == ""


def test_map_accessor_gated_by_dtype(spark):
    with pytest.raises(TypeError, match="not supported"):
        Tagged.id.map  # noqa: B018 — accessor itself must raise


def test_bare_map_rejected():
    from colnade_spark.conversion import to_spark_type
    from colnade_spark.dtypes import Map as BareMap
    from colnade_spark.errors import SchemaError

    with pytest.raises(SchemaError):
        to_spark_type(BareMap)
