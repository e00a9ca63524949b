"""Structural + FULL validation against Spark (model: reference
tests/integration/test_field_validation_*.py). The key scale property: the
clean path issues ONE aggregation job for all constraints."""

from __future__ import annotations

import pytest

from colnade_spark import DataFrame, Field, schema_check, set_validation
from colnade_spark.dtypes import Float64, Int64, UInt32, Utf8
from colnade_spark.errors import SchemaError
from colnade_spark.schema import Column, Schema
from colnade_spark.validation import ValidationLevel


class Users(Schema):
    id: Column[Int64] = Field(unique=True)
    name: Column[Utf8] = Field(min_length=1, max_length=100)
    age: Column[UInt32] = Field(ge=0, le=150)
    score: Column[Float64 | None] = Field(ge=0.0, le=100.0)


class Ranged(Schema):
    lo: Column[Int64]
    hi: Column[Int64]

    @schema_check
    def ordered(cls):
        return cls.lo <= cls.hi


CLEAN = {
    "id": [1, 2, 3],
    "name": ["a", "b", "c"],
    "age": [10, 20, 30],
    "score": [1.0, None, 99.0],
}


def test_validate_clean_passes(spark):
    DataFrame.from_dict(CLEAN, Users).validate()


def test_unique_violation(spark):
    df = DataFrame.from_dict({**CLEAN, "id": [1, 1, 2]}, Users)
    with pytest.raises(SchemaError) as ei:
        df.validate()
    v = next(x for x in ei.value.value_violations if x.constraint == "unique")
    assert v.column == "id" and v.got_count == 1
    assert 1 in v.sample_values


def test_bound_violations_with_samples(spark):
    df = DataFrame.from_dict({**CLEAN, "score": [150.0, -5.0, 50.0]}, Users)
    with pytest.raises(SchemaError) as ei:
        df.validate()
    kinds = {(v.column, v.constraint): v for v in ei.value.value_violations}
    assert kinds[("score", "le")].got_count == 1
    assert 150.0 in kinds[("score", "le")].sample_values
    assert kinds[("score", "ge")].got_count == 1


def test_length_violation(spark):
    df = DataFrame.from_dict({**CLEAN, "name": ["", "ok", "x"]}, Users)
    with pytest.raises(SchemaError) as ei:
        df.validate()
    assert any(
        v.column == "name" and v.constraint == "min_length"
        for v in ei.value.value_violations
    )


def test_unsigned_negative_caught(spark):
    # UInt32 is widened to LongType on Spark; FULL validation adds ge=0
    df = DataFrame.from_dict({**CLEAN, "age": [-1, 20, 30]}, Users)
    with pytest.raises(SchemaError) as ei:
        df.validate()
    assert any(
        v.column == "age" and v.constraint == "ge" for v in ei.value.value_violations
    )


def test_schema_check_invariant(spark):
    ok = DataFrame.from_dict({"lo": [1, 2], "hi": [2, 3]}, Ranged)
    ok.validate()
    bad = DataFrame.from_dict({"lo": [5, 2], "hi": [2, 3]}, Ranged)
    with pytest.raises(SchemaError) as ei:
        bad.validate()
    v = next(x for x in ei.value.value_violations)
    assert v.constraint == "schema_check:ordered" and v.got_count == 1


def test_structural_missing_and_extra_columns(spark):
    class Slim(Schema):
        id: Column[Int64]
        nope: Column[Utf8]

    df = DataFrame.from_dict(CLEAN, Users)
    err = df._backend.validate_schema(df.native, Slim)
    assert "nope" in err.missing_columns
    assert set(err.extra_columns) >= {"name", "age", "score"}


def test_structural_null_in_non_nullable(spark):
    class Strict(Schema):
        id: Column[Int64]
        name: Column[Utf8]  # declared non-nullable

    from colnade_spark.session import get_spark

    sp = get_spark()
    raw = sp.createDataFrame([(1, "a"), (2, None)], ["id", "name"])
    df = DataFrame(raw, Strict)
    err = df._backend.validate_schema(df.native, Strict)
    assert any(v.column == "name" and v.null_count == 1 for v in err.null_violations)


def test_boundary_validation_toggle(spark):
    set_validation(ValidationLevel.FULL)
    try:
        with pytest.raises(SchemaError):
            DataFrame.from_dict({**CLEAN, "id": [1, 1, 2]}, Users)
        set_validation(ValidationLevel.OFF)
        DataFrame.from_dict({**CLEAN, "id": [1, 1, 2]}, Users)  # no raise
    finally:
        set_validation(ValidationLevel.OFF)


def test_pattern_and_isin(spark):
    class Coded(Schema):
        code: Column[Utf8] = Field(pattern="^[A-Z]{3}", isin=["ABC-1", "XYZ-2", "bad"])

    ok = DataFrame.from_dict({"code": ["ABC-1", "XYZ-2"]}, Coded)
    ok.validate()
    bad = DataFrame.from_dict({"code": ["ABC-1", "bad"]}, Coded)
    with pytest.raises(SchemaError) as ei:
        bad.validate()
    assert any(v.constraint == "pattern" for v in ei.value.value_violations)


def test_assert_non_null(spark):
    class S(Schema):
        a: Column[Float64 | None]

    df = DataFrame.from_dict({"a": [1.0, None]}, S)
    with pytest.raises(SchemaError, match="assert_non_null"):
        df.with_columns((S.a.assert_non_null() + 1).alias("b"))
    clean = DataFrame.from_dict({"a": [1.0, 2.0]}, S)
    clean.with_columns((S.a.assert_non_null() + 1).alias("b"))
