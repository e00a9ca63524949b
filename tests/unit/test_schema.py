"""Schema metaclass + Row generation + constraints unit tests."""

from __future__ import annotations

import pytest

from colnade_spark.constraints import Field, schema_check
from colnade_spark.dtypes import Float64, Int64, Struct, UInt32, Utf8
from colnade_spark.errors import SchemaError
from colnade_spark.schema import Column, Schema, mapped_from
from colnade_spark.validation import ValidationLevel, set_validation


class Address(Schema):
    street: Column[Utf8]
    city: Column[Utf8]


class Users(Schema):
    id: Column[Int64] = Field(unique=True)
    name: Column[Utf8] = Field(min_length=1, max_length=100)
    age: Column[UInt32] = Field(ge=0, le=150)
    score: Column[Float64 | None]


def test_columns_registered_in_order():
    assert list(Users._columns) == ["id", "name", "age", "score"]


def test_nullability_from_union():
    assert Users.score.nullable is True
    assert Users.id.nullable is False


def test_field_info_attached():
    assert Users.id._field_info.unique is True
    assert Users.age._field_info.ge == 0


def test_row_dataclass():
    row = Users.Row(id=1, name="a", age=30)
    assert row.score is None
    with pytest.raises(Exception):
        Users.Row(id=1)  # missing required fields


def test_row_frozen():
    row = Users.Row(id=1, name="a", age=30)
    with pytest.raises(Exception):
        row.id = 2


def test_inheritance_merges_columns():
    class Extended(Users):
        extra: Column[Utf8]

    assert list(Extended._columns) == ["id", "name", "age", "score", "extra"]
    # nominal typing: subclass is a distinct schema class
    assert Extended is not Users


def test_nested_struct_dtype():
    class Profile(Schema):
        id: Column[Int64]
        address: Column[Struct[Address]]

    assert Profile.address.dtype.schema is Address
    fa = Profile.address.field(Address.city)
    assert fa.field_name == "city"


def test_mapped_from_marker():
    class Target(Schema):
        total: Column[Float64] = mapped_from("amount")

    assert Target.total._mapped_from.source_name == "amount"


def test_schema_check_registered():
    class Ranged(Schema):
        lo: Column[Int64]
        hi: Column[Int64]

        @schema_check
        def ordered(cls):
            return cls.lo <= cls.hi

    assert [c.name for c in Ranged._schema_checks] == ["ordered"]


def test_literal_type_check_when_validation_on():
    set_validation(ValidationLevel.STRUCTURAL)
    with pytest.raises(SchemaError):
        Users.id > "not an int"
    with pytest.raises(SchemaError):
        Users.id == True  # noqa: E712 - bool not valid for Int64
    # OK when validation off
    set_validation(ValidationLevel.OFF)
    Users.id > "not an int"
