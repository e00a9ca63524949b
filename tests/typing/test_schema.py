"""Static type tests for colnade_spark.schema (mypy --strict / ty).

Must produce zero type errors. Verifies that Schema subclassing, the
``Column[DType]`` annotation pattern, inheritance (including multi-base
mixin schemas), and the schema-bound TypeVars are visible to a type
checker. (Reference shape: /root/reference/tests/typing/test_schema.py.)
"""

from colnade_spark import (
    Column,
    Datetime,
    Float64,
    Int64,
    Schema,
    UInt8,
    Utf8,
)

# --- Schema declaration compiles cleanly -----------------------------------


class Users(Schema):
    id: Column[Int64]
    name: Column[Utf8]
    age: Column[UInt8 | None]
    score: Column[Float64]


class EnrichedUsers(Users):
    normalized_age: Column[Float64]


class HasUserId(Schema):
    user_id: Column[Int64]


class HasTimestamp(Schema):
    created_at: Column[Datetime]


class Events(HasUserId, HasTimestamp):
    event_type: Column[Utf8]


# --- Column access produces Column instances with the declared dtype -------


def check_column_access() -> None:
    _id: Column[Int64] = Users.id
    _name: Column[Utf8] = Users.name
    _age: Column[UInt8 | None] = Users.age
    _ = (_id, _name, _age)


def check_inherited_column_access() -> None:
    # columns flow through single AND multiple inheritance
    _base: Column[Utf8] = EnrichedUsers.name
    _uid: Column[Int64] = Events.user_id
    _ts: Column[Datetime] = Events.created_at
    _ = (_base, _uid, _ts)


# --- Schema and Column usable as types -------------------------------------


def check_types_exist() -> None:
    _s: type[Schema] = Schema
    _c: type[Column[Int64]] = Column
    _ = (_s, _c)


# --- Schema-bound TypeVars are importable ----------------------------------


def check_schema_typevars() -> None:
    from colnade_spark.dataframe import S, S2, S3

    _ = (S, S2, S3)


# --- Introspection classmethods are precisely typed ------------------------


def check_columns_classmethods() -> None:
    cols: dict[str, Column] = Users.columns()
    names: list[str] = Users.column_names()
    _ = (cols, names)


# --- Row construction accepts keyword arguments ----------------------------


def check_row_kwargs_construction() -> None:
    # Schema.Row is a generated frozen dataclass; keyword construction must
    # not be rejected. (Fields are Any-typed — a documented simplification;
    # see test_coverage_matrix.py.)
    row = Users.Row(id=1, name="Alice", age=30, score=9.5)
    _ = row
