"""Static type tests for cast_schema / mapped_from (mypy --strict / ty).

Must produce zero type errors. Verifies that cast_schema re-binds the
frame to the TARGET schema parameter (the type flows from the ``target``
argument), on plain frames and joined frames, eager and lazy.

(Reference shape: /root/reference/tests/typing/test_cast_schema.py.)
"""

from colnade_spark import (
    Column,
    DataFrame,
    Float64,
    Int64,
    JoinedDataFrame,
    JoinedLazyFrame,
    LazyFrame,
    Schema,
    Utf8,
    mapped_from,
)


class Users(Schema):
    id: Column[Int64]
    name: Column[Utf8]
    acctbal: Column[Float64]


class Orders(Schema):
    order_id: Column[Int64]
    user_id: Column[Int64]
    amount: Column[Float64]


class Slim(Schema):
    id: Column[Int64]
    name: Column[Utf8]


class Renamed(Schema):
    # mapped_from declares the cast_schema source in the schema itself
    user_name: Column[Utf8] = mapped_from(Users.name)
    id: Column[Int64]


class Combined(Schema):
    id: Column[Int64] = mapped_from(Users.id)
    amount: Column[Float64]


# --- cast_schema returns Frame[Target] -------------------------------------


def check_cast_returns_target_schema(df: DataFrame[Users]) -> DataFrame[Slim]:
    return df.select(Users.id, Users.name).cast_schema(Slim)


def check_cast_lazy_returns_target_schema(lf: LazyFrame[Users]) -> LazyFrame[Slim]:
    return lf.select(Users.id, Users.name).cast_schema(Slim)


def check_cast_with_mapped_from(df: DataFrame[Users]) -> DataFrame[Renamed]:
    return df.cast_schema(Renamed)


def check_cast_with_explicit_mapping(df: DataFrame[Users]) -> DataFrame[Renamed]:
    return df.cast_schema(Renamed, mapping={Renamed.user_name: Users.name})


def check_cast_extra_forbid(df: DataFrame[Slim]) -> DataFrame[Slim]:
    return df.cast_schema(Slim, extra="forbid")


def check_joined_cast_returns_dataframe(
    j: JoinedDataFrame[Users, Orders],
) -> DataFrame[Combined]:
    return j.cast_schema(Combined)


def check_joined_lazy_cast_returns_lazyframe(
    j: JoinedLazyFrame[Users, Orders],
) -> LazyFrame[Combined]:
    return j.cast_schema(Combined)


# ---------------------------------------------------------------------------
# Negative regression guards
# ---------------------------------------------------------------------------


def check_neg_cast_result_is_not_source(df: DataFrame[Users]) -> None:
    """cast_schema(Slim) returns DataFrame[Slim], NOT DataFrame[Users]."""
    result = df.select(Users.id, Users.name).cast_schema(Slim)
    _: DataFrame[Users] = result  # type: ignore[assignment]


def check_neg_cast_eager_not_lazy(df: DataFrame[Users]) -> None:
    result = df.cast_schema(Slim)
    _: LazyFrame[Slim] = result  # type: ignore[assignment]


def check_neg_joined_cast_not_joined(j: JoinedDataFrame[Users, Orders]) -> None:
    """Flattening a join yields a single-schema frame, not a joined one."""
    result = j.cast_schema(Combined)
    _: JoinedDataFrame[Users, Orders] = result  # type: ignore[assignment]
