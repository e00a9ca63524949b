"""Static type tests for schema-polymorphic functions (mypy --strict / ty).

Must produce zero type errors. Verifies that user code can write functions
generic over the schema parameter and the full frame type flows through —
the core value of ``DataFrame[S]`` with Self-typed operations.

(Reference shape: /root/reference/tests/typing/test_generic_functions.py;
the reference's §7.2/§7.4 Protocol-constrained patterns are a documented
limitation there and are not part of this surface — nominal schemas only.)
"""

from typing import Any, TypeVar

from colnade_spark import (
    Column,
    DataFrame,
    Float64,
    Int64,
    LazyFrame,
    Schema,
    UInt8,
    Utf8,
)

S = TypeVar("S", bound=Schema)


class Users(Schema):
    id: Column[Int64]
    name: Column[Utf8]
    age: Column[UInt8]


class Orders(Schema):
    order_id: Column[Int64]
    amount: Column[Float64]


# --- §7.1 passthrough transforms: S flows through --------------------------


def take_top(df: DataFrame[S], n: int) -> DataFrame[S]:
    return df.limit(n)


def dedupe(df: DataFrame[S]) -> DataFrame[S]:
    return df.unique()


def lazy_pipeline(lf: LazyFrame[S]) -> LazyFrame[S]:
    return lf.limit(100)


def materialize(lf: LazyFrame[S]) -> DataFrame[S]:
    return lf.collect()


def check_passthrough_users(df: DataFrame[Users]) -> DataFrame[Users]:
    return take_top(dedupe(df), 10)


def check_passthrough_orders(df: DataFrame[Orders]) -> DataFrame[Orders]:
    return take_top(df, 5)


def check_passthrough_lazy(lf: LazyFrame[Users]) -> DataFrame[Users]:
    return materialize(lazy_pipeline(lf))


# --- Column-parameterized transforms ---------------------------------------


def filtered_by_flag(df: DataFrame[S], flag: Column[Any]) -> DataFrame[S]:
    # generic helper taking any column of the frame's schema; the runtime
    # guard enforces schema membership, the static type keeps S flowing
    return df.drop_nulls(flag)


def check_column_parameterized(df: DataFrame[Users]) -> DataFrame[Users]:
    return filtered_by_flag(df, Users.age)


# ---------------------------------------------------------------------------
# Negative regression guards
# ---------------------------------------------------------------------------


def check_neg_passthrough_keeps_exact_schema(df: DataFrame[Users]) -> None:
    """A generic S → S function must NOT come back as a different schema."""
    result = take_top(df, 1)
    _: DataFrame[Orders] = result  # type: ignore[assignment]


def check_neg_passthrough_not_lazy(df: DataFrame[Users]) -> None:
    result = dedupe(df)
    _: LazyFrame[Users] = result  # type: ignore[assignment]
