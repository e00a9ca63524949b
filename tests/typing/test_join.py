"""Static type tests for join() and the Joined frames (mypy --strict / ty).

Must produce zero type errors. Verifies:
- DataFrame.join → JoinedDataFrame[S, S2]; LazyFrame.join → JoinedLazyFrame
- Joined row-level ops (filter/sort/limit/with_columns) return Self
- JoinedLazyFrame.collect → JoinedDataFrame[S, S2]
- Negative guards: Joined frames are not plain frames; eager/lazy joins
  don't mix statically; schema params are invariant.

(Reference shape: /root/reference/tests/typing/test_join.py.)
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
)


class Users(Schema):
    id: Column[Int64]
    name: Column[Utf8]


class Orders(Schema):
    order_id: Column[Int64]
    user_id: Column[Int64]
    amount: Column[Float64]


class Payments(Schema):
    payment_id: Column[Int64]
    order_id: Column[Int64]


# --- join() returns the precise two-schema frame ---------------------------


def check_join_returns_joined_dataframe(
    users: DataFrame[Users], orders: DataFrame[Orders]
) -> JoinedDataFrame[Users, Orders]:
    return users.join(orders, on=Users.id == Orders.user_id)


def check_lazy_join_returns_joined_lazyframe(
    users: LazyFrame[Users], orders: LazyFrame[Orders]
) -> JoinedLazyFrame[Users, Orders]:
    return users.join(orders, on=Users.id == Orders.user_id)


def check_join_how_kwarg(
    users: DataFrame[Users], orders: DataFrame[Orders]
) -> JoinedDataFrame[Users, Orders]:
    return users.join(orders, on=Users.id == Orders.user_id, how="left")


def check_cross_join_no_condition(
    users: DataFrame[Users], orders: DataFrame[Orders]
) -> JoinedDataFrame[Users, Orders]:
    return users.join(orders, how="cross")


# --- Joined row-level ops return Self --------------------------------------


def check_joined_filter(
    j: JoinedDataFrame[Users, Orders],
) -> JoinedDataFrame[Users, Orders]:
    return j.filter(Orders.amount > 0.0)


def check_joined_sort(
    j: JoinedDataFrame[Users, Orders],
) -> JoinedDataFrame[Users, Orders]:
    return j.sort(Orders.amount.desc())


def check_joined_limit(
    j: JoinedDataFrame[Users, Orders],
) -> JoinedDataFrame[Users, Orders]:
    return j.limit(10)


def check_joined_with_columns(
    j: JoinedDataFrame[Users, Orders],
) -> JoinedDataFrame[Users, Orders]:
    return j.with_columns((Orders.amount * 2.0).alias("amount2"))


def check_joined_lazy_collect(
    j: JoinedLazyFrame[Users, Orders],
) -> JoinedDataFrame[Users, Orders]:
    return j.collect()


def check_joined_height(j: JoinedDataFrame[Users, Orders]) -> int:
    return j.height


# ---------------------------------------------------------------------------
# Negative regression guards
# ---------------------------------------------------------------------------


def check_neg_joined_not_dataframe(j: JoinedDataFrame[Users, Orders]) -> None:
    """A joined frame is NOT a plain DataFrame — cast_schema first."""
    _: DataFrame[Users] = j  # type: ignore[assignment]


def check_neg_joined_lazy_not_lazyframe(j: JoinedLazyFrame[Users, Orders]) -> None:
    _: LazyFrame[Users] = j  # type: ignore[assignment]


def check_neg_joined_schema_order_matters(
    j: JoinedDataFrame[Users, Orders],
) -> None:
    """JoinedDataFrame[Users, Orders] ≠ JoinedDataFrame[Orders, Users]."""
    _: JoinedDataFrame[Orders, Users] = j  # type: ignore[assignment]


def check_neg_joined_schema_invariant(
    j: JoinedDataFrame[Users, Orders],
) -> None:
    _: JoinedDataFrame[Users, Payments] = j  # type: ignore[assignment]


def check_neg_join_rejects_lazy_other(
    users: DataFrame[Users], orders: LazyFrame[Orders]
) -> None:
    """Eager.join(lazy) is a static error (runtime TypeError too)."""
    users.join(orders, on=Users.id == Orders.user_id)  # type: ignore[arg-type]


def check_neg_join_result_preserves_classes(
    users: DataFrame[Users], orders: DataFrame[Orders]
) -> None:
    """Eager join result is NOT a JoinedLazyFrame."""
    result = users.join(orders, on=Users.id == Orders.user_id)
    _: JoinedLazyFrame[Users, Orders] = result  # type: ignore[assignment]
