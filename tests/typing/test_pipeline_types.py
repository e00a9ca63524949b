"""Cross-layer pipeline type tests (mypy --strict / ty).

Must produce zero type errors. Multi-step pipelines spanning schema →
expression → frame → group_by → join → cast_schema, verifying the type
flows across every layer boundary in one expression chain.

(Reference shape: /root/reference/tests/typing/test_pipeline_types.py.)
"""

from typing import Any

from colnade_spark import (
    Column,
    DataFrame,
    Float64,
    Int64,
    LazyFrame,
    Schema,
    Utf8,
    mapped_from,
)


class Users(Schema):
    id: Column[Int64]
    name: Column[Utf8]
    segment: Column[Utf8]
    acctbal: Column[Float64]


class Orders(Schema):
    order_id: Column[Int64]
    user_id: Column[Int64]
    amount: Column[Float64]


class SegmentStats(Schema):
    segment: Column[Utf8]
    total: Column[Float64]


class UserOrder(Schema):
    id: Column[Int64] = mapped_from(Users.id)
    amount: Column[Float64]


# --- Single-frame pipeline: filter → with_columns → group_by → agg → cast --


def check_agg_pipeline(df: DataFrame[Users]) -> DataFrame[SegmentStats]:
    return (
        df.filter(Users.acctbal > 0.0)
        .with_columns((Users.acctbal * 1.1).alias("acctbal"))
        .group_by(Users.segment)
        .agg(Users.acctbal.sum().alias("total"))
        .cast_schema(SegmentStats)
    )


# --- Lazy pipeline keeps laziness until collect ----------------------------


def check_lazy_pipeline(lf: LazyFrame[Users]) -> DataFrame[SegmentStats]:
    lazy_stats: LazyFrame[SegmentStats] = (
        lf.filter(Users.acctbal > 0.0)
        .group_by(Users.segment)
        .agg(Users.acctbal.sum().alias("total"))
        .cast_schema(SegmentStats)
    )
    return lazy_stats.collect()


# --- Join pipeline: join → filter → cast_schema flattens -------------------


def check_join_pipeline(
    users: DataFrame[Users], orders: DataFrame[Orders]
) -> DataFrame[UserOrder]:
    return (
        users.join(orders, on=Users.id == Orders.user_id)
        .filter(Orders.amount > 0.0)
        .cast_schema(UserOrder)
    )


# --- Round-trip: eager → lazy → eager preserves the schema -----------------


def check_lazy_roundtrip(df: DataFrame[Users]) -> DataFrame[Users]:
    return df.lazy().filter(Users.acctbal > 0.0).collect()


# --- Erased mid-pipeline state is the precise frame class ------------------


def check_erased_midpoint(df: DataFrame[Users]) -> DataFrame[SegmentStats]:
    erased: DataFrame[Any] = df.group_by(Users.segment).agg(
        Users.acctbal.sum().alias("total")
    )
    return erased.cast_schema(SegmentStats)


# ---------------------------------------------------------------------------
# Negative regression guards
# ---------------------------------------------------------------------------


def check_neg_pipeline_result_schema(df: DataFrame[Users]) -> None:
    """The end-to-end pipeline's type comes from cast_schema's target."""
    result = (
        df.filter(Users.acctbal > 0.0)
        .group_by(Users.segment)
        .agg(Users.acctbal.sum().alias("total"))
        .cast_schema(SegmentStats)
    )
    _: DataFrame[Users] = result  # type: ignore[assignment]


def check_neg_lazy_pipeline_not_eager(lf: LazyFrame[Users]) -> None:
    result = lf.filter(Users.acctbal > 0.0).cast_schema(Users)
    _: DataFrame[Users] = result  # type: ignore[assignment]
