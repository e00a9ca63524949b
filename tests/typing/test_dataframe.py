"""Static type tests for DataFrame[S] / LazyFrame[S] / GroupBy (mypy / ty).

Must produce zero type errors. Covers:
- Schema-preserving ops return Self (class AND schema param survive)
- Schema-transforming ops erase to the precise frame class with Any schema
  (DataFrame.select → DataFrame[Any], never bare Any)
- lazy()/collect() conversions preserve the schema parameter
- GroupBy[S] / LazyGroupBy[S] distinction
- item() dtype-directed overloads
- concat() overloads
- Negative regression guards (suppressed lines MUST error; if a return
  type regresses to Any the suppression becomes unused and
  warn-unused-ignores / ty's equivalent fails the check)

(Reference shape: /root/reference/tests/typing/test_dataframe.py.)
"""

from datetime import date, datetime, timedelta
from typing import Any

from colnade_spark import (
    Binary,
    Bool,
    Column,
    DataFrame,
    Date,
    Datetime,
    Duration,
    Float64,
    GroupBy,
    Int64,
    JoinedDataFrame,
    LazyFrame,
    LazyGroupBy,
    Schema,
    Time,
    UInt8,
    Utf8,
    concat,
)

# --- Schema definitions ----------------------------------------------------


class Users(Schema):
    id: Column[Int64]
    name: Column[Utf8]
    age: Column[UInt8]


class AgeStats(Schema):
    age: Column[UInt8]
    count: Column[Int64]


class ItemTypes(Schema):
    score: Column[Float64]
    maybe_age: Column[UInt8 | None]
    flag: Column[Bool]
    blob: Column[Binary]
    day: Column[Date]
    ts: Column[Datetime]
    dur: Column[Duration]
    tod: Column[Time]
    maybe_name: Column[Utf8 | None]


# --- Schema-preserving ops return DataFrame[Users] -------------------------


def check_filter_preserves_schema(df: DataFrame[Users]) -> DataFrame[Users]:
    return df.filter(Users.age > 18)


def check_filter_equality_predicate(df: DataFrame[Users]) -> DataFrame[Users]:
    # `col == value` must type-check as a filter predicate. Column.__eq__
    # is deliberately untyped (Any): same-schema == is a predicate,
    # cross-schema == a JoinCondition, and the dispatch is runtime schema
    # identity, which no checker can see (test_coverage_matrix.py row 11).
    return df.filter(Users.age == 30)


def check_filter_combined_predicate(df: DataFrame[Users]) -> DataFrame[Users]:
    return df.filter((Users.age > 18) & (Users.name != "x"))


def check_sort_preserves_schema(df: DataFrame[Users]) -> DataFrame[Users]:
    return df.sort(Users.name)


def check_sort_expr_preserves_schema(df: DataFrame[Users]) -> DataFrame[Users]:
    return df.sort(Users.age.desc(), Users.id.asc())


def check_limit_preserves_schema(df: DataFrame[Users]) -> DataFrame[Users]:
    return df.limit(10)


def check_head_preserves_schema(df: DataFrame[Users]) -> DataFrame[Users]:
    return df.head()


def check_tail_preserves_schema(df: DataFrame[Users]) -> DataFrame[Users]:
    return df.tail(5)


def check_sample_preserves_schema(df: DataFrame[Users]) -> DataFrame[Users]:
    return df.sample(5)


def check_unique_preserves_schema(df: DataFrame[Users]) -> DataFrame[Users]:
    return df.unique(Users.name)


def check_drop_nulls_preserves_schema(df: DataFrame[Users]) -> DataFrame[Users]:
    return df.drop_nulls(Users.name)


def check_with_columns_preserves_schema(df: DataFrame[Users]) -> DataFrame[Users]:
    return df.with_columns((Users.age + 1).alias("age"))


def check_validate_preserves_schema(df: DataFrame[Users]) -> DataFrame[Users]:
    return df.validate()


def check_with_raw_preserves_schema(df: DataFrame[Users]) -> DataFrame[Users]:
    return df.with_raw(lambda d: d)


# --- LazyFrame schema-preserving ops ---------------------------------------


def check_lazy_filter(lf: LazyFrame[Users]) -> LazyFrame[Users]:
    return lf.filter(Users.age > 18)


def check_lazy_sort(lf: LazyFrame[Users]) -> LazyFrame[Users]:
    return lf.sort(Users.name)


def check_lazy_limit(lf: LazyFrame[Users]) -> LazyFrame[Users]:
    return lf.limit(10)


def check_lazy_unique(lf: LazyFrame[Users]) -> LazyFrame[Users]:
    return lf.unique(Users.name)


def check_lazy_drop_nulls(lf: LazyFrame[Users]) -> LazyFrame[Users]:
    return lf.drop_nulls(Users.name)


def check_lazy_with_columns(lf: LazyFrame[Users]) -> LazyFrame[Users]:
    return lf.with_columns((Users.age + 1).alias("age"))


def check_lazy_validate(lf: LazyFrame[Users]) -> LazyFrame[Users]:
    return lf.validate()


# --- Schema-transforming ops erase to Frame[Any], keeping the class --------


def check_select_erases_to_dataframe_any(df: DataFrame[Users]) -> DataFrame[Any]:
    # DataFrame[Any] is assignable to DataFrame[Any]; the frame CLASS is
    # statically retained (select on a DataFrame never yields a LazyFrame)
    return df.select(Users.id, Users.name)


def check_lazy_select_erases_to_lazyframe_any(
    lf: LazyFrame[Users],
) -> LazyFrame[Any]:
    return lf.select(Users.id)


def check_agg_erases_to_dataframe_any(df: DataFrame[Users]) -> DataFrame[Any]:
    return df.agg(Users.age.mean().alias("avg_age"))


def check_lazy_agg_erases(lf: LazyFrame[Users]) -> LazyFrame[Any]:
    return lf.agg(Users.age.mean().alias("avg_age"))


# --- Conversion preserves schema -------------------------------------------


def check_lazy_conversion(df: DataFrame[Users]) -> LazyFrame[Users]:
    return df.lazy()


def check_collect_conversion(lf: LazyFrame[Users]) -> DataFrame[Users]:
    return lf.collect()


# --- GroupBy types ---------------------------------------------------------


def check_group_by_type(df: DataFrame[Users]) -> GroupBy[Users]:
    return df.group_by(Users.age)


def check_lazy_group_by_type(lf: LazyFrame[Users]) -> LazyGroupBy[Users]:
    return lf.group_by(Users.age)


def check_group_agg_returns_dataframe(df: DataFrame[Users]) -> DataFrame[Any]:
    return df.group_by(Users.age).agg(Users.id.count().alias("n"))


def check_lazy_group_agg_returns_lazyframe(lf: LazyFrame[Users]) -> LazyFrame[Any]:
    return lf.group_by(Users.age).agg(Users.id.count().alias("n"))


# --- Introspection ---------------------------------------------------------


def check_height_type(df: DataFrame[Users]) -> int:
    return df.height


def check_len_type(df: DataFrame[Users]) -> int:
    return len(df)


def check_width_type(df: DataFrame[Users]) -> int:
    return df.width


def check_lazy_width_type(lf: LazyFrame[Users]) -> int:
    return lf.width


def check_shape_type(df: DataFrame[Users]) -> tuple[int, int]:
    return df.shape


def check_is_empty_type(df: DataFrame[Users]) -> bool:
    return df.is_empty()


# --- item() dtype-directed overloads ---------------------------------------


def check_item_int(df: DataFrame[Users]) -> int:
    return df.item(Users.age)


def check_item_str(df: DataFrame[Users]) -> str:
    return df.item(Users.name)


def check_item_float(df: DataFrame[ItemTypes]) -> float:
    return df.item(ItemTypes.score)


def check_item_bool(df: DataFrame[ItemTypes]) -> bool:
    return df.item(ItemTypes.flag)


def check_item_bytes(df: DataFrame[ItemTypes]) -> bytes:
    return df.item(ItemTypes.blob)


def check_item_date(df: DataFrame[ItemTypes]) -> date:
    return df.item(ItemTypes.day)


def check_item_datetime(df: DataFrame[ItemTypes]) -> datetime:
    return df.item(ItemTypes.ts)


def check_item_duration(df: DataFrame[ItemTypes]) -> timedelta:
    return df.item(ItemTypes.dur)


def check_item_time_is_int(df: DataFrame[ItemTypes]) -> int:
    # DIVERGENCE (SURVEY.md §1.2): Spark has no TIME type; Time maps to
    # Long microseconds-since-midnight, so item() yields int, not
    # datetime.time as in the reference.
    return df.item(ItemTypes.tod)


def check_item_nullable_int(df: DataFrame[ItemTypes]) -> int | None:
    return df.item(ItemTypes.maybe_age)


def check_item_nullable_str(df: DataFrame[ItemTypes]) -> str | None:
    return df.item(ItemTypes.maybe_name)


def check_item_no_arg_is_any(df: DataFrame[Users]) -> None:
    _int: int = df.item()
    _str: str = df.item()
    _ = (_int, _str)


def check_item_str_name_is_any(df: DataFrame[Users]) -> None:
    _int: int = df.item("age")
    _ = _int


# --- concat() overloads ----------------------------------------------------


def check_concat_dataframes(
    df1: DataFrame[Users], df2: DataFrame[Users]
) -> DataFrame[Users]:
    return concat([df1, df2])


def check_concat_lazyframes(
    lf1: LazyFrame[Users], lf2: LazyFrame[Users]
) -> LazyFrame[Users]:
    return concat([lf1, lf2])


# ---------------------------------------------------------------------------
# Negative type tests — regression guards.
#
# Each suppressed line MUST produce a type error. If types regress (e.g. a
# return type widens to Any), the error disappears, the suppression becomes
# unused, and warn-unused-ignores (mypy) / unused-ignore-comment (ty)
# fails the check.
# ---------------------------------------------------------------------------


def check_neg_lazyframe_not_dataframe(lf: LazyFrame[Users]) -> None:
    """LazyFrame[Users] is NOT assignable to DataFrame[Users]."""
    _: DataFrame[Users] = lf  # type: ignore[assignment]


def check_neg_dataframe_not_lazyframe(df: DataFrame[Users]) -> None:
    """DataFrame[Users] is NOT assignable to LazyFrame[Users]."""
    _: LazyFrame[Users] = df  # type: ignore[assignment]


def check_neg_frame_schema_invariant(df: DataFrame[Users]) -> None:
    """DataFrame[Users] is NOT assignable to DataFrame[AgeStats]."""
    _: DataFrame[AgeStats] = df  # type: ignore[assignment]


def check_neg_filter_preserves_exact_schema(df: DataFrame[Users]) -> None:
    """filter() returns DataFrame[Users] — NOT Any, NOT DataFrame[AgeStats]."""
    result = df.filter(Users.age > 18)
    _: DataFrame[AgeStats] = result  # type: ignore[assignment]


def check_neg_sort_preserves_exact_schema(df: DataFrame[Users]) -> None:
    result = df.sort(Users.name)
    _: DataFrame[AgeStats] = result  # type: ignore[assignment]


def check_neg_with_columns_preserves_exact_schema(df: DataFrame[Users]) -> None:
    result = df.with_columns((Users.age + 1).alias("age"))
    _: DataFrame[AgeStats] = result  # type: ignore[assignment]


def check_neg_tail_preserves_exact_schema(df: DataFrame[Users]) -> None:
    result = df.tail(3)
    _: DataFrame[AgeStats] = result  # type: ignore[assignment]


def check_neg_lazy_filter_preserves_exact_schema(lf: LazyFrame[Users]) -> None:
    result = lf.filter(Users.age > 18)
    _: LazyFrame[AgeStats] = result  # type: ignore[assignment]


def check_neg_lazy_preserves_schema(df: DataFrame[Users]) -> None:
    result = df.lazy()
    _: LazyFrame[AgeStats] = result  # type: ignore[assignment]


def check_neg_collect_preserves_schema(lf: LazyFrame[Users]) -> None:
    result = lf.collect()
    _: DataFrame[AgeStats] = result  # type: ignore[assignment]


def check_neg_validate_preserves_exact_schema(df: DataFrame[Users]) -> None:
    result = df.validate()
    _: DataFrame[AgeStats] = result  # type: ignore[assignment]


def check_neg_select_not_lazyframe(df: DataFrame[Users]) -> None:
    """select() on a DataFrame returns DataFrame[Any], NOT a LazyFrame."""
    result = df.select(Users.id)
    _: LazyFrame[Users] = result  # type: ignore[assignment]


def check_neg_groupby_schema_invariant(gb: GroupBy[Users]) -> None:
    """GroupBy[Users] is NOT assignable to GroupBy[AgeStats]."""
    _: GroupBy[AgeStats] = gb  # type: ignore[assignment]


def check_neg_groupby_not_dataframe(gb: GroupBy[Users]) -> None:
    """GroupBy[Users] is NOT assignable to DataFrame[Users]."""
    _: DataFrame[Users] = gb  # type: ignore[assignment]


def check_neg_lazy_groupby_not_groupby(lgb: LazyGroupBy[Users]) -> None:
    """LazyGroupBy and GroupBy are sibling classes, not substitutable."""
    _: GroupBy[Users] = lgb  # type: ignore[assignment]


def check_neg_group_agg_not_lazyframe(df: DataFrame[Users]) -> None:
    result = df.group_by(Users.age).agg(Users.id.count().alias("n"))
    _: LazyFrame[Users] = result  # type: ignore[assignment]


def check_neg_height_not_str(df: DataFrame[Users]) -> None:
    _: str = df.height  # type: ignore[assignment]


def check_neg_shape_not_triple(df: DataFrame[Users]) -> None:
    _: tuple[int, int, int] = df.shape  # type: ignore[assignment]


def check_neg_is_empty_not_str(df: DataFrame[Users]) -> None:
    _: str = df.is_empty()  # type: ignore[assignment]


def check_neg_item_int_not_str(df: DataFrame[Users]) -> None:
    """item(Column[UInt8]) returns int, NOT str."""
    result = df.item(Users.age)
    _: str = result  # type: ignore[assignment]


def check_neg_item_str_not_int(df: DataFrame[Users]) -> None:
    result = df.item(Users.name)
    _: int = result  # type: ignore[assignment]


def check_neg_item_float_not_int(df: DataFrame[ItemTypes]) -> None:
    result = df.item(ItemTypes.score)
    _: int = result  # type: ignore[assignment]


def check_neg_item_nullable_not_plain(df: DataFrame[ItemTypes]) -> None:
    """item(Column[UInt8 | None]) returns int | None, NOT int."""
    result = df.item(ItemTypes.maybe_age)
    _: int = result  # type: ignore[assignment]


def check_neg_concat_preserves_exact_schema(
    df1: DataFrame[Users], df2: DataFrame[Users]
) -> None:
    result = concat([df1, df2])
    _: DataFrame[AgeStats] = result  # type: ignore[assignment]


def check_neg_concat_dataframes_not_lazy(
    df1: DataFrame[Users], df2: DataFrame[Users]
) -> None:
    result = concat([df1, df2])
    _: LazyFrame[Users] = result  # type: ignore[assignment]


def check_neg_sort_rejects_str(df: DataFrame[Users]) -> None:
    """sort() takes Column | SortExpr — a bare str is a static error."""
    df.sort("name")  # type: ignore[arg-type]


def check_neg_with_columns_rejects_unaliased(df: DataFrame[Users]) -> None:
    """with_columns() requires AliasedExpr — a bare Column is rejected."""
    df.with_columns(Users.age)  # type: ignore[arg-type]


# --- filtering joins / grouping sets / melt (extension surface) ------------


class Orders2(Schema):
    user_id: Column[Int64]
    total: Column[Float64]


def check_semi_join_preserves_schema(
    df: DataFrame[Users], other: DataFrame[Orders2]
) -> None:
    """semi/anti joins are filtering joins: the result keeps S (not a
    JoinedDataFrame, not Any)."""
    result = df.semi_join(other, Users.id == Orders2.user_id)
    _: DataFrame[Users] = result


def check_anti_join_preserves_schema_lazy(
    lf: LazyFrame[Users], other: LazyFrame[Orders2]
) -> None:
    result = lf.anti_join(other, Users.id == Orders2.user_id)
    _: LazyFrame[Users] = result


def check_cube_returns_groupby(df: DataFrame[Users]) -> None:
    gb: GroupBy[Users] = df.cube(Users.age)
    result = gb.agg(Users.id.count().alias(AgeStats.count))
    _: DataFrame[Any] = result


def check_rollup_returns_lazy_groupby(lf: LazyFrame[Users]) -> None:
    gb: LazyGroupBy[Users] = lf.rollup(Users.age)
    result = gb.agg(Users.id.count().alias(AgeStats.count))
    _: LazyFrame[Any] = result


def check_melt_erases_schema(df: DataFrame[Users]) -> None:
    result = df.melt([Users.id], [Users.age])
    _: DataFrame[Any] = result


def check_neg_semi_join_result_not_joined(
    df: DataFrame[Users], other: DataFrame[Orders2]
) -> None:
    result = df.semi_join(other, Users.id == Orders2.user_id)
    _: DataFrame[Orders2] = result  # type: ignore[assignment]


# --- set ops / pivot / cumulative windows (extension surface) --------------


def check_intersect_preserves_schema(
    a: DataFrame[Users], b: DataFrame[Users]
) -> None:
    """Set ops are schema-preserving: DataFrame[S] x DataFrame[S] -> S."""
    result = a.intersect(b)
    _: DataFrame[Users] = result


def check_except_preserves_schema_lazy(
    a: LazyFrame[Users], b: LazyFrame[Users]
) -> None:
    result = a.except_(b, all=True)
    _: LazyFrame[Users] = result


def check_pivot_returns_pivoted_groupby(df: DataFrame[Users]) -> None:
    from colnade_spark import PivotedGroupBy

    pgb: PivotedGroupBy[Users] = df.group_by(Users.id).pivot(Users.name, ["a", "b"])
    result = pgb.agg(Users.age.sum().alias("s"))
    _: DataFrame[Any] = result


def check_cum_sum_is_window_expr(df: DataFrame[Users]) -> None:
    from colnade_spark import cum_sum

    result = df.with_columns(
        cum_sum(Users.age, partition_by=Users.name, order_by=Users.id).alias("run")
    )
    _: DataFrame[Users] = result


def check_multi_key_join_accepted(
    df: DataFrame[Users], other: DataFrame[Orders2]
) -> None:
    """join(on=[cond, cond]) type-checks; result is the joined frame."""
    result = df.join(
        other, [Users.id == Orders2.user_id, Users.age == Orders2.total]
    )
    _: JoinedDataFrame[Users, Orders2] = result


def check_explode_erases_schema(df: DataFrame[Users]) -> None:
    result = df.explode(Users.name)
    _: DataFrame[Any] = result


def check_map_batches_returns_target_schema(df: DataFrame[Users]) -> None:
    """map_batches(fn, Target) -> DataFrame[Target] (boundary-validated)."""
    result = df.map_batches(lambda pdf: pdf, Orders2)
    _: DataFrame[Orders2] = result


def check_broadcast_preserves_frame_and_schema(
    df: DataFrame[Users], lf: LazyFrame[Users]
) -> None:
    from colnade_spark import broadcast

    _: DataFrame[Users] = broadcast(df)
    __: LazyFrame[Users] = broadcast(lf)
