"""Static type tests for nested (Struct / List) columns (mypy --strict / ty).

Must produce zero type errors. Struct field access and the ``.list``
accessor namespace are statically visible; element-dtype flow through
``ListOp`` is a documented LIMITATION (rows 23-24 in
test_coverage_matrix.py) because AST nodes are untyped plan IR here.

(Reference shape: /root/reference/tests/typing/test_nested_types.py.)
"""

from colnade_spark import Column, Float64, Int64, Schema, Utf8
from colnade_spark.dtypes import List, Struct
from colnade_spark.expr import ListOp, StructFieldAccess
from colnade_spark.schema import ListAccessor


class Address(Schema):
    city: Column[Utf8]
    zip_code: Column[Utf8]


class Profile(Schema):
    user_id: Column[Int64]
    address: Column[Struct[Address]]
    scores: Column[List[Float64]]
    tags: Column[List[Utf8]]


# --- Struct field access ---------------------------------------------------


def check_struct_field_by_column() -> None:
    _a: StructFieldAccess = Profile.address.field(Address.city)
    _ = _a


def check_struct_field_by_name() -> None:
    _a: StructFieldAccess = Profile.address.field("zip_code")
    _ = _a


def check_struct_field_is_expr_chainable() -> None:
    # field access composes with alias like any expression
    _ = Profile.address.field(Address.city).alias("city")


# --- List accessor namespace -----------------------------------------------


def check_list_accessor_type() -> None:
    _acc: ListAccessor = Profile.scores.list
    _ = _acc


def check_list_ops_return_listop() -> None:
    _len: ListOp = Profile.scores.list.len()
    _get: ListOp = Profile.scores.list.get(0)
    _has: ListOp = Profile.tags.list.contains("x")
    _sum: ListOp = Profile.scores.list.sum()
    _mean: ListOp = Profile.scores.list.mean()
    _min: ListOp = Profile.scores.list.min()
    _max: ListOp = Profile.scores.list.max()
    _ = (_len, _get, _has, _sum, _mean, _min, _max)


def check_list_op_aliasable() -> None:
    _ = Profile.scores.list.mean().alias("avg_score")
