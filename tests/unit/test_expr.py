"""AST construction unit tests (model: reference tests/unit/test_expr.py)."""

from __future__ import annotations

import pytest

from colnade_spark.dtypes import Float64, Int64, List, Utf8
from colnade_spark.expr import (
    Agg,
    AliasedExpr,
    BinOp,
    ColumnRef,
    FunctionCall,
    JoinCondition,
    ListOp,
    Literal,
    SortExpr,
    UnaryOp,
    WhenThenOtherwise,
    collect_column_names,
    lit,
    when,
)
from colnade_spark.schema import Column, Schema


class Users(Schema):
    id: Column[Int64]
    name: Column[Utf8]
    score: Column[Float64 | None]


class Orders(Schema):
    id: Column[Int64]
    user_id: Column[Int64]
    amount: Column[Float64]


def test_column_ref():
    ref = Users.id._ref()
    assert isinstance(ref, ColumnRef)
    assert ref.name == "id"
    assert ref.schema_name == "Users"


def test_binop_literal_wrap():
    e = Users.score > 5
    assert isinstance(e, BinOp)
    assert e.op == ">"
    assert isinstance(e.left, ColumnRef)
    assert isinstance(e.right, Literal)
    assert e.right.value == 5


def test_reflected_binop():
    e = 10 - Users.score._ref()
    assert isinstance(e, BinOp)
    assert e.op == "-"
    assert isinstance(e.left, Literal)
    assert e.left.value == 10


def test_boolean_composition():
    e = (Users.score > 5) & ~(Users.id < 3)
    assert isinstance(e, BinOp) and e.op == "&"
    assert isinstance(e.right, UnaryOp) and e.right.op == "not"


def test_same_schema_eq_is_filter_predicate():
    e = Users.id == 1
    assert isinstance(e, BinOp) and e.op == "=="


def test_cross_schema_eq_is_join_condition():
    jc = Users.id == Orders.user_id
    assert isinstance(jc, JoinCondition)
    assert jc.left.name == "id" and jc.right.name == "user_id"


def test_aggregates():
    for meth, agg_type in [
        ("sum", "sum"),
        ("mean", "mean"),
        ("min", "min"),
        ("max", "max"),
        ("count", "count"),
        ("std", "std"),
        ("var", "var"),
        ("first", "first"),
        ("last", "last"),
        ("n_unique", "n_unique"),
    ]:
        node = getattr(Users.score, meth)()
        assert isinstance(node, Agg) and node.agg_type == agg_type


def test_numeric_gating():
    with pytest.raises(TypeError):
        Users.name.sum()
    with pytest.raises(TypeError):
        Users.name.std()
    with pytest.raises(TypeError):
        Users.id.str_len()
    with pytest.raises(TypeError):
        Users.name.dt_year()
    with pytest.raises(TypeError):
        Users.id.is_nan()


def test_alias_binds_column_or_string():
    class Out(Schema):
        total: Column[Float64]

    a = Users.score.sum().alias(Out.total)
    assert isinstance(a, AliasedExpr) and a.out_name == "total"
    b = Users.score.sum().alias("t2")
    assert b.out_name == "t2"


def test_sort_expr():
    s = Users.score.desc()
    assert isinstance(s, SortExpr) and s.descending


def test_when_then_otherwise():
    w = when(Users.score > 50).then("hi").when(Users.score > 20).then("mid").otherwise("lo")
    assert isinstance(w, WhenThenOtherwise)
    assert len(w.cases) == 2
    assert isinstance(w.default, Literal) and w.default.value == "lo"
    # missing otherwise -> null default
    w2 = when(Users.score > 50).then("hi").done()
    assert w2.default is None


def test_str_functions():
    f = Users.name.str_contains("x")
    assert isinstance(f, FunctionCall) and f.name == "str_contains"
    assert Users.name.str_replace("a", "b").name == "str_replace"


def test_over_builds_function_call():
    e = Users.score.mean().over(Users.name)
    assert isinstance(e, FunctionCall) and e.name == "over"
    assert isinstance(e.operand, Agg)


def test_list_ops():
    class Tagged(Schema):
        id: Column[Int64]
        tags: Column[List[Utf8]]

    node = Tagged.tags.list.get(0)
    assert isinstance(node, ListOp) and node.op == "get"
    with pytest.raises(TypeError):
        Users.name.list  # noqa: B018


def test_collect_column_names_walks_every_node():
    e = when((Users.score > 5) & (Users.id != 0)).then(Users.name.str_len()).otherwise(
        lit(0)
    )
    assert collect_column_names(e) == {"score", "id", "name"}
    agg = Users.score.mean().over(Users.name)
    assert collect_column_names(agg) == {"score", "name"}


def test_fill_null_and_cast():
    f = Users.score.fill_null(0.0)
    assert f.name == "fill_null"
    c = Users.id.cast(Float64)
    assert c.name == "cast" and c.options["dtype"] is Float64
