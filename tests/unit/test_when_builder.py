"""when/then builder: alias off the builder closes with a null default
(reference: src/colnade/expr.py:348,365)."""

from __future__ import annotations

from colnade_spark.expr import AliasedExpr, WhenThenOtherwise, when


def test_when_then_alias_null_default():
    aliased = when(True).then(1).alias("x")
    assert isinstance(aliased, AliasedExpr)
    node = aliased.expr
    assert isinstance(node, WhenThenOtherwise)
    assert node.default is None
    assert len(node.cases) == 1


def test_when_then_otherwise_alias():
    aliased = when(True).then(1).otherwise(0).alias("x")
    node = aliased.expr
    assert isinstance(node, WhenThenOtherwise)
    assert node.default is not None
