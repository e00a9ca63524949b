"""Immutable expression AST — the entire IR of the engine.

Node inventory mirrors the reference IR (reference: src/colnade/expr.py:24-405,
12 node types): ColumnRef, Literal, BinOp, UnaryOp, Agg, FunctionCall,
AliasedExpr, SortExpr, StructFieldAccess, ListOp, WhenThenOtherwise,
JoinCondition. The Spark backend translates each node to a
``pyspark.sql.Column`` (a Catalyst expression fragment), so the full frame
pipeline composes into ONE logical plan that Catalyst optimizes end-to-end —
predicate pushdown, column pruning and constant folding are free.

Nothing in this module imports Spark; it is pure driver-side Python with
O(expression-size) build cost (amortized to ~0 against any real job).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Any

if TYPE_CHECKING:
    from colnade_spark.schema import Column

# Binary operators supported by the IR (reference: src/colnade/expr.py:33-92).
BINOPS = {"+", "-", "*", "/", "%", ">", "<", ">=", "<=", "==", "!=", "&", "|"}
UNARY_OPS = {"neg", "not", "is_null", "is_not_null", "is_nan"}
AGG_TYPES = {
    "sum",
    "mean",
    "min",
    "max",
    "count",
    "std",
    "var",
    "first",
    "last",
    "n_unique",
}


class Expr:
    """Base expression node. All subclasses are frozen dataclasses."""

    # -- operator overloads build BinOp nodes ------------------------------
    def _bin(self, other: Any, op: str, reflected: bool = False) -> BinOp:
        other_e = _wrap(other)
        return BinOp(other_e, self, op) if reflected else BinOp(self, other_e, op)

    def __add__(self, other: Any) -> BinOp:
        return self._bin(other, "+")

    def __radd__(self, other: Any) -> BinOp:
        return self._bin(other, "+", True)

    def __sub__(self, other: Any) -> BinOp:
        return self._bin(other, "-")

    def __rsub__(self, other: Any) -> BinOp:
        return self._bin(other, "-", True)

    def __mul__(self, other: Any) -> BinOp:
        return self._bin(other, "*")

    def __rmul__(self, other: Any) -> BinOp:
        return self._bin(other, "*", True)

    def __truediv__(self, other: Any) -> BinOp:
        return self._bin(other, "/")

    def __rtruediv__(self, other: Any) -> BinOp:
        return self._bin(other, "/", True)

    def __mod__(self, other: Any) -> BinOp:
        return self._bin(other, "%")

    def __gt__(self, other: Any) -> BinOp:  # type: ignore[override]
        return self._bin(other, ">")

    def __lt__(self, other: Any) -> BinOp:  # type: ignore[override]
        return self._bin(other, "<")

    def __ge__(self, other: Any) -> BinOp:  # type: ignore[override]
        return self._bin(other, ">=")

    def __le__(self, other: Any) -> BinOp:  # type: ignore[override]
        return self._bin(other, "<=")

    def __eq__(self, other: Any) -> BinOp:  # type: ignore[override]
        return self._bin(other, "==")

    def __ne__(self, other: Any) -> BinOp:  # type: ignore[override]
        return self._bin(other, "!=")

    def eq_missing(self, other: Any) -> BinOp:
        """Null-safe equality: null <=> null is TRUE, never null."""
        return self._bin(other, "<=>")

    __hash__ = None  # type: ignore[assignment]  # == builds an AST node

    def __and__(self, other: Any) -> BinOp:
        return self._bin(other, "&")

    def __rand__(self, other: Any) -> BinOp:
        return self._bin(other, "&", True)

    def __or__(self, other: Any) -> BinOp:
        return self._bin(other, "|")

    def __ror__(self, other: Any) -> BinOp:
        return self._bin(other, "|", True)

    def __invert__(self) -> UnaryOp:
        return UnaryOp(self, "not")

    def __neg__(self) -> UnaryOp:
        return UnaryOp(self, "neg")

    # -- null / nan --------------------------------------------------------
    def is_null(self) -> UnaryOp:
        return UnaryOp(self, "is_null")

    def is_not_null(self) -> UnaryOp:
        return UnaryOp(self, "is_not_null")

    def is_nan(self) -> UnaryOp:
        return UnaryOp(self, "is_nan")

    def fill_null(self, value: Any) -> FunctionCall:
        return FunctionCall("fill_null", self, (_wrap(value),))

    def fill_nan(self, value: Any) -> FunctionCall:
        return FunctionCall("fill_nan", self, (_wrap(value),))

    def assert_non_null(self) -> FunctionCall:
        return FunctionCall("assert_non_null", self, ())

    def cast(self, dtype: Any) -> FunctionCall:
        return FunctionCall("cast", self, (), options={"dtype": dtype})

    # -- math (EXTENSION; ungated here — computed exprs carry no static
    # dtype, the Column-level twins gate on the declared dtype) ------------
    def abs(self) -> FunctionCall:
        return FunctionCall("math_abs", self, ())

    def round(self, decimals: int = 0) -> FunctionCall:
        return FunctionCall("math_round", self, (_wrap(decimals),))

    def floor(self) -> FunctionCall:
        return FunctionCall("math_floor", self, ())

    def ceil(self) -> FunctionCall:
        return FunctionCall("math_ceil", self, ())

    def sqrt(self) -> FunctionCall:
        return FunctionCall("math_sqrt", self, ())

    def ln(self) -> FunctionCall:
        return FunctionCall("math_ln", self, ())

    def log10(self) -> FunctionCall:
        return FunctionCall("math_log10", self, ())

    def exp(self) -> FunctionCall:
        return FunctionCall("math_exp", self, ())

    def pow(self, exponent: Any) -> FunctionCall:
        return FunctionCall("math_pow", self, (_wrap(exponent),))

    @property
    def list(self):
        """List-op namespace on a COMPUTED expression (EXTENSION; ungated
        here like the math fns — the Column-level accessor gates on the
        declared List dtype). Enables chains like
        ``col.str_split(" ").list.slice(0, 3).list.join(" ")``."""
        from colnade_spark.schema import ListAccessor

        return ListAccessor(self)

    # -- aggregation -------------------------------------------------------
    def sum(self) -> Agg:
        return Agg(self, "sum")

    def mean(self) -> Agg:
        return Agg(self, "mean")

    def min(self) -> Agg:
        return Agg(self, "min")

    def max(self) -> Agg:
        return Agg(self, "max")

    def count(self) -> Agg:
        return Agg(self, "count")

    def std(self) -> Agg:
        return Agg(self, "std")

    def var(self) -> Agg:
        return Agg(self, "var")

    def first(self) -> Agg:
        return Agg(self, "first")

    def last(self) -> Agg:
        return Agg(self, "last")

    def n_unique(self) -> Agg:
        return Agg(self, "n_unique")

    # -- alias / sort / window --------------------------------------------
    def alias(self, target: Column | str) -> AliasedExpr:
        return AliasedExpr(self, target)

    def asc(self) -> SortExpr:
        return SortExpr(self, descending=False)

    def desc(self) -> SortExpr:
        return SortExpr(self, descending=True)

    def over(self, *partition_by: Any) -> FunctionCall:
        """Windowed aggregate over an unbounded partition (no ordering/frames;
        matches the reference's partition-only ``over``, src/colnade/schema.py:440-446)."""
        return FunctionCall("over", self, tuple(_wrap(p) for p in partition_by))


@dataclass(frozen=True, eq=False)
class ColumnRef(Expr):
    name: str
    # schema class name for diagnostics / join disambiguation (may be None
    # for ad-hoc refs)
    schema_name: str | None = None


@dataclass(frozen=True, eq=False)
class Literal(Expr):
    value: Any


@dataclass(frozen=True, eq=False)
class BinOp(Expr):
    left: Expr
    right: Expr
    op: str


@dataclass(frozen=True, eq=False)
class UnaryOp(Expr):
    operand: Expr
    op: str


@dataclass(frozen=True, eq=False)
class Agg(Expr):
    operand: Expr
    agg_type: str


@dataclass(frozen=True, eq=False)
class FunctionCall(Expr):
    """Named scalar function: string/temporal/null/cast/over families."""

    name: str
    operand: Expr
    args: tuple[Expr, ...] = ()
    options: dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True, eq=False)
class AliasedExpr(Expr):
    expr: Expr
    target: Any  # Column descriptor or plain string

    @property
    def out_name(self) -> str:
        t = self.target
        return t if isinstance(t, str) else t.name


@dataclass(frozen=True, eq=False)
class SortExpr:
    """Direction wrapper used by ``sort``; deliberately NOT an Expr."""

    expr: Expr
    descending: bool = False


@dataclass(frozen=True, eq=False)
class StructFieldAccess(Expr):
    operand: Expr
    field_name: str


@dataclass(frozen=True, eq=False)
class ListOp(Expr):
    operand: Expr
    op: str  # len | get | contains | sum | mean | min | max
    args: tuple[Expr, ...] = ()


@dataclass(frozen=True, eq=False)
class MapOp(Expr):
    """Map-typed column operation (EXTENSION — the reference has no Map
    dtype). Deterministic surface only: ``keys`` returns the key array
    SORTED so cross-engine comparisons never depend on map entry order."""

    operand: Expr
    op: str  # len | get | contains | keys
    args: tuple[Expr, ...] = ()


@dataclass(frozen=True, eq=False)
class WhenThenOtherwise(Expr):
    """Ordered (condition, value) cases + default; a missing ``.otherwise``
    yields a null default (reference: src/colnade/expr.py:305-366)."""

    cases: tuple[tuple[Expr, Expr], ...]
    default: Expr | None = None


class _WhenThen:
    """Builder state after ``when(c).then(v)``."""

    def __init__(self, cases: tuple[tuple[Expr, Expr], ...]):
        self._cases = cases

    def when(self, condition: Any) -> _When:
        return _When(self._cases, _wrap(condition))

    def otherwise(self, value: Any) -> WhenThenOtherwise:
        return WhenThenOtherwise(self._cases, _wrap(value))

    def done(self) -> WhenThenOtherwise:
        """Finish without a default (null for unmatched rows)."""
        return WhenThenOtherwise(self._cases, None)

    def alias(self, target: Any) -> AliasedExpr:
        """Alias directly off the builder — missing ``.otherwise`` means a
        null default (reference: src/colnade/expr.py:348,365)."""
        return self.done().alias(target)


class _When:
    """Builder state after ``when(c)``."""

    def __init__(self, cases: tuple[tuple[Expr, Expr], ...], condition: Expr):
        self._cases = cases
        self._condition = condition

    def then(self, value: Any) -> _WhenThen:
        return _WhenThen(self._cases + ((self._condition, _wrap(value)),))


def when(condition: Any) -> _When:
    return _When((), _wrap(condition))


@dataclass(frozen=True, eq=False)
class WindowExpr(Expr):
    """Ordered window function (EXTENSION — the reference has no ordered
    windows, SURVEY.md §2.6; ranking/lag-lead are table stakes for
    keep-newest-per-key dedup and sequence features in training pipelines).

    ``func`` ∈ {row_number, rank, dense_rank, lag, lead}; ``operand`` is the
    value expression for lag/lead (None for ranking); ``order_by`` entries
    may be Expr or SortExpr.
    """

    func: str
    operand: Expr | None
    offset: int
    partition_by: tuple[Any, ...]
    order_by: tuple[Any, ...]
    # rolling frame: (preceding, following) as non-negative offsets; None =
    # the func's default frame. range_frame=True → RANGE over a single
    # numeric order key (event-time windows); False → ROWS.
    frame: tuple[int, int] | None = None
    range_frame: bool = False


def _window(
    func: str,
    operand: Any,
    offset: int,
    partition_by: Any,
    order_by: Any,
) -> WindowExpr:
    if not order_by:
        raise ValueError(f"{func} requires order_by (ordered window)")
    part = tuple(_wrap_ref(p) for p in _as_tuple(partition_by))
    order = tuple(
        o if isinstance(o, SortExpr) else _wrap_ref(o) for o in _as_tuple(order_by)
    )
    return WindowExpr(func, operand, offset, part, order)


def _as_tuple(v: Any) -> tuple:
    if v is None:
        return ()
    if isinstance(v, (list, tuple)):
        return tuple(v)
    return (v,)


def _wrap_ref(v: Any) -> Expr:
    ref = getattr(v, "_ref", None)
    return ref() if callable(ref) else _wrap(v)


def row_number(*, partition_by: Any = None, order_by: Any = None) -> WindowExpr:
    return _window("row_number", None, 0, partition_by, order_by)


def rank(*, partition_by: Any = None, order_by: Any = None) -> WindowExpr:
    return _window("rank", None, 0, partition_by, order_by)


def dense_rank(*, partition_by: Any = None, order_by: Any = None) -> WindowExpr:
    return _window("dense_rank", None, 0, partition_by, order_by)


def lag(
    value: Any, offset: int = 1, *, partition_by: Any = None, order_by: Any = None
) -> WindowExpr:
    return _window("lag", _wrap_ref(value), offset, partition_by, order_by)


def lead(
    value: Any, offset: int = 1, *, partition_by: Any = None, order_by: Any = None
) -> WindowExpr:
    return _window("lead", _wrap_ref(value), offset, partition_by, order_by)


def percent_rank(*, partition_by: Any = None, order_by: Any = None) -> WindowExpr:
    """(rank - 1) / (partition rows - 1); 0.0 for a 1-row partition."""
    return _window("percent_rank", None, 0, partition_by, order_by)


def cume_dist(*, partition_by: Any = None, order_by: Any = None) -> WindowExpr:
    """Fraction of partition rows ordered <= current (ties included)."""
    return _window("cume_dist", None, 0, partition_by, order_by)


def ntile(n: int, *, partition_by: Any = None, order_by: Any = None) -> WindowExpr:
    """Bucket index 1..n by ordered position within the partition."""
    if n < 1:
        raise ValueError(f"ntile requires n >= 1, got {n}")
    return _window("ntile", None, n, partition_by, order_by)


def _cum(func: str, value: Any, partition_by: Any, order_by: Any) -> WindowExpr:
    return _window(func, _wrap_ref(value), 0, partition_by, order_by)


def cum_sum(value: Any, *, partition_by: Any = None, order_by: Any = None) -> WindowExpr:
    """Running sum over ROWS UNBOUNDED PRECEDING .. CURRENT ROW. With a
    non-unique order key the per-row result is order-dependent — pass a
    unique (composite) order_by for deterministic output."""
    return _cum("cum_sum", value, partition_by, order_by)


def cum_min(value: Any, *, partition_by: Any = None, order_by: Any = None) -> WindowExpr:
    return _cum("cum_min", value, partition_by, order_by)


def cum_max(value: Any, *, partition_by: Any = None, order_by: Any = None) -> WindowExpr:
    return _cum("cum_max", value, partition_by, order_by)


def cum_count(value: Any, *, partition_by: Any = None, order_by: Any = None) -> WindowExpr:
    return _cum("cum_count", value, partition_by, order_by)


def cum_mean(value: Any, *, partition_by: Any = None, order_by: Any = None) -> WindowExpr:
    return _cum("cum_mean", value, partition_by, order_by)


def _rolling(
    func: str,
    value: Any,
    partition_by: Any,
    order_by: Any,
    preceding: int,
    following: int,
    range_frame: bool,
) -> WindowExpr:
    if preceding < 0 or following < 0:
        raise ValueError("rolling frame offsets must be non-negative")
    node = _window(func, _wrap_ref(value), 0, partition_by, order_by)
    if range_frame and len(node.order_by) != 1:
        raise ValueError("range_frame requires exactly one numeric order key")
    return dataclasses.replace(node, frame=(preceding, following), range_frame=range_frame)


def rolling_sum(
    value: Any,
    *,
    partition_by: Any = None,
    order_by: Any = None,
    preceding: int,
    following: int = 0,
    range_frame: bool = False,
) -> WindowExpr:
    """Windowed sum over a bounded frame. ``range_frame=False`` → ROWS
    BETWEEN preceding AND following (order-dependent on ties — pass a unique
    order key); ``range_frame=True`` → RANGE over ONE numeric order key
    (tie-insensitive: all peers of the current value are in-frame), the
    event-time rolling-window shape (e.g. order_by=days-since-epoch,
    preceding=29 for a trailing 30-day window)."""
    return _rolling("cum_sum", value, partition_by, order_by, preceding, following, range_frame)


def rolling_min(
    value: Any,
    *,
    partition_by: Any = None,
    order_by: Any = None,
    preceding: int,
    following: int = 0,
    range_frame: bool = False,
) -> WindowExpr:
    return _rolling("cum_min", value, partition_by, order_by, preceding, following, range_frame)


def rolling_max(
    value: Any,
    *,
    partition_by: Any = None,
    order_by: Any = None,
    preceding: int,
    following: int = 0,
    range_frame: bool = False,
) -> WindowExpr:
    return _rolling("cum_max", value, partition_by, order_by, preceding, following, range_frame)


def rolling_count(
    value: Any,
    *,
    partition_by: Any = None,
    order_by: Any = None,
    preceding: int,
    following: int = 0,
    range_frame: bool = False,
) -> WindowExpr:
    return _rolling("cum_count", value, partition_by, order_by, preceding, following, range_frame)


def rolling_mean(
    value: Any,
    *,
    partition_by: Any = None,
    order_by: Any = None,
    preceding: int,
    following: int = 0,
    range_frame: bool = False,
) -> WindowExpr:
    return _rolling("cum_mean", value, partition_by, order_by, preceding, following, range_frame)


@dataclass(frozen=True, eq=False)
class JoinCondition:
    """Equi-join condition produced by cross-schema ``Column == Column``
    (reference: src/colnade/schema.py:229-238). Same-schema ``==`` builds a
    plain BinOp filter predicate instead."""

    left: ColumnRef
    right: ColumnRef


def lit(value: Any) -> Literal:
    return Literal(value)


def greatest(*values: Any) -> FunctionCall:
    """Row-wise maximum of >= 2 expressions (EXTENSION). Both engines
    skip nulls — null only when every operand is null."""
    if len(values) < 2:
        raise ValueError("greatest requires at least two values")
    vs = [_wrap_ref(v) for v in values]
    return FunctionCall("greatest", vs[0], tuple(vs[1:]))


def least(*values: Any) -> FunctionCall:
    """Row-wise minimum of >= 2 expressions (EXTENSION)."""
    if len(values) < 2:
        raise ValueError("least requires at least two values")
    vs = [_wrap_ref(v) for v in values]
    return FunctionCall("least", vs[0], tuple(vs[1:]))


def concat_str(*values: Any, sep: str = "") -> FunctionCall:
    """Concatenate string expressions with ``sep`` (EXTENSION); null
    operands are skipped (concat_ws semantics on both engines)."""
    if not values:
        raise ValueError("concat_str requires at least one value")
    vs = [_wrap_ref(v) for v in values]
    return FunctionCall("concat_str", vs[0], tuple(vs[1:]), options={"sep": sep})


def _wrap(value: Any) -> Expr:
    """Auto-lift Columns and raw Python values into Expr nodes."""
    from colnade_spark.schema import Column

    if isinstance(value, Expr):
        return value
    if isinstance(value, Column):
        return value._ref()
    return Literal(value)


def collect_column_names(node: Any) -> set[str]:
    """Walk every node type collecting referenced column names — feeds the
    cross-schema column guard (reference: src/colnade/expr.py:435-475)."""
    out: set[str] = set()
    _collect(node, out)
    return out


def _collect(node: Any, out: set[str]) -> None:
    if node is None:
        return
    if isinstance(node, ColumnRef):
        out.add(node.name)
    elif isinstance(node, Literal):
        pass
    elif isinstance(node, BinOp):
        _collect(node.left, out)
        _collect(node.right, out)
    elif isinstance(node, UnaryOp):
        _collect(node.operand, out)
    elif isinstance(node, Agg):
        _collect(node.operand, out)
    elif isinstance(node, FunctionCall):
        _collect(node.operand, out)
        for a in node.args:
            _collect(a, out)
    elif isinstance(node, AliasedExpr):
        _collect(node.expr, out)
    elif isinstance(node, SortExpr):
        _collect(node.expr, out)
    elif isinstance(node, StructFieldAccess):
        _collect(node.operand, out)
    elif isinstance(node, (ListOp, MapOp)):
        _collect(node.operand, out)
        for a in node.args:
            _collect(a, out)
    elif isinstance(node, WhenThenOtherwise):
        for c, v in node.cases:
            _collect(c, out)
            _collect(v, out)
        _collect(node.default, out)
    elif isinstance(node, WindowExpr):
        _collect(node.operand, out)
        for p in node.partition_by:
            _collect(p, out)
        for o in node.order_by:
            _collect(o, out)
    elif isinstance(node, JoinCondition):
        _collect(node.left, out)
        _collect(node.right, out)
    else:
        raise TypeError(f"unknown AST node: {type(node).__name__}")
