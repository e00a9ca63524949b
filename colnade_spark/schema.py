"""Typed schema layer: ``Schema`` subclasses declare columns as class
annotations; the metaclass turns them into runtime ``Column`` descriptors.

Mirrors the reference's schema machinery (reference: src/colnade/schema.py:
128-487 Column descriptor, 659-754 SchemaMeta, 611-651 Row generation,
805-824 Schema base). Typing is **nominal**: frame compatibility is schema
*class identity*, not structural equality.

Every operator/method on ``Column`` builds an AST node (colnade_spark.expr);
no Spark objects are touched until the backend translates a whole frame
operation, so the driver-side cost is O(expression size).
"""

from __future__ import annotations

import dataclasses
import typing
from collections.abc import Sequence
from typing import Any, Generic, TypeVar, get_args, get_origin, get_type_hints

from colnade_spark import dtypes as dt
from colnade_spark.constraints import FieldInfo, SchemaCheck
from colnade_spark.expr import (
    Agg,
    AliasedExpr,
    BinOp,
    ColumnRef,
    Expr,
    FunctionCall,
    JoinCondition,
    ListOp,
    MapOp,
    SortExpr,
    StructFieldAccess,
    _wrap,
)
from colnade_spark.validation import ValidationLevel, check_literal_type, get_validation

DTypeT = TypeVar("DTypeT")


@dataclasses.dataclass(frozen=True)
class MappedFrom:
    """Marker declaring that a target-schema column maps from a differently
    named source column during ``cast_schema`` (reference: schema.py:147-161
    ``_mapped_from``)."""

    source: Any  # Column or str

    @property
    def source_name(self) -> str:
        return self.source if isinstance(self.source, str) else self.source.name


def mapped_from(source: Any) -> Any:
    return MappedFrom(source)


class Column(Generic[DTypeT]):
    """Typed column descriptor. ``Users.age`` is a Column; every operation on
    it builds an Expr AST node translated later to ``F.col(...)`` expressions.
    """

    def __init__(
        self,
        name: str,
        dtype: Any,
        nullable: bool,
        schema: type[Schema] | None = None,
        field_info: FieldInfo | None = None,
        mapped: MappedFrom | None = None,
    ) -> None:
        self.name = name
        self.dtype = dtype  # inner dtype, nullability stripped
        self.nullable = nullable
        self.schema = schema
        self._field_info = field_info
        self._mapped_from = mapped

    def __repr__(self) -> str:
        owner = self.schema.__name__ if self.schema else "?"
        null = " | None" if self.nullable else ""
        return f"<Column {owner}.{self.name}: {dt.dtype_name(self.dtype)}{null}>"

    def _ref(self) -> ColumnRef:
        return ColumnRef(self.name, self.schema.__name__ if self.schema else None)

    # -- gating helpers ----------------------------------------------------
    def _require(self, pred: bool, what: str) -> None:
        if not pred:
            raise TypeError(
                f"{what} is not supported on column {self.name!r} of dtype "
                f"{dt.dtype_name(self.dtype)}"
            )

    @property
    def _is_numeric(self) -> bool:
        return dt.is_numeric(self.dtype)

    @property
    def _is_float(self) -> bool:
        return dt.is_float(self.dtype)

    @property
    def _is_str(self) -> bool:
        return isinstance(self.dtype, type) and issubclass(self.dtype, dt.Utf8)

    @property
    def _is_temporal(self) -> bool:
        return dt.is_temporal(self.dtype)

    @property
    def _is_list(self) -> bool:
        return isinstance(self.dtype, type) and issubclass(self.dtype, dt.List)

    @property
    def _is_struct(self) -> bool:
        return isinstance(self.dtype, type) and issubclass(self.dtype, dt.Struct)

    @property
    def _is_map(self) -> bool:
        return isinstance(self.dtype, type) and issubclass(self.dtype, dt.Map)

    # -- binary operators --------------------------------------------------
    def _binop(self, other: Any, op: str, reflected: bool = False) -> BinOp:
        if (
            get_validation() is not ValidationLevel.OFF
            and not isinstance(other, (Column, Expr))
        ):
            check_literal_type(other, self.dtype, self.name)
        other_e = _wrap(other)
        me = self._ref()
        return BinOp(other_e, me, op) if reflected else BinOp(me, other_e, op)

    def __add__(self, other: Any) -> BinOp:
        return self._binop(other, "+")

    def __radd__(self, other: Any) -> BinOp:
        return self._binop(other, "+", True)

    def __sub__(self, other: Any) -> BinOp:
        return self._binop(other, "-")

    def __rsub__(self, other: Any) -> BinOp:
        return self._binop(other, "-", True)

    def __mul__(self, other: Any) -> BinOp:
        return self._binop(other, "*")

    def __rmul__(self, other: Any) -> BinOp:
        return self._binop(other, "*", True)

    def __truediv__(self, other: Any) -> BinOp:
        return self._binop(other, "/")

    def __rtruediv__(self, other: Any) -> BinOp:
        return self._binop(other, "/", True)

    def __mod__(self, other: Any) -> BinOp:
        return self._binop(other, "%")

    def __gt__(self, other: Any) -> BinOp:
        return self._binop(other, ">")

    def __lt__(self, other: Any) -> BinOp:
        return self._binop(other, "<")

    def __ge__(self, other: Any) -> BinOp:
        return self._binop(other, ">=")

    def __le__(self, other: Any) -> BinOp:
        return self._binop(other, "<=")

    def __eq__(self, other: Any):  # type: ignore[override]
        # Cross-schema Column == Column produces a JoinCondition; same-schema
        # (or literal) comparison is an ordinary filter predicate.
        # (reference: src/colnade/schema.py:229-238)
        if isinstance(other, Column) and other.schema is not self.schema:
            return JoinCondition(self._ref(), other._ref())
        return self._binop(other, "==")

    def __ne__(self, other: Any) -> BinOp:  # type: ignore[override]
        return self._binop(other, "!=")

    def eq_missing(self, other: Any) -> BinOp:
        """Null-safe equality (EXTENSION; Polars eq_missing / SQL IS NOT
        DISTINCT FROM): null == null is TRUE, null == value is FALSE —
        never null. Unlike ``==``, never produces a JoinCondition."""
        return self._binop(other, "<=>")

    __hash__ = None  # type: ignore[assignment]

    def __and__(self, other: Any) -> BinOp:
        return self._binop(other, "&")

    def __or__(self, other: Any) -> BinOp:
        return self._binop(other, "|")

    def __invert__(self):
        return ~self._ref()

    def __neg__(self):
        return -self._ref()

    # -- aggregations ------------------------------------------------------
    def sum(self) -> Agg:
        self._require(self._is_numeric, "sum()")
        return Agg(self._ref(), "sum")

    def mean(self) -> Agg:
        self._require(self._is_numeric, "mean()")
        return Agg(self._ref(), "mean")

    def min(self) -> Agg:
        return Agg(self._ref(), "min")

    def max(self) -> Agg:
        return Agg(self._ref(), "max")

    def count(self) -> Agg:
        return Agg(self._ref(), "count")

    def std(self) -> Agg:
        self._require(self._is_numeric, "std()")
        return Agg(self._ref(), "std")

    def var(self) -> Agg:
        self._require(self._is_numeric, "var()")
        return Agg(self._ref(), "var")

    def first(self) -> Agg:
        return Agg(self._ref(), "first")

    def last(self) -> Agg:
        return Agg(self._ref(), "last")

    def n_unique(self) -> Agg:
        return Agg(self._ref(), "n_unique")

    # -- string functions (Utf8-gated) ------------------------------------
    def _str_fn(self, name: str, *args: Any) -> FunctionCall:
        self._require(self._is_str, f"{name}()")
        return FunctionCall(name, self._ref(), tuple(_wrap(a) for a in args))

    def str_contains(self, pat: str) -> FunctionCall:
        """LITERAL substring containment (not regex)."""
        return self._str_fn("str_contains", pat)

    def str_starts_with(self, prefix: str) -> FunctionCall:
        return self._str_fn("str_starts_with", prefix)

    def str_ends_with(self, suffix: str) -> FunctionCall:
        return self._str_fn("str_ends_with", suffix)

    def str_len(self) -> FunctionCall:
        """Character (not byte) count."""
        return self._str_fn("str_len")

    def str_to_lowercase(self) -> FunctionCall:
        return self._str_fn("str_to_lowercase")

    def str_to_uppercase(self) -> FunctionCall:
        return self._str_fn("str_to_uppercase")

    def str_strip(self) -> FunctionCall:
        return self._str_fn("str_strip")

    def str_replace(self, pat: str, repl: str) -> FunctionCall:
        """Literal replace-ALL (Spark/Pandas semantics; the reference's Polars
        backend replaces only the first occurrence — documented divergence,
        SURVEY.md §2.4)."""
        return self._str_fn("str_replace", pat, repl)

    # -- math functions (EXTENSION — the reference has no math beyond
    # arithmetic operators, SURVEY.md §2.6) -------------------------------
    def _math_fn(self, name: str, *args: Any) -> FunctionCall:
        self._require(self._is_numeric, f"{name}()")
        return FunctionCall(name, self._ref(), tuple(_wrap(a) for a in args))

    def abs(self) -> FunctionCall:
        return self._math_fn("math_abs")

    def round(self, decimals: int = 0) -> FunctionCall:
        """Half-up rounding to ``decimals`` places (Spark ROUND; DuckDB
        ROUND matches half-up on doubles)."""
        return self._math_fn("math_round", decimals)

    def floor(self) -> FunctionCall:
        return self._math_fn("math_floor")

    def ceil(self) -> FunctionCall:
        return self._math_fn("math_ceil")

    def sqrt(self) -> FunctionCall:
        return self._math_fn("math_sqrt")

    def ln(self) -> FunctionCall:
        """Natural log; non-positive input → null (both engines)."""
        return self._math_fn("math_ln")

    def log10(self) -> FunctionCall:
        return self._math_fn("math_log10")

    def exp(self) -> FunctionCall:
        return self._math_fn("math_exp")

    def pow(self, exponent: Any) -> FunctionCall:
        return self._math_fn("math_pow", exponent)

    # -- regex / extended string functions (EXTENSION) ---------------------
    def str_extract(self, pattern: str, group: int = 0) -> FunctionCall:
        """First regex match (capture ``group``); NULL when no match OR when
        the capture is empty — i.e. '' always collapses to NULL, the exact
        twin of DuckDB's ``NULLIF(regexp_extract(..), '')`` convention, so a
        pattern like ``'(a*)'`` that matches with an empty group yields NULL
        identically on both engines.
        """
        return self._str_fn("str_extract", pattern, group)

    def str_matches(self, pattern: str) -> FunctionCall:
        """Regex SEARCH (unanchored), boolean — the regex twin of the
        literal str_contains."""
        return self._str_fn("str_matches", pattern)

    def str_count_matches(self, pattern: str) -> FunctionCall:
        """Number of non-overlapping regex matches."""
        return self._str_fn("str_count_matches", pattern)

    def json_extract(self, path: str) -> FunctionCall:
        """Extract a JSON path (``$.field`` / ``$.a[0].b``) from a JSON
        string column as a STRING (null on missing path or invalid JSON;
        cast downstream for typed values). EXTENSION — the reference has
        no JSON functions (SURVEY.md §2.6)."""
        if not path.startswith("$"):
            raise ValueError(f"json_extract path must start with '$': {path!r}")
        return self._str_fn("json_extract", path)

    def str_split(self, delim: str) -> FunctionCall:
        """Split on a LITERAL delimiter → List[Utf8] (the backend escapes
        the delimiter; Spark's split() is regex-based)."""
        if not delim:
            raise ValueError("str_split delimiter must be non-empty")
        return self._str_fn("str_split", delim)

    def str_slice(self, offset: int, length: int) -> FunctionCall:
        """0-based substring of ``length`` chars (Polars-style offsets;
        translated to 1-based substring on both engines)."""
        if offset < 0 or length < 0:
            raise ValueError("str_slice offset/length must be non-negative")
        return self._str_fn("str_slice", offset, length)

    # -- membership (EXTENSION) -------------------------------------------
    def is_in(self, values: Sequence[Any]) -> FunctionCall:
        """SQL IN over a literal list (null input → null, like both
        engines' IN with a non-null list)."""
        vals = tuple(values)
        if not vals:
            raise ValueError("is_in requires at least one value")
        if get_validation() is not ValidationLevel.OFF:
            for v in vals:
                check_literal_type(v, self.dtype, self.name)
        return FunctionCall("is_in", self._ref(), tuple(_wrap(v) for v in vals))

    # -- temporal functions ------------------------------------------------
    def _dt_fn(self, name: str, *args: Any, **options: Any) -> FunctionCall:
        self._require(self._is_temporal, f"{name}()")
        return FunctionCall(name, self._ref(), tuple(_wrap(a) for a in args), options=options)

    def dt_year(self) -> FunctionCall:
        return self._dt_fn("dt_year")

    def dt_month(self) -> FunctionCall:
        return self._dt_fn("dt_month")

    def dt_day(self) -> FunctionCall:
        return self._dt_fn("dt_day")

    def dt_hour(self) -> FunctionCall:
        return self._dt_fn("dt_hour")

    def dt_minute(self) -> FunctionCall:
        return self._dt_fn("dt_minute")

    def dt_second(self) -> FunctionCall:
        return self._dt_fn("dt_second")

    def dt_epoch_day(self) -> FunctionCall:
        """Integer days since 1970-01-01 (EXTENSION — the natural numeric
        order key for event-time RANGE rolling windows; timestamps truncate
        to their date first)."""
        return self._dt_fn("dt_epoch_day")

    def dt_truncate(self, every: str) -> FunctionCall:
        """Truncate to a unit. Our unit vocabulary: ``year|month|week|day|
        hour|minute|second`` (mapped per-backend; Polars would use "1mo" etc).
        """
        return self._dt_fn("dt_truncate", every=every)

    def dt_add(self, every: str, n: int) -> FunctionCall:
        """Shift by ``n`` whole units (EXTENSION; same unit vocabulary as
        dt_truncate). Negative ``n`` shifts backward."""
        return self._dt_fn("dt_add", n, every=every)

    def dt_diff(self, every: str, other: Any) -> FunctionCall:
        """COMPLETE units from ``other`` to this column (self - other;
        EXTENSION). Truncates toward zero — 25 hours is 1 day, -25 hours
        is -1 day; not calendar-boundary counting."""
        return self._dt_fn("dt_diff", other, every=every)

    # -- null / nan / cast / window ---------------------------------------
    def is_null(self):
        return self._ref().is_null()

    def is_not_null(self):
        return self._ref().is_not_null()

    def is_nan(self):
        self._require(self._is_float, "is_nan()")
        return self._ref().is_nan()

    def fill_null(self, value: Any) -> FunctionCall:
        if get_validation() is not ValidationLevel.OFF and not isinstance(
            value, (Column, Expr)
        ):
            check_literal_type(value, self.dtype, self.name)
        return self._ref().fill_null(value)

    def fill_nan(self, value: Any) -> FunctionCall:
        self._require(self._is_float, "fill_nan()")
        return self._ref().fill_nan(value)

    def assert_non_null(self) -> FunctionCall:
        return self._ref().assert_non_null()

    def cast(self, dtype: Any) -> FunctionCall:
        return self._ref().cast(dtype)

    def over(self, *partition_by: Any) -> FunctionCall:
        raise TypeError("call .over() on an aggregate, e.g. col.mean().over(key)")

    # -- alias / sort ------------------------------------------------------
    def alias(self, target: Column | str) -> AliasedExpr:
        return AliasedExpr(self._ref(), target)

    def asc(self) -> SortExpr:
        return SortExpr(self._ref(), descending=False)

    def desc(self) -> SortExpr:
        return SortExpr(self._ref(), descending=True)

    # -- struct / list accessors ------------------------------------------
    def field(self, sub: Column | str) -> StructFieldAccess:
        self._require(self._is_struct, "field()")
        name = sub if isinstance(sub, str) else sub.name
        return StructFieldAccess(self._ref(), name)

    @property
    def list(self) -> ListAccessor:
        self._require(self._is_list, ".list")
        return ListAccessor(self)

    @property
    def map(self) -> MapAccessor:
        self._require(self._is_map, ".map")
        return MapAccessor(self)


class MapAccessor:
    """Namespace for map-typed column operations (EXTENSION — no reference
    counterpart; the reference dtype set has no Map). Deterministic
    surface: ``keys()`` sorts, value iteration order is never exposed."""

    def __init__(self, column: "Column | Expr"):
        self._col = column

    def _operand(self):
        ref = getattr(self._col, "_ref", None)
        return ref() if callable(ref) else self._col

    def len(self) -> MapOp:
        """Number of entries; null map → null."""
        return MapOp(self._operand(), "len")

    def get(self, key: Any) -> MapOp:
        """Value at ``key``; missing key or null map → null (ANSI-safe
        ``try_element_at`` — plain element_at raises under Spark 4 ANSI)."""
        return MapOp(self._operand(), "get", (_wrap(key),))

    def contains(self, key: Any) -> MapOp:
        return MapOp(self._operand(), "contains", (_wrap(key),))

    def keys(self) -> MapOp:
        """Key array, SORTED ascending (map entry order is engine-defined;
        sorting makes the result comparable cross-engine)."""
        return MapOp(self._operand(), "keys")


class ListAccessor:
    """Namespace for list-typed column operations (reference:
    src/colnade/schema.py:555-603)."""

    def __init__(self, column: "Column | Expr"):
        self._col = column

    def _operand(self):
        ref = getattr(self._col, "_ref", None)
        return ref() if callable(ref) else self._col

    def len(self) -> ListOp:
        return ListOp(self._operand(), "len")

    def get(self, index: int) -> ListOp:
        """0-based element access; out-of-range yields null."""
        return ListOp(self._operand(), "get", (_wrap(index),))

    def contains(self, value: Any) -> ListOp:
        return ListOp(self._operand(), "contains", (_wrap(value),))

    def sum(self) -> ListOp:
        return ListOp(self._operand(), "sum")

    def mean(self) -> ListOp:
        """Mean of elements; empty list → null."""
        return ListOp(self._operand(), "mean")

    def min(self) -> ListOp:
        return ListOp(self._operand(), "min")

    def max(self) -> ListOp:
        return ListOp(self._operand(), "max")

    # -- EXTENSION list ops (beyond the reference's 7) ---------------------
    def unique(self) -> ListOp:
        """Distinct elements, first-occurrence order preserved."""
        return ListOp(self._operand(), "unique")

    def sort(self) -> ListOp:
        """Ascending sort, nulls last (Spark ``array_sort``). Cross-engine
        note: DuckDB's ``list_sort`` default null order differs — oracle SQL
        comparing sorted lists that can contain null elements must pin
        ``list_sort(l, 'ASC', 'NULLS LAST')``."""
        return ListOp(self._operand(), "sort")

    def slice(self, offset: int, length: int) -> ListOp:
        """0-based sub-list of up to ``length`` elements."""
        if offset < 0 or length < 0:
            raise ValueError("list.slice offset/length must be non-negative")
        return ListOp(self._operand(), "slice", (_wrap(offset), _wrap(length)))

    def join(self, sep: str) -> ListOp:
        """Concatenate string elements with ``sep``; null elements are
        skipped (Spark array_join / DuckDB array_to_string semantics)."""
        return ListOp(self._operand(), "join", (_wrap(sep),))


def _parse_column_annotation(ann: Any) -> Any | None:
    """Return the dtype argument if ``ann`` is ``Column[...]``, else None."""
    if get_origin(ann) is Column:
        args = get_args(ann)
        if len(args) != 1:
            raise TypeError(f"Column[...] takes exactly one dtype, got {ann!r}")
        return args[0]
    return None


class SchemaMeta(type):
    """Turns ``name: Column[DType]`` annotations into runtime Column
    descriptors stored in ``cls._columns`` and generates the per-schema
    frozen ``Row`` dataclass."""

    def __new__(mcls, name: str, bases: tuple[type, ...], ns: dict[str, Any]):
        cls = super().__new__(mcls, name, bases, ns)
        columns: dict[str, Column] = {}
        checks: list[SchemaCheck] = []
        # inherit parent columns / checks (in MRO order, parents first)
        for base in reversed(cls.__mro__[1:]):
            columns.update(getattr(base, "_columns", {}))
            for chk in getattr(base, "_schema_checks", []):
                if chk not in checks:
                    checks.append(chk)

        raw_annotations = ns.get("__annotations__", {})
        if raw_annotations:
            try:
                hints = get_type_hints(cls, include_extras=True)
            except Exception:
                hints = raw_annotations
            for col_name in raw_annotations:
                ann = hints.get(col_name, raw_annotations[col_name])
                if isinstance(ann, str):
                    raise TypeError(
                        f"could not resolve annotation for {name}.{col_name}: {ann!r}"
                    )
                dtype_arg = _parse_column_annotation(ann)
                if dtype_arg is None:
                    continue
                stripped = dt.strip_nullable(dtype_arg)
                if stripped is None:
                    raise TypeError(
                        f"{name}.{col_name}: {dtype_arg!r} is not a colnade dtype"
                    )
                inner, nullable = stripped
                default = ns.get(col_name)
                field_info = default if isinstance(default, FieldInfo) else None
                mapped = default if isinstance(default, MappedFrom) else None
                col = Column(
                    name=col_name,
                    dtype=inner,
                    nullable=nullable,
                    schema=cls,  # type: ignore[arg-type]
                    field_info=field_info,
                    mapped=mapped,
                )
                columns[col_name] = col
                setattr(cls, col_name, col)

        for v in ns.values():
            if isinstance(v, SchemaCheck):
                checks.append(v)

        cls._columns = columns  # type: ignore[attr-defined]
        cls._schema_checks = checks  # type: ignore[attr-defined]
        if columns:
            cls.Row = dataclasses.make_dataclass(  # type: ignore[attr-defined]
                f"{name}Row",
                [
                    (c.name, typing.Any, dataclasses.field(default=None))
                    if c.nullable
                    else (c.name, typing.Any)
                    for c in columns.values()
                ],
                frozen=True,
                kw_only=True,
            )
        return cls


class Schema(metaclass=SchemaMeta):
    """Base class for user schemas::

        class Users(Schema):
            id: Column[Int64]
            name: Column[Utf8]
            score: Column[Float64 | None]
    """

    _columns: typing.ClassVar[dict[str, Column]] = {}
    _schema_checks: typing.ClassVar[list[SchemaCheck]] = []
    Row: typing.ClassVar[type]

    @classmethod
    def columns(cls) -> dict[str, Column]:
        return dict(cls._columns)

    @classmethod
    def column_names(cls) -> list[str]:
        return list(cls._columns)
