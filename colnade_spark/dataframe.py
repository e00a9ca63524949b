"""Schema-parameterized frames over ``pyspark.sql.DataFrame``.

Mirrors the reference's frame layer (reference: src/colnade/dataframe.py:
298-1643): ``DataFrame[S]`` (eager-styled), ``LazyFrame[S]``, ``GroupBy[S]``/
``LazyGroupBy[S]``, ``JoinedDataFrame[S,S2]``, module-level ``concat``, and
the pure-Python ``cast_schema`` resolution (dataframe.py:234-290) +
cross-schema column guard (dataframe.py:179-227).

Static-typing contract (checked by ``tests/typing/``):
- Schema-preserving ops (``filter``/``sort``/``limit``/``head``/``tail``/
  ``sample``/``unique``/``drop_nulls``/``with_columns``/``with_raw``/
  ``validate``) return ``Self`` — both the frame class AND the schema
  parameter survive.
- Schema-transforming ops erase to the precise frame class with an ``Any``
  schema: ``DataFrame.select → DataFrame[Any]``, ``LazyFrame.agg →
  LazyFrame[Any]`` — never bare ``Any``.
- ``join`` returns ``JoinedDataFrame[S, S2]`` / ``JoinedLazyFrame[S, S2]``;
  ``cast_schema(target)`` returns the frame class parameterized by the
  target schema.
- ``DataFrame.item(col)`` has dtype-directed overloads (reference:
  dataframe.py:387-427): ``Column[Int64] → int``, ``Column[Utf8 | None] →
  str | None``, etc.

Execution-model decision (SURVEY.md §3.4): Spark frames are ALWAYS lazy
internally. A faithful "eager" surface would force a Spark action per
operation — ruinous at 100 TB — so ``DataFrame[S]`` is *logically*
materialized: only explicitly materializing methods (``height``/``item``/
``collect``/``iter_rows_as``/``to_batches``/``tail``) trigger jobs. This
follows the reference's own Dask precedent (its Dask backend dropped eager
I/O entirely, CHANGELOG.md:222-231).
"""

from __future__ import annotations

import typing
from collections.abc import Callable, Iterable, Iterator, Sequence
from datetime import date as _date
from datetime import datetime as _datetime
from datetime import timedelta as _timedelta
from typing import Any, Generic, Self, TypeVar, overload

from colnade_spark.backend import SparkBackend, rewrite_refs
from colnade_spark.dtypes import (
    Binary,
    Bool,
    Date,
    Datetime,
    Duration,
    Float32,
    Float64,
    Int8,
    Int16,
    Int32,
    Int64,
    Time,
    UInt8,
    UInt16,
    UInt32,
    UInt64,
    Utf8,
)
from colnade_spark.errors import ColumnGuardError, SchemaError
from colnade_spark.expr import (
    AliasedExpr,
    Expr,
    JoinCondition,
    SortExpr,
    collect_column_names,
)
from colnade_spark.schema import Column, Schema
from colnade_spark.validation import ValidationLevel, get_validation

if typing.TYPE_CHECKING:
    from pyspark.sql import DataFrame as SparkDF

S = TypeVar("S", bound=Schema)
S2 = TypeVar("S2", bound=Schema)

_BACKEND = SparkBackend()

# --- item() overload aliases (reference: dataframe.py:387-427) -------------
# Column is invariant in its dtype parameter, so Column[Int64] and
# Column[Int64 | None] are distinct and the nullable overloads fire exactly
# for `Column[T | None]` annotations.
_IntCol = (
    Column[Int8]
    | Column[Int16]
    | Column[Int32]
    | Column[Int64]
    | Column[UInt8]
    | Column[UInt16]
    | Column[UInt32]
    | Column[UInt64]
)
_IntColN = (
    Column[Int8 | None]
    | Column[Int16 | None]
    | Column[Int32 | None]
    | Column[Int64 | None]
    | Column[UInt8 | None]
    | Column[UInt16 | None]
    | Column[UInt32 | None]
    | Column[UInt64 | None]
)
_FloatCol = Column[Float32] | Column[Float64]
_FloatColN = Column[Float32 | None] | Column[Float64 | None]


def _names(cols: Sequence[Column | str]) -> list[str]:
    return [c if isinstance(c, str) else c.name for c in cols]


class _FrameBase(Generic[S]):
    """Shared operation surface for DataFrame and LazyFrame."""

    _data: SparkDF
    _schema: type[S] | None
    _backend: SparkBackend

    def __init__(
        self,
        data: SparkDF,
        schema: type[S] | None,
        backend: SparkBackend = _BACKEND,
    ) -> None:
        self._data = data
        self._schema = schema
        self._backend = backend

    # -- plumbing ----------------------------------------------------------
    def _wrap(self, data: SparkDF) -> Self:
        return type(self)(data, self._schema, self._backend)

    def _guard(self, *exprs: Any) -> None:
        """Cross-schema column guard: every referenced column must exist in
        this frame's schema (reference: dataframe.py:179-227)."""
        if self._schema is None:
            return
        allowed = set(self._schema._columns)
        for e in exprs:
            refs = collect_column_names(e)
            missing = sorted(refs - allowed)
            if missing:
                raise ColumnGuardError(
                    message=f"expression references columns not in "
                    f"{self._schema.__name__}",
                    missing_columns=missing,
                )

    @property
    def schema(self) -> type[S] | None:
        return self._schema

    @property
    def native(self) -> SparkDF:
        """The underlying pyspark DataFrame (read-only escape hatch)."""
        return self._data

    def explain(self, mode: str = "formatted") -> None:
        self._data.explain(mode)

    def explain_plan(self, mode: str = "formatted") -> str:
        """The physical plan as a STRING (explain() only prints) — for
        plan assertions and logging without stdout capture."""
        import contextlib
        import io as _io

        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            self._data.explain(mode)
        return buf.getvalue()

    # -- row-level ops (schema-preserving: return Self) --------------------
    def filter(self, predicate: Expr) -> Self:
        self._guard(predicate)
        return self._wrap(self._backend.filter(self._data, predicate))

    def sort(self, *by: Column | SortExpr, descending: bool = False) -> Self:
        sort_exprs: list[SortExpr] = []
        for b in by:
            if isinstance(b, SortExpr):
                sort_exprs.append(b)
            elif isinstance(b, Column):
                sort_exprs.append(SortExpr(b._ref(), descending=descending))
            else:
                raise TypeError(f"sort() takes Columns or SortExprs, got {type(b)}")
        self._guard(*sort_exprs)
        return self._wrap(self._backend.sort(self._data, sort_exprs))

    def limit(self, n: int) -> Self:
        return self._wrap(self._backend.limit(self._data, n))

    def head(self, n: int = 5) -> Self:
        return self.limit(n)

    def unique(self, *subset: Column | str) -> Self:
        cols = _names(subset) or None
        if cols and self._schema is not None:
            missing = sorted(set(cols) - set(self._schema._columns))
            if missing:
                raise ColumnGuardError(
                    message="unique() columns not in schema", missing_columns=missing
                )
        return self._wrap(self._backend.unique(self._data, cols))

    def drop_nulls(self, *subset: Column | str) -> Self:
        cols = _names(subset) or None
        return self._wrap(self._backend.drop_nulls(self._data, cols))

    def with_columns(self, *exprs: AliasedExpr) -> Self:
        for e in exprs:
            if not isinstance(e, AliasedExpr):
                raise TypeError("with_columns() requires aliased expressions")
        self._guard(*exprs)
        return self._wrap(self._backend.with_columns(self._data, list(exprs)))

    def _describe_data(self, cols: Sequence[Column | str]) -> SparkDF:
        """Resolve describe() targets: given columns (numeric-gated when
        the schema is known) or every numeric schema column."""
        from colnade_spark import dtypes as _dt

        if cols:
            names = _names(cols)
            if self._schema is not None:
                for n in names:
                    col = self._schema._columns.get(n)
                    if col is None:
                        raise ColumnGuardError(
                            message="describe() columns not in schema",
                            missing_columns=[n],
                        )
                    if not _dt.is_numeric(col.dtype):
                        raise TypeError(
                            f"describe() requires numeric columns; {n!r} is "
                            f"{_dt.dtype_name(col.dtype)}"
                        )
        else:
            if self._schema is None:
                raise SchemaError(
                    message="describe() without columns requires a schema-bound frame"
                )
            names = [
                n
                for n, c in self._schema._columns.items()
                if _dt.is_numeric(c.dtype)
            ]
            if not names:
                raise TypeError("describe(): schema has no numeric columns")
        return self._backend.describe(self._data, names)

    # -- schema-transforming op internals (typed wrappers in subclasses) ---
    def _select_data(self, cols: Sequence[Column | str]) -> SparkDF:
        names = _names(cols)
        if self._schema is not None:
            missing = sorted(set(names) - set(self._schema._columns))
            if missing:
                raise ColumnGuardError(
                    message="select() columns not in schema", missing_columns=missing
                )
        return self._backend.select(self._data, names)

    def _agg_data(self, aggs: Sequence[AliasedExpr]) -> SparkDF:
        self._guard(*aggs)
        return self._backend.agg(self._data, list(aggs))

    def _group_keys(self, keys: Sequence[Column | str]) -> list[str]:
        self._guard(*[k._ref() for k in keys if isinstance(k, Column)])
        return _names(keys)

    def _semi_anti_data(
        self, other: _FrameBase[Any], on: JoinCondition | None, anti: bool
    ) -> SparkDF:
        """Shared body of semi_join/anti_join — schema-preserving filtering
        joins (extension; reference joins are inner/left/outer/cross only)."""
        if type(other) is not type(self):
            raise TypeError("cannot mix eager and lazy frames in semi/anti join")
        if self._schema is None or other._schema is None:
            raise SchemaError(message="semi/anti join requires schema-bound frames")
        if not isinstance(on, JoinCondition):
            raise SchemaError(
                message="semi/anti join on= must be a cross-schema equality, "
                "e.g. Users.id == Orders.user_id"
            )
        return self._backend.semi_anti_join(self._data, other._data, on, anti)

    def _melt_data(
        self,
        ids: Sequence[Column | str],
        values: Sequence[Column | str],
        var_name: str,
        value_name: str,
    ) -> SparkDF:
        id_names = self._group_keys(ids)
        value_names = self._group_keys(values)
        if not value_names:
            raise SchemaError(message="melt() requires at least one value column")
        return self._backend.unpivot(
            self._data, id_names, value_names, var_name, value_name
        )

    def _explode_data(self, col: Column | str, outer: bool) -> SparkDF:
        (name,) = self._group_keys([col])
        return self._backend.explode(self._data, name, outer)

    def _set_op(self, other: _FrameBase[S], op: str, all_: bool) -> Self:
        """Shared body of intersect/except_ — ANSI set ops requiring the
        SAME schema class on both sides (nominal typing, like concat)."""
        if type(other) is not type(self):
            raise TypeError(f"{op}() cannot mix DataFrame and LazyFrame")
        if self._schema is not other._schema:
            raise SchemaError(
                message=f"{op}() requires identical schema classes (nominal typing)"
            )
        if self._schema is None and set(self._data.columns) != set(other._data.columns):
            # both schema-erased: fall back to a structural name check
            raise SchemaError(
                message=f"{op}() on schema-erased frames requires identical column names"
            )
        return self._wrap(self._backend.set_op(self._data, other._data, op, all_))

    def intersect(self, other: _FrameBase[S], *, all: bool = False) -> Self:
        """Rows present in both frames (SQL INTERSECT; ``all=True`` keeps
        count-matched duplicates). Extension beyond the reference."""
        return self._set_op(other, "intersect", all)

    def except_(self, other: _FrameBase[S], *, all: bool = False) -> Self:
        """Rows of self not present in ``other`` (SQL EXCEPT; ``all=True``
        subtracts per-occurrence). Extension beyond the reference."""
        return self._set_op(other, "except", all)

    def _join_parts(
        self,
        other: _FrameBase[Any],
        on: JoinCondition | Sequence[JoinCondition] | None,
        how: str,
    ) -> tuple[SparkDF, dict[str, str]]:
        if type(other) is not type(self):
            raise TypeError("cannot mix eager and lazy frames in join()")
        if self._schema is None or other._schema is None:
            raise SchemaError(message="join() requires schema-bound frames")
        if how != "cross":
            conds = [on] if isinstance(on, JoinCondition) else list(on or ())
            if not conds or not all(isinstance(c, JoinCondition) for c in conds):
                raise SchemaError(
                    message="join(on=...) must be a cross-schema equality (or a "
                    "list of them for composite keys), e.g. "
                    "Users.id == Orders.user_id"
                )
        return self._backend.join(self._data, other._data, on, how)

    def _cogroup_keys(
        self,
        other: _FrameBase[Any],
        on: JoinCondition | Sequence[JoinCondition],
    ) -> tuple[list[str], list[str]]:
        """Resolve cogroup key columns per side from cross-schema equality
        conditions; guards ownership like join does (either orientation of
        each equality is accepted)."""
        if type(other) is not type(self):
            raise TypeError("cannot mix eager and lazy frames in cogroup_map()")
        if self._schema is None or other._schema is None:
            raise SchemaError(message="cogroup_map() requires schema-bound frames")
        if isinstance(on, JoinCondition):
            conds = [on]
        elif isinstance(on, (list, tuple)):
            conds = list(on)
        else:
            conds = []  # None / same-schema BinOp / anything else: reject
        if not conds or not all(isinstance(c, JoinCondition) for c in conds):
            raise SchemaError(
                message="cogroup_map(on=...) must be a cross-schema equality "
                "(or a list of them for composite keys), e.g. "
                "Users.id == Orders.user_id"
            )
        lsch, rsch = self._schema, other._schema
        lk: list[str] = []
        rk: list[str] = []
        for c in conds:
            for a, b in [(c.left, c.right), (c.right, c.left)]:
                if (
                    a.schema_name == lsch.__name__
                    and a.name in lsch._columns
                    and b.schema_name == rsch.__name__
                    and b.name in rsch._columns
                ):
                    lk.append(a.name)
                    rk.append(b.name)
                    break
            else:
                raise ColumnGuardError(
                    f"cogroup_map key {c.left.name!r} == {c.right.name!r} does "
                    f"not pair columns of {lsch.__name__} and {rsch.__name__}"
                )
        return lk, rk

    def _cast_data(
        self,
        target: type[Schema],
        mapping: dict[Any, Any] | None,
        extra: str,
    ) -> SparkDF:
        """Bind this frame to ``target``. Resolution precedence per target
        column (reference: dataframe.py:234-290): explicit ``mapping`` →
        ``mapped_from`` declaration → same-name match → error. ``extra`` ∈
        {"drop", "forbid"} controls unmatched source columns."""
        resolved = _resolve_mapping(
            target,
            available=list(self._data.columns),
            mapping=mapping,
            ambiguous=set(),
            extra=extra,
        )
        return self._backend.rename_project(self._data, resolved)

    # -- escape hatch / validation ----------------------------------------
    def with_raw(self, fn: Callable[[SparkDF], SparkDF]) -> Self:
        """Bounded ``unsafe`` block: apply an arbitrary pyspark transform,
        revalidating at the boundary when validation is enabled
        (reference: dataframe.py:653-673)."""
        out = self._wrap(self._backend.with_raw(self._data, fn))
        _boundary_validate(out)
        return out

    def validate(self) -> Self:
        """Explicit structural + value validation regardless of the toggle."""
        if self._schema is None:
            raise SchemaError(message="cannot validate a schema-erased frame")
        err = self._backend.validate_schema(self._data, self._schema)
        if not err.ok:
            raise err
        err = self._backend.validate_values(self._data, self._schema)
        if not err.ok:
            raise err
        return self


class DataFrame(_FrameBase[S]):
    """Logically-materialized frame. Internally lazy (see module docstring);
    materializing methods below trigger Spark jobs."""

    # -- schema-transforming ops (erase to DataFrame[Any]) -----------------
    def select(self, *cols: Column | str) -> DataFrame[Any]:
        """Projection; the result is schema-erased (``DataFrame[Any]``)
        until re-bound with ``cast_schema`` (reference: dataframe.py:586-590)."""
        return DataFrame(self._select_data(cols), None, self._backend)

    def agg(self, *aggs: AliasedExpr) -> DataFrame[Any]:
        return DataFrame(self._agg_data(aggs), None, self._backend)

    def describe(self, *cols: Column | str) -> DataFrame[Any]:
        """Per-column summary stats (EXTENSION): one row per numeric
        column with (col_name, n_non_null, mean, std, lo, hi) — ONE
        aggregation job for all columns, not one per column."""
        return DataFrame(self._describe_data(cols), None, self._backend)

    def group_by(self, *keys: Column | str) -> GroupBy[S]:
        return GroupBy(self, self._group_keys(keys))

    def cube(self, *keys: Column | str) -> GroupBy[S]:
        """All 2^n grouping sets over the keys; result rows carry ``gid``
        (grouping_id, first key = MSB). Extension beyond the reference."""
        return GroupBy(self, self._group_keys(keys), mode="cube")

    def rollup(self, *keys: Column | str) -> GroupBy[S]:
        """Hierarchical prefixes of the keys (n+1 grouping sets); rows
        carry ``gid``. Extension beyond the reference."""
        return GroupBy(self, self._group_keys(keys), mode="rollup")

    def melt(
        self,
        ids: Sequence[Column | str],
        values: Sequence[Column | str],
        var_name: str = "variable",
        value_name: str = "value",
    ) -> DataFrame[Any]:
        """Unpivot value columns into (variable, value) rows; schema-erased
        until ``cast_schema``. Extension beyond the reference."""
        return DataFrame(
            self._melt_data(ids, values, var_name, value_name), None, self._backend
        )

    def join(
        self,
        other: DataFrame[S2],
        on: JoinCondition | Sequence[JoinCondition] | None = None,
        how: str = "inner",
    ) -> JoinedDataFrame[S, S2]:
        data, rename = self._join_parts(other, on, how)
        assert self._schema is not None and other._schema is not None
        return JoinedDataFrame(data, self._schema, other._schema, rename, self._backend)

    def explode(self, col: Column | str, *, outer: bool = False) -> DataFrame[Any]:
        """One row per element of a list column (column keeps its name,
        now element-typed); schema-erased until ``cast_schema``. ``outer``
        keeps empty/null lists as a null element row. Extension beyond the
        reference (which has only list_* element functions)."""
        return DataFrame(self._explode_data(col, outer), None, self._backend)

    def map_batches(
        self, fn: Callable[[Any], Any], target: type[S2]
    ) -> DataFrame[S2]:
        """Arrow-batched escape hatch: stream each partition through ``fn``
        (pandas.DataFrame → pandas.DataFrame with ``target``'s columns) via
        ``mapInPandas`` — distributed, no shuffle, no driver round-trip.
        The declared target schema is enforced at this boundary. Extension
        beyond the reference (whose escape is row-at-a-time iteration)."""
        out: DataFrame[S2] = DataFrame(
            self._backend.map_batches(self._data, fn, target), target, self._backend
        )
        _boundary_validate(out)
        return out

    def cogroup_map(
        self,
        other: DataFrame[Any],
        on: JoinCondition | Sequence[JoinCondition],
        fn: Callable[[Any, Any], Any],
        target: type[S2],
    ) -> DataFrame[S2]:
        """Cogrouped two-table escape hatch: group BOTH frames by the key
        equalities in ``on``, then run ``fn(left_pdf, right_pdf)`` per key
        group executor-side (``applyInPandas`` over a cogroup — Arrow
        batches, one key exchange per side, no driver round-trip). Keys
        present on only one side arrive with an empty frame for the other
        (full-outer semantics). ``fn`` returns rows with ``target``'s
        columns; the declared schema is enforced at this boundary, same as
        ``map_batches``. Extension beyond the reference, which has no
        two-table custom-op shape."""
        lk, rk = self._cogroup_keys(other, on)
        out: DataFrame[S2] = DataFrame(
            self._backend.cogroup_map(
                self._data, other._data, lk, rk, fn, target
            ),
            target,
            self._backend,
        )
        _boundary_validate(out)
        return out

    def semi_join(self, other: DataFrame[Any], on: JoinCondition) -> DataFrame[S]:
        """Rows of self with at least one match in ``other``; keeps this
        frame's schema (filtering join — extension beyond the reference)."""
        return DataFrame(
            self._semi_anti_data(other, on, anti=False), self._schema, self._backend
        )

    def anti_join(self, other: DataFrame[Any], on: JoinCondition) -> DataFrame[S]:
        """Rows of self with no match in ``other``; keeps this frame's
        schema (filtering join — extension beyond the reference)."""
        return DataFrame(
            self._semi_anti_data(other, on, anti=True), self._schema, self._backend
        )

    def cast_schema(
        self,
        target: type[S2],
        mapping: dict[Any, Any] | None = None,
        *,
        extra: str = "drop",
    ) -> DataFrame[S2]:
        out: DataFrame[S2] = DataFrame(
            self._cast_data(target, mapping, extra), target, self._backend
        )
        _boundary_validate(out)
        return out

    # -- materializing methods --------------------------------------------
    def tail(self, n: int) -> Self:
        return self._wrap(self._backend.tail(self._data, n))

    def sample(self, n: int, seed: int | None = None) -> Self:
        return self._wrap(self._backend.sample(self._data, n, seed))

    @property
    def height(self) -> int:
        return self._backend.height(self._data)

    @property
    def width(self) -> int:
        if self._schema is None:
            raise SchemaError(message="width on schema-erased frame")
        return len(self._schema._columns)

    @property
    def shape(self) -> tuple[int, int]:
        return (self.height, len(self._data.columns))

    def __len__(self) -> int:
        return self.height

    def is_empty(self) -> bool:
        return self._data.isEmpty()

    # -- scalar extraction: dtype-directed overloads -----------------------
    # (reference: dataframe.py:387-427; divergence: Time maps to Long
    # microseconds-since-midnight on Spark — item(Column[Time]) is int, not
    # datetime.time — SURVEY.md §1.2.)
    @overload
    def item(self, column: _IntCol) -> int: ...
    @overload
    def item(self, column: _IntColN) -> int | None: ...
    @overload
    def item(self, column: _FloatCol) -> float: ...
    @overload
    def item(self, column: _FloatColN) -> float | None: ...
    @overload
    def item(self, column: Column[Utf8]) -> str: ...
    @overload
    def item(self, column: Column[Utf8 | None]) -> str | None: ...
    @overload
    def item(self, column: Column[Bool]) -> bool: ...
    @overload
    def item(self, column: Column[Bool | None]) -> bool | None: ...
    @overload
    def item(self, column: Column[Binary]) -> bytes: ...
    @overload
    def item(self, column: Column[Binary | None]) -> bytes | None: ...
    @overload
    def item(self, column: Column[Date]) -> _date: ...
    @overload
    def item(self, column: Column[Date | None]) -> _date | None: ...
    @overload
    def item(self, column: Column[Datetime]) -> _datetime: ...
    @overload
    def item(self, column: Column[Datetime | None]) -> _datetime | None: ...
    @overload
    def item(self, column: Column[Duration]) -> _timedelta: ...
    @overload
    def item(self, column: Column[Duration | None]) -> _timedelta | None: ...
    @overload
    def item(self, column: Column[Time]) -> int: ...
    @overload
    def item(self, column: Column[Time | None]) -> int | None: ...
    @overload
    def item(self, column: Column[Any]) -> Any: ...
    @overload
    def item(self, column: str) -> Any: ...
    @overload
    def item(self) -> Any: ...

    def item(self, column: Column[Any] | str | None = None) -> Any:
        name = None if column is None else (column if isinstance(column, str) else column.name)
        return self._backend.item(self._data, name)

    def rows(self) -> list[Any]:
        """Typed rows (schema.Row dataclasses) — driver-side materialization."""
        if self._schema is None:
            return [tuple(r) for r in self._backend.collect_rows(self._data)]
        row_cls = self._schema.Row
        return [row_cls(**d) for d in self._backend.iter_rows(self._data)]

    def iter_rows_as(self, row_type: type) -> Iterator[Any]:
        for d in self._backend.iter_rows(self._data):
            yield row_type(**d)

    def to_batches(self) -> Iterator[Any]:
        from colnade_spark.arrow import ArrowBatch

        if self._schema is None:
            raise SchemaError(message="to_batches requires a schema-bound frame")
        for b in self._backend.to_batches(self._data):
            yield ArrowBatch(b, self._schema)

    def lazy(self) -> LazyFrame[S]:
        return LazyFrame(self._data, self._schema, self._backend)

    # -- construction ------------------------------------------------------
    @classmethod
    def from_dict(cls, data: dict[str, list[Any]], schema: type[S]) -> DataFrame[S]:
        out = cls(_BACKEND.from_dict(data, schema), schema)
        _boundary_validate(out)
        return out

    @classmethod
    def from_rows(cls, rows: Sequence[Any], schema: type[S]) -> DataFrame[S]:
        out = cls(_BACKEND.from_rows(rows, schema), schema)
        _boundary_validate(out)
        return out

    @classmethod
    def from_batches(cls, batches: Iterable[Any], schema: type[S]) -> DataFrame[S]:
        from colnade_spark.arrow import ArrowBatch

        raw = [b.batch if isinstance(b, ArrowBatch) else b for b in batches]
        out = cls(_BACKEND.from_batches(raw, schema), schema)
        _boundary_validate(out)
        return out


class LazyFrame(_FrameBase[S]):
    """Lazy frame; ``collect()`` is the materialization boundary."""

    # -- schema-transforming ops (erase to LazyFrame[Any]) -----------------
    def select(self, *cols: Column | str) -> LazyFrame[Any]:
        """Projection; schema-erased until ``cast_schema`` re-binds."""
        return LazyFrame(self._select_data(cols), None, self._backend)

    def describe(self, *cols: Column | str) -> LazyFrame[Any]:
        """Lazy twin of DataFrame.describe (one aggregation, deferred)."""
        return LazyFrame(self._describe_data(cols), None, self._backend)

    def agg(self, *aggs: AliasedExpr) -> LazyFrame[Any]:
        return LazyFrame(self._agg_data(aggs), None, self._backend)

    def group_by(self, *keys: Column | str) -> LazyGroupBy[S]:
        return LazyGroupBy(self, self._group_keys(keys))

    def cube(self, *keys: Column | str) -> LazyGroupBy[S]:
        """All 2^n grouping sets over the keys; rows carry ``gid``."""
        return LazyGroupBy(self, self._group_keys(keys), mode="cube")

    def rollup(self, *keys: Column | str) -> LazyGroupBy[S]:
        """Hierarchical prefixes of the keys; rows carry ``gid``."""
        return LazyGroupBy(self, self._group_keys(keys), mode="rollup")

    def melt(
        self,
        ids: Sequence[Column | str],
        values: Sequence[Column | str],
        var_name: str = "variable",
        value_name: str = "value",
    ) -> LazyFrame[Any]:
        """Unpivot value columns into (variable, value) rows."""
        return LazyFrame(
            self._melt_data(ids, values, var_name, value_name), None, self._backend
        )

    def join(
        self,
        other: LazyFrame[S2],
        on: JoinCondition | Sequence[JoinCondition] | None = None,
        how: str = "inner",
    ) -> JoinedLazyFrame[S, S2]:
        data, rename = self._join_parts(other, on, how)
        assert self._schema is not None and other._schema is not None
        return JoinedLazyFrame(data, self._schema, other._schema, rename, self._backend)

    def explode(self, col: Column | str, *, outer: bool = False) -> LazyFrame[Any]:
        """One row per element of a list column (schema-erased)."""
        return LazyFrame(self._explode_data(col, outer), None, self._backend)

    def map_batches(
        self, fn: Callable[[Any], Any], target: type[S2]
    ) -> LazyFrame[S2]:
        """Arrow-batched partition-wise transform (see DataFrame.map_batches)."""
        out: LazyFrame[S2] = LazyFrame(
            self._backend.map_batches(self._data, fn, target), target, self._backend
        )
        _boundary_validate(out)
        return out

    def cogroup_map(
        self,
        other: LazyFrame[Any],
        on: JoinCondition | Sequence[JoinCondition],
        fn: Callable[[Any, Any], Any],
        target: type[S2],
    ) -> LazyFrame[S2]:
        """Cogrouped two-table escape hatch (see DataFrame.cogroup_map)."""
        lk, rk = self._cogroup_keys(other, on)
        out: LazyFrame[S2] = LazyFrame(
            self._backend.cogroup_map(
                self._data, other._data, lk, rk, fn, target
            ),
            target,
            self._backend,
        )
        _boundary_validate(out)
        return out

    def semi_join(self, other: LazyFrame[Any], on: JoinCondition) -> LazyFrame[S]:
        """Rows of self with at least one match in ``other`` (keeps S)."""
        return LazyFrame(
            self._semi_anti_data(other, on, anti=False), self._schema, self._backend
        )

    def anti_join(self, other: LazyFrame[Any], on: JoinCondition) -> LazyFrame[S]:
        """Rows of self with no match in ``other`` (keeps S)."""
        return LazyFrame(
            self._semi_anti_data(other, on, anti=True), self._schema, self._backend
        )

    def cast_schema(
        self,
        target: type[S2],
        mapping: dict[Any, Any] | None = None,
        *,
        extra: str = "drop",
    ) -> LazyFrame[S2]:
        out: LazyFrame[S2] = LazyFrame(
            self._cast_data(target, mapping, extra), target, self._backend
        )
        _boundary_validate(out)
        return out

    def collect(self) -> DataFrame[S]:
        return DataFrame(self._data, self._schema, self._backend)

    def lazy(self) -> LazyFrame[S]:
        return self

    @property
    def width(self) -> int:
        if self._schema is None:
            raise SchemaError(message="width on schema-erased frame")
        return len(self._schema._columns)


class _GroupByBase(Generic[S]):
    """Transitional object from ``group_by()``/``cube()``/``rollup()``;
    only ``.agg()`` (reference: dataframe.py:1133-1180; cube/rollup are
    extensions — the reference has no grouping sets, SURVEY.md §2.6)."""

    def __init__(self, frame: _FrameBase[S], keys: list[str], mode: str = "group"):
        self._frame = frame
        self._keys = keys
        self._mode = mode

    def _agg_data(self, aggs: Sequence[AliasedExpr]) -> SparkDF:
        for a in aggs:
            if not isinstance(a, AliasedExpr):
                raise TypeError("group_by().agg() requires aliased aggregate expressions")
        self._frame._guard(*aggs)
        if self._mode == "group":
            return self._frame._backend.group_agg(
                self._frame._data, self._keys, list(aggs)
            )
        return self._frame._backend.grouped_sets_agg(
            self._frame._data, self._keys, list(aggs), self._mode
        )


    def _pivot_check(self, col: Column | str, values: Sequence[Any]) -> str:
        if self._mode != "group":
            raise SchemaError(message="pivot() is not defined on cube()/rollup()")
        if not values:
            raise SchemaError(
                message="pivot() requires explicit values — enumerating distinct "
                "pivot values server-side would scan the table at the driver; "
                "declare the categories you want as columns"
            )
        (name,) = self._frame._group_keys([col])
        return name

class GroupBy(_GroupByBase[S]):
    def agg(self, *aggs: AliasedExpr) -> DataFrame[Any]:
        return DataFrame(self._agg_data(aggs), None, self._frame._backend)

    def pivot(self, col: Column | str, values: Sequence[Any]) -> PivotedGroupBy[S]:
        """Spread ``col``'s declared ``values`` into one output column per
        value (inverse of melt; extension beyond the reference). Values
        must be given explicitly — the scale-safe contract."""
        name = self._pivot_check(col, values)
        return PivotedGroupBy(self._frame, self._keys, name, list(values))


class LazyGroupBy(_GroupByBase[S]):
    def agg(self, *aggs: AliasedExpr) -> LazyFrame[Any]:
        return LazyFrame(self._agg_data(aggs), None, self._frame._backend)

    def pivot(self, col: Column | str, values: Sequence[Any]) -> LazyPivotedGroupBy[S]:
        """Spread ``col``'s declared ``values`` into output columns."""
        name = self._pivot_check(col, values)
        return LazyPivotedGroupBy(self._frame, self._keys, name, list(values))


class _PivotedBase(_GroupByBase[S]):
    """Transitional object from ``group_by().pivot()``. Output columns:
    group keys, then one column per pivot value (single agg → named
    exactly the value; k aggs → ``{value}_{alias}``, Spark convention)."""

    def __init__(
        self,
        frame: _FrameBase[S],
        keys: list[str],
        pivot_name: str,
        values: list[Any],
    ):
        super().__init__(frame, keys)
        self._pivot_name = pivot_name
        self._values = values

    def _pivot_data(self, aggs: Sequence[AliasedExpr]) -> SparkDF:
        for a in aggs:
            if not isinstance(a, AliasedExpr):
                raise TypeError("pivot().agg() requires aliased aggregate expressions")
        self._frame._guard(*aggs)
        return self._frame._backend.pivot_agg(
            self._frame._data, self._keys, self._pivot_name, self._values, list(aggs)
        )


class PivotedGroupBy(_PivotedBase[S]):
    def agg(self, *aggs: AliasedExpr) -> DataFrame[Any]:
        return DataFrame(self._pivot_data(aggs), None, self._frame._backend)


class LazyPivotedGroupBy(_PivotedBase[S]):
    def agg(self, *aggs: AliasedExpr) -> LazyFrame[Any]:
        return LazyFrame(self._pivot_data(aggs), None, self._frame._backend)


# Backward-compat alias (pre-typing name).
_GroupBy = GroupBy


class _JoinedBase(Generic[S, S2]):
    """Two-schema frame produced by ``join()``; row-level ops allowed,
    ``cast_schema`` flattens to a single schema
    (reference: dataframe.py:1188-1643)."""

    def __init__(
        self,
        data: SparkDF,
        left_schema: type[S],
        right_schema: type[S2],
        rename: dict[str, str],
        backend: SparkBackend = _BACKEND,
    ) -> None:
        self._data = data
        self._left = left_schema
        self._right = right_schema
        self._rename = rename  # right original name -> actual name in data
        self._backend = backend

    @property
    def native(self) -> SparkDF:
        return self._data

    def explain(self, mode: str = "formatted") -> None:
        self._data.explain(mode)

    # resolve a ColumnRef against the two schemas, applying right-side renames
    def _mapper(self, ref):
        if ref.schema_name == self._right.__name__ and ref.name in self._rename:
            return self._rename[ref.name]
        return ref.name

    def _rw(self, e):
        return rewrite_refs(e, self._mapper)

    def _guard(self, *exprs: Any) -> None:
        allowed = set(self._left._columns) | set(self._right._columns)
        for e in exprs:
            missing = sorted(collect_column_names(e) - allowed)
            if missing:
                raise ColumnGuardError(
                    message=f"expression references columns in neither "
                    f"{self._left.__name__} nor {self._right.__name__}",
                    missing_columns=missing,
                )

    def _wrap(self, data: SparkDF) -> Self:
        return type(self)(data, self._left, self._right, self._rename, self._backend)

    def filter(self, predicate: Expr) -> Self:
        self._guard(predicate)
        return self._wrap(self._backend.filter(self._data, self._rw(predicate)))

    def with_columns(self, *exprs: AliasedExpr) -> Self:
        self._guard(*exprs)
        return self._wrap(
            self._backend.with_columns(self._data, [self._rw(e) for e in exprs])
        )

    def sort(self, *by: Column | SortExpr, descending: bool = False) -> Self:
        sort_exprs = [
            b if isinstance(b, SortExpr) else SortExpr(b._ref(), descending=descending)
            for b in by
        ]
        self._guard(*sort_exprs)
        return self._wrap(
            self._backend.sort(self._data, [self._rw(s) for s in sort_exprs])
        )

    def limit(self, n: int) -> Self:
        return self._wrap(self._backend.limit(self._data, n))

    def _cast_data(
        self,
        target: type[Schema],
        mapping: dict[Any, Any] | None,
        extra: str,
    ) -> SparkDF:
        """Flatten to ``target``. Columns whose plain name exists in BOTH
        input schemas are ambiguous and require explicit ``mapping`` or a
        ``mapped_from`` declaration naming the owning schema
        (reference: dataframe.py:1381-1400)."""
        ambiguous = set(self._left._columns) & set(self._right._columns)
        resolved = _resolve_mapping(
            target,
            available=list(self._data.columns),
            mapping=mapping,
            ambiguous=ambiguous,
            extra=extra,
            joined=self,
        )
        return self._backend.rename_project(self._data, resolved)


S3 = TypeVar("S3", bound=Schema)


class JoinedDataFrame(_JoinedBase[S, S2]):
    @property
    def height(self) -> int:
        return self._backend.height(self._data)

    def cast_schema(
        self,
        target: type[S3],
        mapping: dict[Any, Any] | None = None,
        *,
        extra: str = "drop",
    ) -> DataFrame[S3]:
        out: DataFrame[S3] = DataFrame(
            self._cast_data(target, mapping, extra), target, self._backend
        )
        _boundary_validate(out)
        return out


class JoinedLazyFrame(_JoinedBase[S, S2]):
    def collect(self) -> JoinedDataFrame[S, S2]:
        return JoinedDataFrame(
            self._data, self._left, self._right, self._rename, self._backend
        )

    def cast_schema(
        self,
        target: type[S3],
        mapping: dict[Any, Any] | None = None,
        *,
        extra: str = "drop",
    ) -> LazyFrame[S3]:
        out: LazyFrame[S3] = LazyFrame(
            self._cast_data(target, mapping, extra), target, self._backend
        )
        _boundary_validate(out)
        return out


def _source_name_for(col_or_name: Any, joined: _JoinedBase | None) -> str:
    """Resolve a mapping *source* (Column or str) to the actual column name
    in the underlying data, applying joined-frame right-side renames."""
    if isinstance(col_or_name, str):
        return col_or_name
    col = col_or_name
    if joined is not None and col.schema is joined._right:
        return joined._rename.get(col.name, col.name)
    return col.name


def _resolve_mapping(
    target: type,
    available: list[str],
    mapping: dict[Any, Any] | None,
    ambiguous: set[str],
    extra: str,
    joined: _JoinedBase | None = None,
) -> dict[str, str]:
    """Pure-Python cast_schema resolution (reference: dataframe.py:234-290).

    Returns {target column name -> source column name in data}.
    """
    explicit: dict[str, str] = {}
    if mapping:
        for k, v in mapping.items():
            tgt_name = k if isinstance(k, str) else k.name
            explicit[tgt_name] = _source_name_for(v, joined)

    avail = set(available)
    resolved: dict[str, str] = {}
    for name, col in target._columns.items():
        if name in explicit:
            src = explicit[name]
        elif col._mapped_from is not None:
            src = _source_name_for(col._mapped_from.source, joined)
        elif name in ambiguous:
            raise SchemaError(
                message=f"column {name!r} is ambiguous after join (defined in "
                "both schemas); provide an explicit mapping or mapped_from",
            )
        elif name in avail:
            src = name
        else:
            raise SchemaError(
                message=f"cast_schema: no source for target column {name!r}",
                missing_columns=[name],
            )
        if src not in avail:
            raise SchemaError(
                message=f"cast_schema: source column {src!r} not present",
                missing_columns=[src],
            )
        resolved[name] = src

    if extra == "forbid":
        used = set(resolved.values())
        extras = sorted(avail - used)
        if extras:
            raise SchemaError(
                message="cast_schema(extra='forbid'): unmatched source columns",
                extra_columns=extras,
            )
    elif extra != "drop":
        raise SchemaError(message=f"extra must be 'drop' or 'forbid', got {extra!r}")
    return resolved


def _boundary_validate(frame: Any) -> None:
    """Auto-validation at data boundaries, honoring the process-wide level
    (reference: io boundary validation, colnade_polars/io.py:28-31)."""
    level = get_validation()
    if level is ValidationLevel.OFF or frame._schema is None:
        return
    err = frame._backend.validate_schema(frame._data, frame._schema)
    if not err.ok:
        raise err
    if level is ValidationLevel.FULL:
        err = frame._backend.validate_values(frame._data, frame._schema)
        if not err.ok:
            raise err


@overload
def concat(frames: Sequence[DataFrame[S]]) -> DataFrame[S]: ...
@overload
def concat(frames: Sequence[LazyFrame[S]]) -> LazyFrame[S]: ...


def concat(frames: Sequence[_FrameBase[S]]) -> _FrameBase[S]:
    """Vertical concatenation of ≥2 same-schema-class frames; mixing eager
    and lazy frames is an error (reference: dataframe.py:106-164)."""
    if len(frames) < 2:
        raise ValueError("concat() requires at least 2 frames")
    first = frames[0]
    for f in frames[1:]:
        if type(f) is not type(first):
            raise TypeError("concat() cannot mix DataFrame and LazyFrame")
        if f._schema is not first._schema:
            raise SchemaError(
                message="concat() requires identical schema classes (nominal typing)"
            )
    data = first._backend.concat([f._data for f in frames])
    return type(first)(data, first._schema, first._backend)


@overload
def broadcast(frame: DataFrame[S]) -> DataFrame[S]: ...
@overload
def broadcast(frame: LazyFrame[S]) -> LazyFrame[S]: ...


def broadcast(frame: _FrameBase[S]) -> _FrameBase[S]:
    """Hint that this frame should be BROADCAST in subsequent joins —
    replicated to every executor so the big side never shuffles. The typed
    lever for known-small dimension tables above Spark's automatic
    broadcast threshold. Schema-preserving; extension beyond the
    reference (whose engines have no distributed join planning)."""
    return frame._wrap(frame._backend.broadcast_hint(frame._data))
