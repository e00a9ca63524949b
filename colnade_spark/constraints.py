"""Value-level constraints: ``Field()`` per-column rules and ``@schema_check``
cross-column invariants.

Semantics mirror the reference (reference: src/colnade/constraints.py:23-172):
``ge/gt/le/lt`` numeric bounds, ``min_length/max_length`` string lengths,
``pattern`` regex *search* (unanchored — the reference uses Polars
``str.contains``), ``unique``, ``isin``. Cross-column checks are
expression-producing callables registered on the schema class.

At scale the Spark backend folds ALL constraint checks into a single
aggregation job (see SparkBackend.validate_values) instead of one scan per
constraint — one pass over 100 TB, not N.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class FieldInfo:
    ge: float | None = None
    gt: float | None = None
    le: float | None = None
    lt: float | None = None
    min_length: int | None = None
    max_length: int | None = None
    pattern: str | None = None
    unique: bool = False
    isin: tuple[Any, ...] | None = None

    def constraints(self) -> list[tuple[str, Any]]:
        """(name, parameter) pairs for each active constraint."""
        out: list[tuple[str, Any]] = []
        for name in ("ge", "gt", "le", "lt", "min_length", "max_length", "pattern"):
            v = getattr(self, name)
            if v is not None:
                out.append((name, v))
        if self.unique:
            out.append(("unique", True))
        if self.isin is not None:
            out.append(("isin", self.isin))
        return out

    @property
    def has_constraints(self) -> bool:
        return bool(self.constraints())


def Field(
    *,
    ge: float | None = None,
    gt: float | None = None,
    le: float | None = None,
    lt: float | None = None,
    min_length: int | None = None,
    max_length: int | None = None,
    pattern: str | None = None,
    unique: bool = False,
    isin: Sequence[Any] | None = None,
) -> FieldInfo:
    return FieldInfo(
        ge=ge,
        gt=gt,
        le=le,
        lt=lt,
        min_length=min_length,
        max_length=max_length,
        pattern=pattern,
        unique=unique,
        isin=tuple(isin) if isin is not None else None,
    )


@dataclass
class SchemaCheck:
    """A named cross-column invariant: callable returning an Expr[Bool]."""

    name: str
    fn: Callable[..., Any] = field(repr=False, default=None)  # type: ignore[assignment]


def schema_check(fn: Callable[..., Any]) -> SchemaCheck:
    """Decorator marking a classmethod-style function as a cross-column
    invariant. The function receives the schema class and returns a boolean
    expression that must hold for every row::

        class Events(Schema):
            start: Column[Datetime]
            end: Column[Datetime]

            @schema_check
            def valid_range(cls):
                return cls.start <= cls.end
    """
    return SchemaCheck(name=fn.__name__, fn=fn)
