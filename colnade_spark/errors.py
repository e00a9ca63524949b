"""Structured error types raised by schema / value validation.

Mirrors the reference's error surface (reference: src/colnade/schema.py:79-120
and src/colnade/constraints.py:84-91): a single ``SchemaError`` carrying
structured fields so callers can assert on exactly what failed.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class TypeMismatch:
    column: str
    expected: str
    actual: str


@dataclass(frozen=True)
class NullViolation:
    column: str
    null_count: int


@dataclass(frozen=True)
class ValueViolation:
    """One violated ``Field()`` constraint or ``@schema_check`` invariant."""

    column: str
    constraint: str
    got_count: int
    sample_values: tuple[Any, ...] = ()


@dataclass
class SchemaError(Exception):
    message: str = ""
    missing_columns: list[str] = field(default_factory=list)
    extra_columns: list[str] = field(default_factory=list)
    type_mismatches: list[TypeMismatch] = field(default_factory=list)
    null_violations: list[NullViolation] = field(default_factory=list)
    value_violations: list[ValueViolation] = field(default_factory=list)

    def __str__(self) -> str:
        parts = [self.message] if self.message else []
        if self.missing_columns:
            parts.append(f"missing columns: {self.missing_columns}")
        if self.extra_columns:
            parts.append(f"extra columns: {self.extra_columns}")
        if self.type_mismatches:
            parts.append(
                "type mismatches: "
                + ", ".join(
                    f"{m.column} (expected {m.expected}, got {m.actual})"
                    for m in self.type_mismatches
                )
            )
        if self.null_violations:
            parts.append(
                "null violations: "
                + ", ".join(f"{v.column} ({v.null_count} nulls)" for v in self.null_violations)
            )
        if self.value_violations:
            parts.append(
                "value violations: "
                + ", ".join(
                    f"{v.column}[{v.constraint}] x{v.got_count} sample={list(v.sample_values)!r}"
                    for v in self.value_violations
                )
            )
        return "; ".join(parts) or "SchemaError"

    @property
    def ok(self) -> bool:
        return not (
            self.missing_columns
            or self.extra_columns
            or self.type_mismatches
            or self.null_violations
            or self.value_violations
        )


class ColumnGuardError(SchemaError):
    """Expression references columns not present in the frame's schema."""
