"""Dtype conversion: colnade dtypes ⇄ ``pyspark.sql.types``.

Analog of the reference's per-engine conversion modules (reference:
colnade-polars/src/colnade_polars/conversion.py:16-95). Both directions are
recursive for Struct/List; nullable unions are stripped before mapping and
re-expressed as ``StructField(nullable=...)``.

Unsigned-integer policy (SURVEY.md §1.2): Spark has no unsigned types, so we
WIDEN — UInt8→Short, UInt16→Int, UInt32→Long, UInt64→Long. The widening is
recorded so structural validation accepts the widened Spark type for an
unsigned declared dtype, and FULL validation adds a ``ge=0`` check. ``Time``
maps to LongType microseconds-since-midnight (no Spark TIME type).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

from colnade_spark import dtypes as dt
from colnade_spark.errors import SchemaError

_SIMPLE: dict[type, T.DataType] = {
    dt.Bool: T.BooleanType(),
    dt.Int8: T.ByteType(),
    dt.Int16: T.ShortType(),
    dt.Int32: T.IntegerType(),
    dt.Int64: T.LongType(),
    dt.UInt8: T.ShortType(),
    dt.UInt16: T.IntegerType(),
    dt.UInt32: T.LongType(),
    dt.UInt64: T.LongType(),
    dt.Float32: T.FloatType(),
    dt.Float64: T.DoubleType(),
    dt.Utf8: T.StringType(),
    dt.Binary: T.BinaryType(),
    dt.Date: T.DateType(),
    dt.Time: T.LongType(),  # µs since midnight
    dt.Datetime: T.TimestampType(),
    dt.Duration: T.DayTimeIntervalType(),
}


def to_spark_type(dtype: Any) -> T.DataType:
    """colnade dtype (nullability already stripped) → Spark DataType."""
    stripped = dt.strip_nullable(dtype)
    if stripped is not None:
        dtype = stripped[0]
    if isinstance(dtype, type):
        if issubclass(dtype, dt.Decimal):
            return T.DecimalType(dtype.precision, dtype.scale)
        if issubclass(dtype, dt.List):
            elem = dtype.element
            inner = dt.strip_nullable(elem)
            contains_null = inner[1] if inner is not None else True
            return T.ArrayType(to_spark_type(elem), containsNull=contains_null)
        if issubclass(dtype, dt.Map):
            if dtype.key is None or dtype.value is None:
                raise SchemaError(message="bare Map without key/value parameters")
            val = dtype.value
            inner = dt.strip_nullable(val)
            value_contains_null = inner[1] if inner is not None else True
            return T.MapType(
                to_spark_type(dtype.key),
                to_spark_type(val),
                valueContainsNull=value_contains_null,
            )
        if issubclass(dtype, dt.Struct):
            if dtype.schema is None:
                raise SchemaError(message="bare Struct without schema parameter")
            return to_struct_type(dtype.schema)
        for base, spark_t in _SIMPLE.items():
            if dtype is base:
                return spark_t
    raise SchemaError(message=f"no Spark mapping for dtype {dt.dtype_name(dtype)}")


def to_struct_type(schema: Any) -> T.StructType:
    """Schema class → Spark StructType (recursive)."""
    fields = [
        T.StructField(c.name, to_spark_type(c.dtype), nullable=c.nullable)
        for c in schema._columns.values()
    ]
    return T.StructType(fields)


def spark_type_compatible(declared: Any, actual: T.DataType) -> bool:
    """True when the engine type ``actual`` can carry the declared dtype.

    Exact match on the mapped type; timestamps accept both LTZ and NTZ
    flavors (parquet files carry either depending on writer metadata).
    """
    expected = to_spark_type(declared)
    if expected == actual:
        return True
    if isinstance(expected, (T.TimestampType, T.TimestampNTZType)) and isinstance(
        actual, (T.TimestampType, T.TimestampNTZType)
    ):
        return True
    if isinstance(expected, T.ArrayType) and isinstance(actual, T.ArrayType):
        return spark_type_compatible_raw(expected.elementType, actual.elementType)
    if isinstance(expected, T.StructType) and isinstance(actual, T.StructType):
        if [f.name for f in expected.fields] != [f.name for f in actual.fields]:
            return False
        return all(
            spark_type_compatible_raw(e.dataType, a.dataType)
            for e, a in zip(expected.fields, actual.fields)
        )
    return False


def spark_type_compatible_raw(expected: T.DataType, actual: T.DataType) -> bool:
    if expected == actual:
        return True
    if isinstance(expected, (T.TimestampType, T.TimestampNTZType)) and isinstance(
        actual, (T.TimestampType, T.TimestampNTZType)
    ):
        return True
    if isinstance(expected, T.ArrayType) and isinstance(actual, T.ArrayType):
        return spark_type_compatible_raw(expected.elementType, actual.elementType)
    if isinstance(expected, T.StructType) and isinstance(actual, T.StructType):
        if [f.name for f in expected.fields] != [f.name for f in actual.fields]:
            return False
        return all(
            spark_type_compatible_raw(e.dataType, a.dataType)
            for e, a in zip(expected.fields, actual.fields)
        )
    return False


def unsigned_columns(schema: Any) -> list[str]:
    """Names of declared-unsigned columns (get a ge=0 check under FULL)."""
    return [
        c.name
        for c in schema._columns.values()
        if isinstance(c.dtype, type) and issubclass(c.dtype, dt.UnsignedIntegerType)
    ]
