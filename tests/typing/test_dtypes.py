"""Static type tests for the dtype lattice (mypy --strict / ty).

Must produce zero type errors. The sentinel dtype classes form a runtime
lattice (NumericType > IntegerType > Int64, ...) used by the runtime
method gates; statically they are ordinary classes usable as Column
parameters.

(Reference shape: /root/reference/tests/typing/test_dtypes.py.)
"""

from colnade_spark import (
    Binary,
    Bool,
    Column,
    Date,
    Datetime,
    Decimal,
    Duration,
    Float32,
    Float64,
    Int8,
    Int16,
    Int32,
    Int64,
    List,
    Schema,
    Struct,
    Time,
    UInt8,
    UInt16,
    UInt32,
    UInt64,
    Utf8,
)
from colnade_spark.dtypes import (
    DType,
    FloatType,
    IntegerType,
    NumericType,
    SignedIntegerType,
    TemporalType,
    UnsignedIntegerType,
)

# --- The lattice is statically visible as a class hierarchy ----------------


def check_integer_lattice() -> None:
    _a: type[SignedIntegerType] = Int8
    _b: type[SignedIntegerType] = Int64
    _c: type[UnsignedIntegerType] = UInt8
    _d: type[IntegerType] = Int32
    _e: type[IntegerType] = UInt32
    _f: type[NumericType] = Int16
    _ = (_a, _b, _c, _d, _e, _f)


def check_float_lattice() -> None:
    _a: type[FloatType] = Float32
    _b: type[FloatType] = Float64
    _c: type[NumericType] = Float64
    _ = (_a, _b, _c)


def check_temporal_lattice() -> None:
    _a: type[TemporalType] = Date
    _b: type[TemporalType] = Datetime
    _c: type[TemporalType] = Time
    _d: type[TemporalType] = Duration
    _ = (_a, _b, _c, _d)


def check_scalar_dtypes_are_dtypes() -> None:
    _a: type[DType] = Bool
    _b: type[DType] = Utf8
    _c: type[DType] = Binary
    _d: type[DType] = UInt16
    _e: type[DType] = UInt64
    _ = (_a, _b, _c, _d, _e)


# --- All dtypes are legal Column parameters --------------------------------


class Everything(Schema):
    c_bool: Column[Bool]
    c_i8: Column[Int8]
    c_i16: Column[Int16]
    c_i32: Column[Int32]
    c_i64: Column[Int64]
    c_u8: Column[UInt8]
    c_u16: Column[UInt16]
    c_u32: Column[UInt32]
    c_u64: Column[UInt64]
    c_f32: Column[Float32]
    c_f64: Column[Float64]
    c_str: Column[Utf8]
    c_bin: Column[Binary]
    c_date: Column[Date]
    c_time: Column[Time]
    c_dt: Column[Datetime]
    c_dur: Column[Duration]
    c_nullable: Column[Float64 | None]


def check_everything_columns() -> None:
    _a: Column[Bool] = Everything.c_bool
    _b: Column[Float64 | None] = Everything.c_nullable
    _ = (_a, _b)


# --- Parameterized dtypes (runtime subscription) ---------------------------
# List[...] / Struct[...] / Decimal[p, s] build parameterized sentinel
# CLASSES through a metaclass __getitem__ at class-definition time. Type
# checkers do not model metaclass __getitem__, so these annotations live
# behind runtime schema construction and the static story is documented as
# a LIMITATION in test_coverage_matrix.py (rows 23-24). The runtime objects
# are still statically `type` values:


def check_parameterized_dtypes_are_classes() -> None:
    _l: type = List[Float64]
    _s: type = Struct
    _d: type = Decimal
    _ = (_l, _s, _d)
