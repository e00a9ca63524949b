"""colnade-spark: a statically-typed DataFrame layer executing on PySpark.

A from-scratch, Spark-first rebuild of the capabilities of jwde/colnade
(reference at /root/reference): users declare schemas as Python classes,
column references are typed class attributes, operations build an expression
AST, and the Spark backend translates the AST to ``pyspark.sql.Column``
expressions — so the whole pipeline is ONE Catalyst logical plan with
predicate pushdown, column pruning, join planning and AQE for free.

Beyond reference parity, ``colnade_spark.operators`` adds large-scale
training-data pipeline operators: dedup (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding), similarity search, text analysis, and
multimodal column plumbing.
"""

from colnade_spark.arrow import ArrowBatch
from colnade_spark.constraints import Field, FieldInfo, schema_check
from colnade_spark.dataframe import (
    DataFrame,
    GroupBy,
    JoinedDataFrame,
    JoinedLazyFrame,
    LazyFrame,
    LazyGroupBy,
    LazyPivotedGroupBy,
    PivotedGroupBy,
    broadcast,
    concat,
)
from colnade_spark.dtypes import (
    Binary,
    Bool,
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
    Struct,
    Time,
    UInt8,
    UInt16,
    UInt32,
    UInt64,
    Utf8,
)
from colnade_spark.errors import ColumnGuardError, SchemaError, ValueViolation
from colnade_spark.expr import (
    cum_count,
    cum_max,
    cum_mean,
    cum_min,
    cum_sum,
    dense_rank,
    lag,
    lead,
    lit,
    ntile,
    rank,
    row_number,
    when,
)
from colnade_spark.io import (
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    read_table,
    scan_csv,
    scan_json,
    scan_orc,
    scan_parquet,
    write_bucketed_table,
    write_csv,
    write_json,
    write_orc,
    write_parquet,
)
from colnade_spark.schema import Column, Schema, mapped_from
from colnade_spark.session import get_spark
from colnade_spark.validation import ValidationLevel, get_validation, set_validation

__version__ = "0.1.0"

__all__ = [
    "ArrowBatch",
    "Binary",
    "Bool",
    "Column",
    "ColumnGuardError",
    "DataFrame",
    "Date",
    "Datetime",
    "Decimal",
    "Duration",
    "Field",
    "FieldInfo",
    "Float32",
    "Float64",
    "GroupBy",
    "Int8",
    "Int16",
    "Int32",
    "Int64",
    "JoinedDataFrame",
    "JoinedLazyFrame",
    "LazyFrame",
    "LazyGroupBy",
    "List",
    "Schema",
    "SchemaError",
    "Struct",
    "Time",
    "UInt8",
    "UInt16",
    "UInt32",
    "UInt64",
    "Utf8",
    "ValidationLevel",
    "ValueViolation",
    "broadcast",
    "concat",
    "get_spark",
    "get_validation",
    "lit",
    "mapped_from",
    "read_csv",
    "read_json",
    "read_orc",
    "read_table",
    "read_parquet",
    "scan_csv",
    "scan_json",
    "scan_orc",
    "scan_parquet",
    "schema_check",
    "set_validation",
    "cum_count",
    "cum_max",
    "cum_mean",
    "cum_min",
    "cum_sum",
    "dense_rank",
    "lag",
    "lead",
    "ntile",
    "rank",
    "row_number",
    "when",
    "PivotedGroupBy",
    "LazyPivotedGroupBy",
    "write_bucketed_table",
    "write_csv",
    "write_json",
    "write_orc",
    "write_parquet",
]
