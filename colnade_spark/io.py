"""Schema-driven I/O: Parquet + CSV readers/writers.

Mirrors the reference's per-backend io modules (reference:
colnade-polars/src/colnade_polars/io.py:24-102): the schema is always an
argument — never inferred — and boundary validation honors the process-wide
level.

Scale notes:
- Reads pass the declared schema to ``spark.read.schema(...)`` so the parquet
  vectorized reader prunes columns at the scan and predicate pushdown has
  concrete types to push into.
- ``scan_*`` and ``read_*`` both return lazy plans (Spark reads are lazy);
  ``read_*`` returns the eager-styled ``DataFrame`` facade, ``scan_*`` the
  ``LazyFrame`` facade.
- Writers accept ``partition_by`` so 100 TB outputs land partitioned.
"""

from __future__ import annotations

from typing import TypeVar

from pyspark.sql import SparkSession

from colnade_spark.conversion import to_struct_type
from colnade_spark.dataframe import DataFrame, LazyFrame, _boundary_validate
from colnade_spark.schema import Column, Schema
from colnade_spark.session import get_spark

S = TypeVar("S", bound=Schema)


def _reader(spark: SparkSession | None) -> SparkSession:
    return spark if spark is not None else get_spark()


def read_parquet(
    path: str, schema: type[S], *, spark: SparkSession | None = None
) -> DataFrame[S]:
    sp = _reader(spark)
    # project to declared columns: extra file columns are dropped at the scan
    names = list(schema._columns)
    data = sp.read.parquet(path).select(*names)
    out = DataFrame(data, schema)
    _boundary_validate(out)
    return out


def scan_parquet(
    path: str, schema: type[S], *, spark: SparkSession | None = None
) -> LazyFrame[S]:
    sp = _reader(spark)
    names = list(schema._columns)
    data = sp.read.parquet(path).select(*names)
    out = LazyFrame(data, schema)
    _boundary_validate(out)
    return out


def read_csv(
    path: str,
    schema: type[S],
    *,
    header: bool = True,
    spark: SparkSession | None = None,
) -> DataFrame[S]:
    sp = _reader(spark)
    data = sp.read.schema(to_struct_type(schema)).csv(path, header=header)
    out = DataFrame(data, schema)
    _boundary_validate(out)
    return out


def scan_csv(
    path: str,
    schema: type[S],
    *,
    header: bool = True,
    spark: SparkSession | None = None,
) -> LazyFrame[S]:
    sp = _reader(spark)
    data = sp.read.schema(to_struct_type(schema)).csv(path, header=header)
    out = LazyFrame(data, schema)
    _boundary_validate(out)
    return out


def write_parquet(
    frame: DataFrame | LazyFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str | Column] | None = None,
) -> None:
    writer = frame.native.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(
            *[c if isinstance(c, str) else c.name for c in partition_by]
        )
    writer.parquet(path)


def write_csv(
    frame: DataFrame | LazyFrame,
    path: str,
    *,
    mode: str = "overwrite",
    header: bool = True,
) -> None:
    frame.native.write.mode(mode).option("header", str(header).lower()).csv(path)
