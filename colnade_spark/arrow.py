"""Typed Arrow boundary: ``ArrowBatch[S]`` preserves the schema parameter
across engine hand-offs (reference: src/colnade/arrow.py:17-83).

Arrow is the sanctioned cross-engine interchange: ``DataFrame.to_batches()``
uses Spark's Arrow collect path, ``DataFrame.from_batches()`` feeds
``createDataFrame``. Name-level validation happens on wrap.
"""

from __future__ import annotations

from typing import Generic, TypeVar

import pyarrow as pa

from colnade_spark.errors import SchemaError
from colnade_spark.schema import Schema

S = TypeVar("S", bound=Schema)


class ArrowBatch(Generic[S]):
    """Wrapper over ``pyarrow.RecordBatch`` carrying the schema parameter."""

    def __init__(self, batch: pa.RecordBatch, schema: type[S]) -> None:
        declared = list(schema._columns)
        actual = batch.schema.names
        if actual != declared:
            raise SchemaError(
                message=f"ArrowBatch column mismatch for {schema.__name__}",
                missing_columns=[c for c in declared if c not in actual],
                extra_columns=[c for c in actual if c not in declared],
            )
        self.batch = batch
        self.schema = schema

    @property
    def num_rows(self) -> int:
        return self.batch.num_rows

    def to_pydict(self) -> dict:
        return self.batch.to_pydict()

    def __repr__(self) -> str:
        return f"<ArrowBatch[{self.schema.__name__}] rows={self.batch.num_rows}>"
