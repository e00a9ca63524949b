"""Typed Structured Streaming surface (EXTENSION — the reference has no
streaming of any kind, SURVEY.md §2.6; this is the Spark-first answer to
continuous ingestion at scale).

The same Expr AST and ``SparkBackend`` translation drive streaming frames:
a ``StreamFrame[S]`` wraps a streaming ``pyspark.sql.DataFrame`` and exposes
the row-level subset of the frame API (filter / select / with_columns) plus
the streaming-specific pieces — watermarks, event-time window aggregation,
and sinks. Aggregations REQUIRE a watermark so state stores can evict —
unbounded state is the way streaming jobs die at scale.
"""

from colnade_spark.streaming.stream import (
    StreamFrame,
    scan_stream_csv,
    scan_stream_json,
    scan_stream_parquet,
)

__all__ = ["StreamFrame", "scan_stream_parquet", "scan_stream_csv", "scan_stream_json"]
