"""Document chunking for training-data pipelines: explode documents into
overlapping token-window chunks.

Reference parity: no counterpart in the reference repo — extension-layer
operator for LLM data prep (context-window packing, retrieval chunking).

Scale notes (100 TB): tokenize + window generation + explode is a single
narrow stage (no shuffle, no UDF, whole-stage codegen). Output row count
is ~n_tokens/stride per doc; downstream writers should repartition by a
hash of (doc_id, chunk_id) if chunk-level shuffles follow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from colnade_spark.operators.text import tokens

__all__ = ["chunk_by_tokens"]


def chunk_by_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 128,
    overlap: int = 0,
) -> DataFrame:
    """Explode each document into whitespace-token windows of
    ``chunk_size`` tokens advancing by ``chunk_size - overlap``:
    ``(id, chunk_id, chunk_start, chunk_tokens, chunk_text)``.

    The final window may be shorter than ``chunk_size``; empty documents
    produce NO chunk rows. Window starts are generated with a stepped
    sequence and a filter guard (``F.sequence`` with a positive step
    raises on empty ranges, and conditional ``F.when`` guards defeat
    common-subexpression elimination — see operators/text.char_ngrams)."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_size")
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    stride = chunk_size - overlap
    staged = df.withColumn(
        "_ck_toks",
        F.filter(
            tokens(F.coalesce(F.col(text_col), F.lit(""))), lambda t: t != ""
        ),
    )
    n = F.size(F.col("_ck_toks"))
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)),
        lambda p: p < n,
    )
    exploded = staged.withColumn("_ck_start", F.explode(starts))
    chunk = F.slice(F.col("_ck_toks"), F.col("_ck_start") + 1, chunk_size)
    return exploded.select(
        F.col(id_col),
        (F.col("_ck_start") / stride).cast("long").alias("chunk_id"),
        F.col("_ck_start").cast("long").alias("chunk_start"),
        F.size(chunk).cast("long").alias("chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
