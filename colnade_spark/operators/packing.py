"""Training-example packing: assign token chunks to fixed-budget bins
(the step between chunking and writing pretraining examples).

Semantics: *token-offset packing* — within a shard, chunks are laid out
in a deterministic order (default ``(doc_id, chunk_id)``) and each chunk
goes to the bin containing its START token offset
(``floor(start_offset / budget)``). A bin may therefore overrun the
budget by at most one chunk, which downstream example writers truncate
or carry — this is the standard streaming-concatenation layout for LLM
pretraining, and unlike first-fit greedy packing it is expressible as a
pure window cumsum (greedy's running remainder is order-sequential and
would force a per-shard sequential pass).

Scale notes (100 TB): packing is SHARD-LOCAL by construction — a global
packing order would mean a single-partition total sort. The shard is
derived from the doc key with the portable md5 hash (engine-reproducible,
uniform), so each shard packs independently: one exchange on the shard
key, windows within shards, unbounded parallelism across shards. Bins
are (shard, bin_id) pairs; example writers emit one file per shard.

Reference parity: no counterpart in the reference repo — extension
layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from colnade_spark.operators.sampling import sample_hash

__all__ = ["pack_chunks", "pack_stats"]


def pack_chunks(
    df: DataFrame,
    budget: int,
    tokens_col: str = "chunk_tokens",
    order_cols: tuple[str, ...] = ("doc_id", "chunk_id"),
    shard_key: str = "doc_id",
    n_shards: int = 8,
) -> DataFrame:
    """Append ``shard``, ``pack_offset`` (token start offset within the
    shard layout) and ``pack_id`` (token-offset bin) to a chunk table.
    All chunks of one document land in one shard (shard is derived from
    ``shard_key``), so documents never straddle shards."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    shard = F.pmod(sample_hash(F.col(shard_key)), F.lit(n_shards)).cast("long")
    staged = df.withColumn("shard", shard)
    w = (
        Window.partitionBy("shard")
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(tokens_col)).over(w)
    start = (cum - F.col(tokens_col)).cast("long")
    return staged.withColumn("pack_offset", start).withColumn(
        "pack_id", F.floor(start / F.lit(budget)).cast("long")
    )


def pack_stats(
    df: DataFrame,
    budget: int,
    tokens_col: str = "chunk_tokens",
    order_cols: tuple[str, ...] = ("doc_id", "chunk_id"),
    shard_key: str = "doc_id",
    n_shards: int = 8,
) -> DataFrame:
    """Per-bin packing stats: chunk count and token fill. Fill can exceed
    ``budget`` by at most ``max(chunk_tokens) - 1`` (offset semantics)."""
    packed = pack_chunks(df, budget, tokens_col, order_cols, shard_key, n_shards)
    return packed.groupBy("shard", "pack_id").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum(F.col(tokens_col)).cast("long").alias("n_tokens"),
    )
