"""Deterministic training order: the "global shuffle" a training run
needs — every row assigned a (shard, pos) coordinate such that reading
shards in index order, rows in pos order, replays ONE deterministic
pseudo-random permutation of the corpus. Content-addressed (the same
md5 order key as operators.sampling), so the permutation is stable
across runs, partitionings, engines, and re-materializations — a
training job can be resumed or re-sharded and see the same order.

Why not ``ORDER BY rand()``: not reproducible; why not a global
``row_number`` over the hash: a single-partition sort. Sharding by hash
range keeps everything distributed: the shard assignment is a scan-side
projection, and the within-shard rank is a per-shard window — the same
cost tier as any per-key ranking, with ``n_shards`` controlling the
parallelism/size trade.

Reference parity: no counterpart in the reference repo — extension layer
(training-data pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from colnade_spark.operators.sampling import sample_hash

__all__ = ["training_order", "write_training_shards"]


def training_order(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    salt: str = "",
    shard_col: str = "shard",
    pos_col: str = "pos",
    score_col: str | None = None,
) -> DataFrame:
    """Append (``shard_col``, ``pos_col``): shard = order-key mod
    ``n_shards`` (uniform, scan-side), pos = the row's rank within its
    shard by (order key, row key) — ties impossible for distinct keys,
    broken by the key otherwise, so the (shard, pos) total order is
    deterministic in any engine.

    CURRICULUM mode: with ``score_col``, rows rank within their shard by
    (score asc, hash, key) instead of pure hash — every shard serves its
    easiest (lowest-score) examples first while shard MEMBERSHIP stays a
    pure hash (each shard is an unbiased corpus sample, so difficulty
    progresses in parallel across all readers). The hash stays in the
    order as the within-score shuffle."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    h = sample_hash(F.col(key_col), salt)
    from pyspark.sql.window import Window

    okey = "_training_order_key"
    staged = df.withColumn(okey, h).withColumn(
        shard_col, (F.col(okey) % n_shards).cast("int")
    )
    order = [okey, key_col] if score_col is None else [
        F.col(score_col).asc(), okey, key_col
    ]
    w = Window.partitionBy(shard_col).orderBy(*order)
    return (
        staged.withColumn(pos_col, F.row_number().over(w).cast("long"))
        .drop(okey)
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "doc_id",
    salt: str = "",
) -> None:
    """Materialize the training order: one ``shard=<i>`` parquet
    directory per shard, rows stored in pos order (one output file per
    shard via an exact shard repartition + within-partition sort, so a
    sequential reader of each shard sees the deterministic order
    without re-sorting). Re-running with the same inputs rewrites
    byte-identical content — shard layout is a pure function of the
    keys."""
    out = training_order(df, n_shards, key_col, salt)
    (
        out.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
