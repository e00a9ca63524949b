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

from colnade_spark.operators.sampling import _HASH_SPACE, sample_hash

__all__ = ["training_order", "write_training_shards", "verify_training_shards"]


def training_order(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    salt: str = "",
    shard_col: str = "shard",
    pos_col: str = "pos",
    score_col: str | None = None,
    balance_col: str | None = None,
    n_buckets: int = 1024,
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
    order as the within-score shuffle.

    BALANCED mode: with ``balance_col`` (a non-negative integer weight,
    e.g. a token count; NULL → 0), shard membership equalizes WEIGHT
    sums instead of row counts — hash-mod equalizes rows, and a
    token-skewed corpus then produces token-skewed shards. Rows are cut
    into ``n_shards`` contiguous spans of the content-addressed hash
    order at equal-weight boundaries: ``shard = (start * n_shards) div
    total`` where ``start`` is the running weight sum of all rows
    strictly before this row in (hash, key) order. Every shard's weight
    sum is then within one maximum-row-weight of ``total/n_shards`` —
    the same guarantee the classic FFD/LPT bin-balancing heuristics
    target, but as a pure prefix-sum formulation: literal
    first-fit-decreasing is a sequential fold over all rows (it does
    not distribute and no SQL engine can replay it), while a running
    sum is one window away in any engine. Because spans follow the hash
    order, each shard remains an unbiased pseudo-random corpus sample.

    Scale (100 TB): the prefix sum is NOT a global single-partition
    window — rows are pre-bucketed by the top bits of the hash
    (``n_buckets`` contiguous hash ranges, power of two), per-bucket
    sums (one tiny aggregate, ≤ ``n_buckets`` rows to the driver)
    give exact bucket offsets embedded as a literal array, and the
    within-bucket running sum is a per-bucket window. Both windows
    here (per-bucket, per-shard) are key-partitioned."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    h = sample_hash(F.col(key_col), salt)
    from pyspark.sql.window import Window

    okey = "_training_order_key"
    staged = df.withColumn(okey, h)
    if balance_col is None:
        staged = staged.withColumn(
            shard_col, (F.col(okey) % n_shards).cast("int")
        )
    else:
        if n_buckets < 1 or n_buckets & (n_buckets - 1):
            raise ValueError("n_buckets must be a positive power of two")
        shift = _HASH_SPACE.bit_length() - 1 - (n_buckets.bit_length() - 1)
        wcol, bcol, scol = "_to_w", "_to_bucket", "_to_start"
        # negative weights would make the running sum non-monotonic and
        # drive shard ids below zero — rejected in-expression (the
        # weight column is consumed by every downstream op, so the
        # guard cannot be pruned); NULL weights count as zero
        weight = F.coalesce(F.col(balance_col).cast("long"), F.lit(0))
        weight = F.when(
            weight < 0,
            F.raise_error(
                F.lit(f"training_order: negative {balance_col} weight")
            ),
        ).otherwise(weight)
        staged = staged.withColumn(wcol, weight).withColumn(
            bcol, F.shiftright(F.col(okey), shift).cast("int")
        )
        # exact per-bucket sums: bounded driver fit (≤ n_buckets rows)
        sums = {
            r[0]: r[1]
            for r in staged.groupBy(bcol).agg(F.sum(wcol)).collect()
        }
        if None in sums:
            # sample_hash(NULL key) is NULL → bucket NULL: its weight
            # would inflate `total` while no offset covers it, biasing
            # every shard boundary low — an identity is required here
            raise ValueError(
                f"training_order: NULL {key_col} rows cannot be"
                " balance-sharded; filter or fill the key upstream"
            )
        total = sum(sums.values())
        if total <= 0:
            raise ValueError(
                f"balance_col {balance_col!r} sums to {total}; balanced"
                " sharding needs positive weights"
            )
        offsets, acc = [], 0
        for b in range(n_buckets):
            offsets.append(acc)
            acc += sums.get(b, 0)
        wb = Window.partitionBy(bcol).orderBy(okey, key_col).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        start = (
            F.element_at(F.lit(offsets), F.col(bcol) + 1)
            + F.sum(wcol).over(wb)
            - F.col(wcol)
        )
        staged = staged.withColumn(scol, start).withColumn(
            shard_col,
            F.least(
                F.expr(f"({scol} * {n_shards}) div {total}"),
                F.lit(n_shards - 1),
            ).cast("int"),
        ).drop(wcol, bcol, scol)
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
    balance_col: str | None = None,
) -> None:
    """Materialize the training order: one ``shard=<i>`` parquet
    directory per shard, rows stored in pos order (one output file per
    shard via an exact shard repartition + within-partition sort, so a
    sequential reader of each shard sees the deterministic order
    without re-sorting). Re-running with the same inputs rewrites
    byte-identical content — shard layout is a pure function of the
    keys."""
    out = training_order(df, n_shards, key_col, salt, balance_col=balance_col)
    (
        out.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
    # layout manifest beside the shards (same Hadoop-FS machinery as the
    # Bloom/CMS/HLL params manifests): a reader that assumes the wrong
    # salt or balance mode would replay a DIFFERENT permutation and
    # silently train on mis-ordered data; per-shard row counts let
    # verify_training_shards catch partial/corrupt writes cheaply.
    # Counts come from the WRITTEN tree (parquet footers only — no
    # second pass over the input pipeline, and the manifest certifies
    # what was actually persisted even if the source frame mutated).
    from colnade_spark.streaming.stream import (
        _hadoop_path,
        write_table_manifest,
    )

    spark = df.sparkSession
    # under dynamic partitionOverwriteMode the root-level manifest of a
    # previous write survives the data overwrite — remove it so the
    # fresh manifest always describes the fresh tree
    fs, p, _ = _hadoop_path(spark, f"{path}/_shards_manifest.json")
    if fs.exists(p):
        fs.delete(p, False)
    per_shard = {
        str(r[0]): r[1]
        for r in spark.read.parquet(path)
        .groupBy("shard")
        .agg(F.count(F.lit(1)))
        .collect()
    }
    # under spark.sql.sources.partitionOverwriteMode=dynamic only the
    # shard=i directories present in THIS write are replaced: a
    # re-shard to fewer shards leaves the old tail directories on disk,
    # and counting the written tree would fold their stale rows into
    # the fresh manifest (verify would then bless the stale data).
    # Refuse instead — the caller must clear the tree (or use static
    # overwrite) before shrinking n_shards.
    extra = set(per_shard) - {str(i) for i in range(n_shards)}
    if extra:
        raise ValueError(
            f"stale shard directories {sorted(extra)} at {path} after a"
            f" write with n_shards={n_shards}; a dynamic-overwrite"
            " re-shard to fewer shards leaves old shard=i directories"
            " behind — delete the tree (or use static"
            " partitionOverwriteMode) before re-sharding"
        )
    write_table_manifest(
        spark,
        path,
        {
            "kind": "training_shards",
            "n_shards": n_shards,
            "key_col": key_col,
            "salt": salt,
            "balance_col": balance_col,
            "rows_per_shard": per_shard,
        },
        name="_shards_manifest.json",
    )


def verify_training_shards(spark, path: str) -> dict:
    """Recount the shard directories against the layout manifest —
    ERRORS on a missing manifest, a missing/extra shard, or a row-count
    mismatch (a partially overwritten or corrupt shard tree; stale
    shard=i directories left behind by a dynamic-overwrite re-shard to
    fewer shards also surface here as extra keys). Returns the
    manifest on success. One count aggregate over the shard column;
    payloads are not read."""
    from colnade_spark.streaming.stream import read_table_manifest

    mf = read_table_manifest(spark, path, name="_shards_manifest.json")
    if mf is None or mf.get("kind") != "training_shards":
        raise ValueError(
            f"no training-shards manifest at {path}; was this tree"
            " written by write_training_shards?"
        )
    got = {
        str(r[0]): r[1]
        for r in spark.read.parquet(path)
        .groupBy("shard")
        .agg(F.count(F.lit(1)))
        .collect()
    }
    if got != mf["rows_per_shard"]:
        raise ValueError(
            f"shard tree at {path} does not match its manifest: "
            f"manifest={mf['rows_per_shard']} actual={got}"
        )
    return mf
