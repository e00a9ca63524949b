"""Count-min sketch tables: mergeable frequency estimation.

Completes the mergeable-sketch family (sketches.py: HLL for distinct
counts; decontaminate.py: Bloom for membership): a CMS answers "how often
does item x occur?" from a bounded ``depth × width`` counter grid instead
of a full frequency table — the 100 TB pattern for tracking token/URL/
domain frequencies where the exact table would itself be huge, and for
cheap cross-epoch frequency drift monitoring.

Estimates are the classic min-over-rows upper bound: est(x) >= true(x)
always, and over-counts only via hash collisions (bounded by e·N/w with
probability 1-(1/2)^d for the standard construction). The hash family is
md5-derived (item ∥ '#row'), so every estimate is DETERMINISTIC and
bit-reproducible in any engine — approximate with respect to truth,
exact as computed (DuckDB-oracled).

CMS counters ADD: merging per-shard/per-batch sparse tables by summing
(row, bucket) cells is lossless and associative — the same
build-once/merge-anywhere contract as the HLL and Bloom tables, pinned
by the merge-equals-direct test.

Scale notes (100 TB):
- The build is one explode → (row, bucket) hash-aggregation with
  map-side combine: the shuffle carries d·w bounded cells, not items.
- The sparse table is at most d·w rows (d=4, w=2^14 → 64 K cells ≈
  1 MB); estimation BROADCASTS it and probes with a d-way explode +
  min aggregation per candidate.

Reference parity: no counterpart in the reference repo — extension
layer (sketch family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from colnade_spark.operators.text import md5_hash60

__all__ = [
    "cms_bucket",
    "cms_build",
    "cms_merge",
    "cms_estimate",
    "maintain_cms_table",
    "load_cms",
    "CMS_SCHEME",
]

# Hash-scheme tag persisted with every maintained CMS table: estimates
# from a table probed with different (depth, width) — or a changed
# bucket hash — are silently wrong (cells land elsewhere), so the
# layout params are written as a manifest next to the table and
# verified on load. Bump when cms_bucket changes.
CMS_SCHEME = "cms-md5-v1"

_CMS_MANIFEST = "_cms_params.json"


def cms_bucket(item: Column, row: int, width: int) -> Column:
    """Bucket of ``item`` in CMS row ``row``: md5-derived (item ∥ '#row')
    mod width — reproducible in any engine."""
    return md5_hash60(F.concat(item.cast("string"), F.lit(f"#{row}"))) % F.lit(
        width
    )


def _cells(item_col: str, depth: int, width: int) -> Column:
    """Array of the ``depth`` (row, bucket) cell structs for one item —
    the ONE definition both build and probe use, so the sketch layout
    cannot drift between them."""
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                cms_bucket(F.col(item_col), r, width).alias("bucket"),
            )
            for r in range(depth)
        ]
    )


def cms_build(
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1 << 14,
    weight_col: str | None = None,
) -> DataFrame:
    """Sparse CMS counter table (row, bucket, cnt) over the item stream
    (one input row = one occurrence, or ``weight_col`` occurrences when a
    pre-aggregated (item, count) table is supplied). One explode to
    ``depth`` cells per item, then a map-side-combined count/sum — the
    exchange carries at most depth·width cells. Feeding a pre-aggregated
    count table hashes each distinct item ONCE instead of per occurrence
    — the preferred path when a frequency table already exists upstream."""
    cols = [item_col] + ([weight_col] if weight_col else [])
    cells = items.select(
        *cols, F.explode(_cells(item_col, depth, width)).alias("_c")
    ).select(*cols, "_c.row", "_c.bucket")
    agg = (
        F.sum(weight_col).cast("long") if weight_col else F.count("*")
    ).alias("cnt")
    return cells.groupBy("row", "bucket").agg(agg)


def cms_merge(*tables: DataFrame) -> DataFrame:
    """Sum sparse CMS tables cell-wise — lossless, associative merge of
    independently built sketches (shards, micro-batches, epochs)."""
    if not tables:
        raise ValueError("cms_merge requires at least one table")
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("row", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cms_estimate(
    cms: DataFrame,
    candidates: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1 << 14,
    out_col: str = "n_est",
) -> DataFrame:
    """(item_col, out_col): the CMS frequency estimate for every DISTINCT
    candidate item — min over the ``depth`` row counters (absent cell =
    0). The bounded counter table broadcasts; candidates probe with a
    d-way explode + min aggregation."""
    probes = (
        candidates.select(item_col)
        .distinct()
        .select(item_col, F.explode(_cells(item_col, depth, width)).alias("_c"))
        .select(item_col, "_c.row", "_c.bucket")
    )
    return (
        probes.join(F.broadcast(cms), ["row", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias(out_col))
    )


def maintain_cms_table(
    stream: DataFrame,
    item_col: str,
    table_path: str,
    checkpoint: str,
    depth: int = 4,
    width: int = 1 << 14,
    available_now: bool = True,
):
    """STREAMING maintenance of a persisted CMS: each micro-batch builds
    its own sparse cell table and OVERWRITES its ``batch_id=<n>``
    partition (idempotent under foreachBatch redelivery).
    ``load_cms(spark, table_path)`` sums the history cell-wise — CMS
    counters add, so the merged sketch equals a single batch build over
    everything ever streamed (pinned by test). Writes (or verifies) the
    (scheme, depth, width) manifest BEFORE starting the stream — a
    maintainer pointed at a table built with a different layout fails
    fast instead of appending incompatible cells. Returns the started
    StreamingQuery."""

    from colnade_spark.streaming.stream import (
        maintain_partitioned_table,
        write_table_manifest,
    )

    write_table_manifest(
        stream.sparkSession,
        table_path,
        {"scheme": CMS_SCHEME, "depth": depth, "width": width},
        _CMS_MANIFEST,
    )
    return maintain_partitioned_table(
        stream,
        lambda b: cms_build(b, item_col, depth, width),
        table_path,
        checkpoint,
        available_now,
    )


def load_cms(
    spark,
    table_path: str,
    depth: int | None = None,
    width: int | None = None,
) -> DataFrame:
    """Merge a persisted CMS history into one sparse table (cell-wise
    sum) ready for ``cms_estimate``. Pass the ``depth``/``width`` you
    intend to probe with to VERIFY them against the table's manifest —
    estimating through mismatched parameters silently under-counts, so
    a mismatch errors; pre-manifest tables skip the check."""
    from colnade_spark.streaming.stream import verify_table_manifest

    expect: dict = {"scheme": CMS_SCHEME}
    if depth is not None:
        expect["depth"] = depth
    if width is not None:
        expect["width"] = width
    verify_table_manifest(spark, table_path, expect, _CMS_MANIFEST)
    return (
        spark.read.parquet(table_path)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
