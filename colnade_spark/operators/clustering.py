"""Distributed Lloyd's k-means over an embedding column — REPRODUCIBLE.

Floating-point k-means is normally nondeterministic on a cluster: the
centroid update averages floats in partition order, so every run (and
every engine) drifts differently. This implementation makes the whole
loop bit-reproducible, which is what makes it testable against a
single-node reference (and against DuckDB SQL, see
__spark_entry__.kmeans_assign):

- vectors are scaled to BIGINT once (``round(x * 2^20)``) — centroid
  NUMERATORS are then exact integer sums, order-independent;
- each centroid coordinate is the deterministic double
  ``CAST(sum AS DOUBLE) / n``;
- per-point distances fold left-to-right over the array (same IEEE
  operation order in any engine's sequential fold), and ties break to
  the lowest centroid id.

Initialization is the k lowest-id points (deterministic; k-means++ would
add a seeded RNG dependency across engines).

Scale shape per iteration (the 100 TB story):
- assignment: centroids broadcast as a literal (k × dim doubles — a few
  KB), one narrow scan, NO shuffle;
- update: posexplode to (cid, pos, val) then sum — Catalyst plans a
  partial aggregation before the exchange, so the shuffle carries at
  most k·dim rows per input partition, not N·dim;
- k·dim numerator longs return to the driver per iteration (same
  bounded driver state as the IVF centroid table, similarity.py).

EXTENSION — the reference has no ML ops; this pairs with
embeddings.assign_clusters (fixed centroids) as its training loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# power-of-two scale: float32 -> scaled long is exact for |x| < ~2^31/2^20;
# embeddings are O(1), so round() only drops sub-2^-20 noise
DEFAULT_SCALE = 1 << 20


def _scaled(df: DataFrame, vec_col: str) -> "F.Column":
    s = float(DEFAULT_SCALE)
    return F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * s).cast("long")
    )


def _assign_expr(centroids: list[list[float]]):
    """array<struct<dist,cid>> min -> cid; fold order is array order, ties
    go to the lowest cid (struct comparison: dist first, then cid)."""
    dists = []
    for cid, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(v)) for v in c])
        d = F.aggregate(
            F.zip_with(
                F.col("_v"),
                carr,
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        dists.append(F.struct(d.alias("dist"), F.lit(cid).alias("cid")))
    return F.array_min(F.array(*dists))["cid"]


def kmeans(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iters: int = 2,
) -> DataFrame:
    """(id, cluster) after ``iters`` Lloyd iterations from the k lowest-id
    starting points. Deterministic across engines and partitionings."""
    if k < 1 or iters < 0:
        raise ValueError("kmeans requires k >= 1 and iters >= 0")
    pts = df.select(F.col(id_col).alias("_id"), _scaled(df, vec_col).alias("_v"))
    # small, reused every iteration: one scan instead of iters+1
    pts = pts.cache()
    try:
        init = pts.orderBy("_id").limit(k).collect()
        if len(init) < k:
            raise ValueError(f"kmeans: k={k} but only {len(init)} rows")
        centroids = [[float(x) for x in r._v] for r in init]
        for _ in range(iters):
            assigned = pts.withColumn("_cid", _assign_expr(centroids))
            sums = (
                assigned.select("_cid", F.posexplode("_v").alias("_pos", "_x"))
                .groupBy("_cid", "_pos")
                .agg(F.sum("_x").alias("_s"), F.count(F.lit(1)).alias("_n"))
                .collect()
            )
            by_cid: dict[int, dict[int, tuple[int, int]]] = {}
            for r in sums:
                by_cid.setdefault(r._cid, {})[r._pos] = (r._s, r._n)
            dim = len(centroids[0])
            centroids = [
                [
                    float(by_cid[cid][p][0]) / by_cid[cid][p][1]
                    if cid in by_cid
                    else centroids[cid][p]  # empty cluster keeps its centroid
                    for p in range(dim)
                ]
                for cid in range(len(centroids))
            ]
        return pts.withColumn("_cid", _assign_expr(centroids)).select(
            F.col("_id").alias(id_col), F.col("_cid").cast("long").alias("cluster")
        )
    finally:
        pts.unpersist()
