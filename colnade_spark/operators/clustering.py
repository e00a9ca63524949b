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


def _dist_exprs(centroids: list[list[float]]):
    """Squared L2 distance to each centroid; left-to-right fold order."""
    out = []
    for c in centroids:
        carr = F.array(*[F.lit(float(v)) for v in c])
        out.append(
            F.aggregate(
                F.zip_with(
                    F.col("_v"),
                    carr,
                    lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    return out


def _assign_expr(centroids: list[list[float]]):
    """array<struct<dist,cid>> min -> cid; fold order is array order, ties
    go to the lowest cid (struct comparison: dist first, then cid)."""
    dists = [
        F.struct(d.alias("dist"), F.lit(cid).alias("cid"))
        for cid, d in enumerate(_dist_exprs(centroids))
    ]
    return F.array_min(F.array(*dists))["cid"]


def _kpp_init(pts, k: int) -> list[list[float]]:
    """Deterministic k-means++ init: the first centroid is the lowest-id
    point; each next one is an Efraimidis-Spirakis weighted draw with
    weight D(x)^2 and md5-derived uniforms keyed on (id, round) — no RNG
    state, so the same points always yield the same centers, on any
    engine or partitioning. One TakeOrdered job per centroid (k jobs;
    k is small)."""
    from colnade_spark.operators.text import md5_hash60

    first = pts.orderBy("_id").limit(1).collect()
    if not first:
        raise ValueError("kmeans: empty input")
    cents = [[float(x) for x in first[0]._v]]
    for rnd in range(1, k):
        dmin = F.array_min(F.array(*_dist_exprs(cents)))
        u = md5_hash60(
            F.concat(F.col("_id").cast("string"), F.lit(f":kpp:{rnd}"))
        ).cast("double") / float(1 << 60)
        # max u^(1/w) == max ln(u)/w; w = D(x)^2. Chosen points (w=0) and
        # the measure-zero u=0 draw get -inf (never selected while any
        # positive-weight point remains).
        key = F.when(
            (dmin > 0) & (u > 0), F.log(u) / dmin
        ).otherwise(F.lit(float("-inf")))
        r = (
            pts.withColumn("_key", key)
            .orderBy(F.col("_key").desc(), F.col("_id").asc())
            .limit(1)
            .collect()[0]
        )
        cents.append([float(x) for x in r._v])
    return cents


def kmeans(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iters: int = 2,
    init: str = "lowest_ids",
) -> DataFrame:
    """(id, cluster) after ``iters`` Lloyd iterations. Deterministic
    across engines and partitionings with either init:

    - ``lowest_ids``: the k lowest-id points (trivially reproducible;
      what the SQL oracle unrolls);
    - ``kpp``: deterministic k-means++ (hash-uniform weighted draws) —
      better spread starts, still zero RNG state.
    """
    if k < 1 or iters < 0:
        raise ValueError("kmeans requires k >= 1 and iters >= 0")
    if init not in ("lowest_ids", "kpp"):
        raise ValueError(f"unknown init {init!r}")
    pts = df.select(F.col(id_col).alias("_id"), _scaled(df, vec_col).alias("_v"))
    # small, reused every iteration: one scan instead of iters+1
    pts = pts.cache()
    try:
        if init == "kpp":
            if pts.limit(k).count() < k:
                raise ValueError(f"kmeans: k={k} but fewer rows")
            centroids = _kpp_init(pts, k)
        else:
            rows = pts.orderBy("_id").limit(k).collect()
            if len(rows) < k:
                raise ValueError(f"kmeans: k={k} but only {len(rows)} rows")
            centroids = [[float(x) for x in r._v] for r in rows]
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
