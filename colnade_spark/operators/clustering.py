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


def _finite(centroids: list[list[float]]) -> bool:
    import math

    return all(math.isfinite(float(v)) for c in centroids for v in c)


def _dist_sql(vec_name: str, c: list[float]) -> str:
    """Squared L2 distance to one centroid as a SQL string (identical
    fold/casts to the python-lambda form — the whole expression parses
    in one py4j call instead of one round-trip per sub-expression; the
    k-means++ loop alone rebuilds Θ(k²) of these per fit, measured
    seconds of driver time per plan build at k=8, dim=64)."""
    arr = "array(" + ",".join(f"{float(v)!r}D" for v in c) + ")"
    return (
        f"aggregate(zip_with(`{vec_name}`, {arr}, "
        f"(a, b) -> ((CAST(a AS double) - b) * (CAST(a AS double) - b))), "
        f"0.0D, (acc, x) -> (acc + x))"
    )


def _dist_exprs(centroids: list[list[float]], vec=None, vec_name: str = "_v"):
    """Squared L2 distance to each centroid; left-to-right fold order."""
    if vec is None and _finite(centroids):
        return [F.expr(_dist_sql(vec_name, c)) for c in centroids]
    # element-wise fallback: an explicit Column input or non-finite
    # centroid values (SQL has no inf/nan literals)
    if vec is None:
        vec = F.col(vec_name)
    out = []
    for c in centroids:
        out.append(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(float(v)) for v in c]),
                    lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    return out


def _assign_struct(centroids: list[list[float]], vec=None, vec_name: str = "_v"):
    """struct<dist,cid> of the nearest centroid: array_min over the
    per-centroid structs — struct comparison is dist first, then cid, so
    ties go to the lowest cid. Parsed from ONE SQL string when possible
    (see ``_dist_sql``)."""
    if vec is None and _finite(centroids):
        structs = ",".join(
            f"named_struct('dist', {_dist_sql(vec_name, c)}, 'cid', {cid})"
            for cid, c in enumerate(centroids)
        )
        return F.expr(f"array_min(array({structs}))")
    dists = [
        F.struct(d.alias("dist"), F.lit(cid).alias("cid"))
        for cid, d in enumerate(_dist_exprs(centroids, vec, vec_name))
    ]
    return F.array_min(F.array(*dists))


def _assign_expr(centroids: list[list[float]]):
    """array<struct<dist,cid>> min -> cid; fold order is array order, ties
    go to the lowest cid (struct comparison: dist first, then cid)."""
    return _assign_struct(centroids)["cid"]


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
    return_centroids: bool = False,
) -> "DataFrame | tuple[DataFrame, list[list[float]]]":
    """(id, cluster) after ``iters`` Lloyd iterations. Deterministic
    across engines and partitionings with either init:

    - ``lowest_ids``: the k lowest-id points (trivially reproducible;
      what the SQL oracle unrolls);
    - ``kpp``: deterministic k-means++ (hash-uniform weighted draws) —
      better spread starts, still zero RNG state.

    With ``return_centroids=True`` returns ``(df, centroids)`` — the
    final centroid list is already driver-side (each update collects
    k*dim numerator longs), so exposing it costs nothing and feeds the
    downstream consumers that need frozen centers (``prototypicality``,
    ``embeddings.cluster_assign``).
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
        out = pts.withColumn("_cid", _assign_expr(centroids)).select(
            F.col("_id").alias(id_col), F.col("_cid").cast("long").alias("cluster")
        )
        if return_centroids:
            return out, centroids
        return out
    finally:
        pts.unpersist()


def prototypicality(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    dist_col: str = "proto_dist",
) -> DataFrame:
    """Per-row prototypicality against FROZEN centroids: the nearest
    centroid's id and the squared L2 distance to it (Sorscher et al.
    2022, "Beyond neural scaling laws": distance to the k-means centroid
    of a row's cluster is the self-supervised pruning metric — small
    distance = prototypical/easy, large = hard/informative).

    Deterministic across engines and partitionings by the same
    construction as ``kmeans``: vectors integer-scaled once, distances a
    left-to-right IEEE fold, ties to the lowest centroid id — so the
    emitted double is bit-reproducible and SQL-replayable.

    Scale shape: centroids ride the plan as literals (k x dim doubles, a
    few KB), so scoring is one narrow scan projection — NO join, NO
    shuffle, and stateless on streams (the frozen-DSIR pattern).
    EXTENSION beyond the reference (no ML ops there); pairs with
    ``kmeans(return_centroids=True)`` for training.
    """
    if not centroids:
        raise ValueError("prototypicality: centroids must be non-empty")
    for needed in (id_col, vec_col):
        if needed not in df.columns:
            raise ValueError(f"prototypicality: missing column {needed!r}")
    for c in ("_proto_v", "_proto_min"):
        if c in df.columns:
            raise ValueError(f"prototypicality: input already has column {c!r}")
    if cluster_col in df.columns or dist_col in df.columns:
        raise ValueError(
            f"prototypicality: output column {cluster_col!r}/{dist_col!r} "
            "already present in the input"
        )
    staged = df.withColumn("_proto_v", _scaled(df, vec_col))
    # stage the argmin struct once; the two field extracts below reference
    # it twice, which keeps CollapseProject from inlining (and thus
    # re-evaluating) the k-fold distance array
    staged = staged.withColumn(
        "_proto_min", _assign_struct(centroids, vec_name="_proto_v")
    )
    return (
        staged.withColumn(cluster_col, F.col("_proto_min")["cid"].cast("long"))
        .withColumn(dist_col, F.col("_proto_min")["dist"])
        .drop("_proto_v", "_proto_min")
    )


def prototype_prune(
    df: DataFrame,
    centroids: list[list[float]],
    frac: float,
    mode: str = "keep_hard",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    dist_col: str = "proto_dist",
) -> DataFrame:
    """Self-supervised-prototype data pruning (Sorscher et al. 2022):
    score every row's distance to its nearest frozen centroid, then keep
    ``ceil(frac * n)`` rows PER CLUSTER — ``keep_hard`` keeps the
    farthest-from-centroid (the paper's abundant-data regime: prune easy
    prototypical examples), ``keep_easy`` the nearest (scarce-data
    regime). Ties break to the LOWEST id, so the surviving set is
    deterministic in any engine. Per-cluster (not global) cuts keep one
    dense cluster from absorbing the whole budget — the same
    domain-collapse argument as ``quality.quality_prune``.

    Scale: scoring is scan-side (literal centroids); the cut is one rank
    window per cluster — the quality_prune cost tier. For clusters too
    large to sort, derive an approximate distance threshold first
    (percentile_approx over ``prototypicality`` output) and reduce to a
    scan-side filter, as quality_prune_threshold does for scores.
    """
    from pyspark.sql.window import Window

    if not (0.0 < frac <= 1.0):
        raise ValueError("frac must be in (0, 1]")
    if mode not in ("keep_hard", "keep_easy"):
        raise ValueError(f"unknown mode {mode!r}")
    for c in ("_rn", "_nc"):
        if c in df.columns:
            raise ValueError(f"prototype_prune: input already has column {c!r}")
    scored = prototypicality(df, centroids, id_col, vec_col, cluster_col, dist_col)
    order = F.col(dist_col).desc() if mode == "keep_hard" else F.col(dist_col).asc()
    w = Window.partitionBy(cluster_col).orderBy(order, F.col(id_col))
    wc = Window.partitionBy(cluster_col)
    staged = scored.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_nc", F.count(F.lit(1)).over(wc)
    )
    kept = staged.filter(F.col("_rn") <= F.ceil(F.col("_nc") * F.lit(float(frac))))
    return kept.drop("_rn", "_nc")
