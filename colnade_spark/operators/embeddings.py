"""Embedding-column operators: L2 normalization and fixed-centroid
cluster assignment (the serving half of IVF / k-means pipelines).

Reference parity: no counterpart in the reference repo — extension-layer
operators for embedding-based corpus curation (cluster-balanced
sampling, semantic bucketing, diversity filtering). The training half
(sampled spherical k-means) lives in operators/similarity.py
(train_ivf_centroids); this module covers the *apply* side where the
centroids are already known and broadcast as literals.

Scale notes (100 TB):
- ``normalize_embeddings`` is a narrow projection; the norm is staged as
  a column BEFORE the transform lambda references it (outer expressions
  inside HOF lambdas re-evaluate per element).
- ``cluster_assign`` evaluates k dot products per row as literal-array
  zip_with/aggregate expressions — JVM codegen, no UDF, no shuffle, and
  the centroid table rides the plan itself (no broadcast join needed for
  k ≤ a few hundred; use similarity.ivf_topk machinery beyond that).
- ``cluster_stats`` adds one map-side-combined aggregation shuffle with
  at most k groups.
- Dots are rounded to 6 decimals BEFORE the argmax so assignment is
  stable across engines/summation orders; ties break to the HIGHEST
  cluster id (struct-max, same convention as text.language_id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from colnade_spark.operators.similarity import dot, norm

__all__ = ["normalize_embeddings", "cluster_assign", "cluster_stats"]


def normalize_embeddings(
    df: DataFrame, vec_col: str = "embedding", out_col: str | None = None
) -> DataFrame:
    """Unit-L2-normalize a vector column (zero vectors pass through
    unchanged via the epsilon floor)."""
    staged = df.withColumn("_l2", norm(F.col(vec_col)))
    out = staged.withColumn(
        out_col or vec_col,
        F.transform(
            F.col(vec_col),
            lambda x: x.cast("double") / F.greatest(F.col("_l2"), F.lit(1e-12)),
        ),
    )
    return out.drop("_l2")


def _best_cluster(vec_name: str, centroids: list[list[float]]) -> Column:
    """Struct (sim, cid) of the max-dot-product centroid, parsed from
    ONE SQL expression.

    The element-wise form (k × ``F.struct``/``F.round``/``dot`` with
    python ``zip_with``/``aggregate`` lambdas over k·dim ``F.lit``
    elements) cost 1.4–2.2 s of py4j/driver time PER PLAN BUILD at
    k=16, dim=64 — paid again on every bench rep; the single parsed
    string builds the identical Catalyst tree (same fold, same casts,
    same round — pinned bit-equal) in ~0.2 s. The litutil lesson,
    applied to the whole expression rather than just the literals.
    Requires the vector column's NAME (backtick-quoted here); non-finite
    centroid values cannot appear in SQL literals — those fall back to
    the element-wise construction (litutil's convention)."""
    import math

    if not all(math.isfinite(float(v)) for c in centroids for v in c):
        cands = [
            F.struct(
                F.round(
                    dot(
                        F.col(vec_name),
                        F.array(*[F.lit(float(x)) for x in c]),
                    ),
                    6,
                ).alias("sim"),
                F.lit(i).alias("cid"),
            )
            for i, c in enumerate(centroids)
        ]
        return cands[0] if len(cands) == 1 else F.greatest(*cands)

    def arr(c: list[float]) -> str:
        return "array(" + ",".join(f"{float(v)!r}D" for v in c) + ")"

    cands = ",".join(
        f"named_struct('sim', round(aggregate(zip_with(`{vec_name}`, "
        f"{arr(c)}, (x, y) -> (CAST(x AS double) * CAST(y AS double))), "
        f"0.0D, (acc, v) -> (acc + v)), 6), 'cid', {i})"
        for i, c in enumerate(centroids)
    )
    return F.expr(f"greatest({cands})" if len(centroids) > 1 else cands)


def cluster_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cluster_id",
    sim_col: str | None = None,
) -> DataFrame:
    """Assign each row to the centroid with the highest dot product
    (cosine order if inputs and centroids are unit-normalized).
    ``sim_col`` optionally keeps the winning (rounded) dot product."""
    if not centroids:
        raise ValueError("centroids must be non-empty")
    staged = df.withColumn("_bc", _best_cluster(vec_col, centroids))
    out = staged.withColumn(out_col, F.col("_bc.cid").cast("long"))
    if sim_col is not None:
        out = out.withColumn(sim_col, F.col("_bc.sim"))
    return out.drop("_bc")


def cluster_stats(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cluster membership stats: size and min/max winning similarity
    (order-independent aggregates — cross-engine reproducible, unlike a
    float mean)."""
    assigned = cluster_assign(df, centroids, vec_col, sim_col="_sim")
    return (
        assigned.groupBy("cluster_id")
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.min("_sim").alias("min_sim"),
            F.max("_sim").alias("max_sim"),
        )
    )
