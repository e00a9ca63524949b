"""SemDeDup: semantic deduplication via cluster-then-prune (Abbas et al.
2023, "SemDeDup: Data-efficient learning at web-scale through semantic
deduplication").

MinHash/SimHash (operators/dedup.py) catch *lexical* near-duplicates;
paraphrases and template rewrites sail through. SemDeDup works in
embedding space instead: cluster the corpus, and within each cluster
drop every document whose cosine similarity to another cluster member
exceeds a threshold — keeping one representative per semantic
duplicate group. The clustering is what makes it tractable: pairwise
similarity is only ever computed within a cluster, never corpus-wide.

Deterministic keep rule (the paper keeps a random/centroid-farthest
member; both are tie-unstable across engines): a row is DROPPED iff
some *lower-id* member of the same cluster has cosine >= ``threshold``
with it. The survivor set is therefore unique and SQL-expressible
(an EXISTS self-join), which is what lets the operator be value-checked
against a DuckDB oracle.

Scale shape (100 TB):
- cluster assignment broadcasts k x dim literal centroids — one narrow
  scan, NO shuffle (embeddings.cluster_assign);
- the pairwise pass self-joins on ``cluster_id`` only: one exchange of
  (id, cluster_id, vector), quadratic *within* a cluster but never
  across clusters. Cluster granularity is the scale knob — the paper
  uses k ~ 10^4-10^5 so members-per-cluster stays bounded; re-train
  centroids (operators/clustering.kmeans) when clusters grow hot, and
  AQE skew-splits the residual hot clusters;
- cosines are rounded (``sim_decimals``) BEFORE thresholding so the
  drop decision is identical across engines/summation orders;
- the survivors join is a semi-join on ids — document payloads never
  ride the pairwise exchange.

Reference parity: no counterpart in the reference repo — extension
layer (the build brief's dedup family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from colnade_spark.operators.embeddings import cluster_assign
from colnade_spark.operators.similarity import cosine

__all__ = ["semantic_dup_pairs", "semantic_dedup"]


def semantic_dup_pairs(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_decimals: int = 6,
) -> DataFrame:
    """Within-cluster near-duplicate pairs: (id_a, id_b, cluster_id,
    cos_sim) with id_a < id_b and rounded cos_sim >= threshold.

    The join is keyed on cluster_id alone — the audit surface for
    ``semantic_dedup`` (same candidate set, pre-threshold decisions
    visible)."""
    assigned = cluster_assign(df, centroids, vec_col=vec_col).select(
        F.col(id_col), F.col(vec_col), F.col("cluster_id")
    )
    a = assigned.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_va"),
        "cluster_id",
    )
    b = assigned.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_vb"),
        F.col("cluster_id").alias("_cb"),
    )
    pairs = (
        a.join(b, (a.cluster_id == b._cb) & (F.col("id_a") < F.col("id_b")))
        .withColumn(
            "cos_sim", F.round(cosine(F.col("_va"), F.col("_vb")), sim_decimals)
        )
        .filter(F.col("cos_sim") >= F.lit(float(threshold)))
    )
    return pairs.select("id_a", "id_b", "cluster_id", "cos_sim")


def semantic_dedup(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_decimals: int = 6,
) -> DataFrame:
    """Rows of ``df`` that SURVIVE semantic dedup: a row is dropped iff a
    lower-id row in the same cluster has rounded cosine >= threshold.

    Equivalent to keeping the minimum id of every (id_a < id_b)
    duplicate pair's right side out — one anti-join of ids against the
    pair set; full rows come back via the original frame (payloads never
    enter the pairwise exchange)."""
    dropped = (
        semantic_dup_pairs(
            df, centroids, threshold, id_col, vec_col, sim_decimals
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return df.join(dropped, id_col, "left_anti")
