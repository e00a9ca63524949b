"""Contrastive-pair mining over embedding columns: hard negatives (and
their in-label twin, hard positives) for training embedding models.

Contrastive and metric-learning objectives (SimCSE, E5, GTE) are only
as good as their negatives: random negatives are trivially separable,
so pipelines mine HARD negatives — the most similar items that are NOT
semantically equivalent to the anchor (here: carry a different label,
e.g. a different source/topic/dup-cluster id). The symmetric
``hard_positive_topk`` (most DISSIMILAR same-label items) surfaces
borderline members for label auditing.

Determinism: cosine ties break on neighbor id; rounding happens before
ranking so the order is total and replayable in SQL. Rows with a NULL
label or a zero-norm/NULL embedding are EXCLUDED on both sides — an
unknown label is neither a safe negative nor a safe positive, and an
undefined cosine can't be ranked (it would also abort the job under
Spark 4 ANSI division).

Scale shape (100 TB):
- anchors broadcast with their vectors (mining batches are bounded —
  you mine negatives per training epoch batch, not for the whole corpus
  at once); the corpus streams through one narrow scan;
- the label test rides the same scan — no extra join: labels travel
  WITH the vectors on both sides;
- swap the scan for similarity.ivf_topk / pq.ivfpq_topk candidates when
  |corpus| x |anchors| exceeds scan budget, then re-rank the candidate
  set with this module's label rule (the verify-after-candidates shape
  every ANN pipeline here uses).

Reference parity: no counterpart in the reference repo — extension
layer (the build brief's similarity-search family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from colnade_spark.operators.similarity import dot, norm

__all__ = ["hard_negative_topk", "hard_positive_topk"]


def _labeled_rank(
    corpus: DataFrame,
    anchors: DataFrame,
    k: int,
    same_label: bool,
    descending: bool,
    id_col: str,
    vec_col: str,
    label_col: str,
    sim_decimals: int,
) -> DataFrame:
    # Unlike similarity.brute_force_topk's scaffold, both sides here are
    # pre-filtered and pre-normed:
    # - zero-norm / null embeddings are DROPPED (an undefined cosine
    #   can't be ranked; under Spark 4 ANSI the division would otherwise
    #   abort the job, and a null sim would sort FIRST in the ascending
    #   hard-positive order);
    # - null-LABEL rows are dropped on both sides — "label unknown" is
    #   neither a safe negative nor a safe positive, and the SQL
    #   label <> rule the oracle replays excludes nulls anyway;
    # - norms are staged once per row, so each pair costs one dot fold,
    #   not three.
    def side(df, id_out, vec_out, norm_out, lab_out):
        return (
            df.filter(F.col(label_col).isNotNull())
            .select(
                F.col(id_col).alias(id_out),
                F.col(vec_col).alias(vec_out),
                norm(F.col(vec_col)).alias(norm_out),
                F.col(label_col).alias(lab_out),
            )
            .filter(F.col(norm_out) > 0)
        )

    a = side(anchors, "anchor_id", "_av", "_an", "_al")
    c = side(corpus, "neighbor_id", "_cv", "_cn", "_cl")
    label_ok = (
        F.col("_cl") == F.col("_al")
        if same_label
        else F.col("_cl") != F.col("_al")
    )
    scored = (
        c.crossJoin(F.broadcast(a))
        .filter((F.col("neighbor_id") != F.col("anchor_id")) & label_ok)
        .withColumn(
            "cos_sim",
            F.round(
                dot(F.col("_av"), F.col("_cv"))
                / (F.col("_an") * F.col("_cn")),
                sim_decimals,
            ),
        )
    )
    order = F.col("cos_sim").desc() if descending else F.col("cos_sim").asc()
    w = Window.partitionBy("anchor_id").orderBy(
        order, F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("anchor_id", "neighbor_id", "rank", "cos_sim")
    )


def hard_negative_topk(
    corpus: DataFrame,
    anchors: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    sim_decimals: int = 6,
) -> DataFrame:
    """(anchor_id, neighbor_id, rank, cos_sim): the ``k`` most-similar
    DIFFERENT-label items per anchor — the hard negatives a contrastive
    batch wants. Highest cosine first; ties on neighbor id."""
    return _labeled_rank(
        corpus, anchors, k, False, True, id_col, vec_col, label_col,
        sim_decimals,
    )


def hard_positive_topk(
    corpus: DataFrame,
    anchors: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    sim_decimals: int = 6,
) -> DataFrame:
    """(anchor_id, neighbor_id, rank, cos_sim): the ``k`` LEAST-similar
    SAME-label items per anchor — borderline cluster members for label
    auditing / hard-positive sampling. Lowest cosine first."""
    return _labeled_rank(
        corpus, anchors, k, True, False, id_col, vec_col, label_col,
        sim_decimals,
    )
