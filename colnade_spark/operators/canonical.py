"""Canonical document selection: duplicate clusters -> one kept
representative per cluster, chosen by quality.

Dedup pair generators (minhash / ngram-Jaccard / edit-distance /
semantic) emit PAIRS; connected components (operators/graph.py) resolve
them into CLUSTERS. Production pipelines then need a deterministic
"which copy do we keep" rule — usually the highest-quality member, not
the arbitrary minimum id the component label happens to use. This
module is that resolution step: per cluster, keep the member with the
highest quality score (ties to the LOWEST id, so the choice is total
and engine-reproducible), and map every other member to it.

Scale shape (100 TB):
- components come from the star-contraction algorithm (see graph.py);
- scoring joins the (node, component) table — 2 longs per doc — against
  a (id, score) projection; payloads never shuffle;
- the per-cluster argmax is one rank window partitioned by component —
  dedup clusters are small (the giant-component case is a data bug the
  largest_component_sizes audit catches), so no skew mitigation needed;
- the final map join is id-keyed; feeding it to a join against the
  corpus keeps/redirects full rows without moving text.

Reference parity: no counterpart in the reference repo — extension
layer (the build brief's dedup family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from colnade_spark.operators.graph import connected_components

__all__ = ["canonical_map", "resolve_canonical"]


def canonical_map(
    pairs: DataFrame,
    quality: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """(id, canonical_id) for every document that appears in ``pairs``:
    ``canonical_id`` is the member of the doc's duplicate cluster with
    the highest ``score_col`` in ``quality`` (ties -> lowest id). Docs
    absent from ``pairs`` are their own canonical and are NOT returned
    — see resolve_canonical for the corpus-wide map."""
    cc = connected_components(pairs, src=src, dst=dst)
    # collapse duplicate quality rows (max score per id) BEFORE the join:
    # a multi-row score table would otherwise fan the cluster member out
    # and duplicate the map (and the corpus through resolve_canonical)
    q = (
        quality.select(
            F.col(id_col).alias("node"), F.col(score_col).alias("_q")
        )
        .groupBy("node")
        .agg(F.max("_q").alias("_q"))
    )
    scored = cc.join(q, "node", "left")
    w = Window.partitionBy("component").orderBy(
        F.desc_nulls_last("_q"), F.asc("node")
    )
    return (
        scored.withColumn(
            "canonical_id", F.first("node").over(w)
        )
        .select(F.col("node").alias(id_col), "canonical_id")
    )


def resolve_canonical(
    df: DataFrame,
    pairs: DataFrame,
    quality: DataFrame | None = None,
    id_col: str = "doc_id",
    score_col: str = "score",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """``df`` with a ``canonical_id`` column: the kept representative of
    the row's duplicate cluster (itself when the row has no duplicates).
    Filter ``canonical_id == id`` for the deduplicated corpus, or group
    by ``canonical_id`` to aggregate duplicate families.

    ``quality`` defaults to ``df`` itself (it just needs ``id_col`` +
    ``score_col``)."""
    cmap = canonical_map(
        pairs, quality if quality is not None else df,
        id_col, score_col, src, dst,
    )
    return df.join(cmap, id_col, "left").withColumn(
        "canonical_id", F.coalesce("canonical_id", F.col(id_col))
    )
