"""Curation decision reporting: WHY did each document survive or drop?

Every gate in this repo emits the same shape — a set of failing ids
(``contaminated_ids``, ``blocked_doc_ids``, a filtered ``gopher_flags``,
a classifier threshold cut, a dedup cluster's non-canonical members).
``curation_decisions`` joins any named collection of those sets back to
the corpus and records, per document, the sorted list of gates it failed
and the resulting keep verdict — the audit artifact curation pipelines
owe their users (aggregate drop counts hide systematic bias; per-doc
reasons expose it and make appeals/debugging possible).

Scale notes (100 TB):
- each gate joins as an ids-only table (broadcastable when small — the
  usual case for failure sets; a key-partitioned shuffle otherwise);
  document payloads never ride the joins.
- reasons are built with array_compact over literal gate names — a
  scan-side projection after the joins; no UDF, no explode.

Reference parity: no counterpart in the reference repo — extension
layer (pipeline observability).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["curation_decisions", "curation_summary"]


def curation_decisions(
    df: DataFrame,
    bad_ids: dict[str, DataFrame],
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, keep, n_reasons, reasons): per-document verdict over the
    named gate-failure id sets. ``reasons`` lists the failed gates in
    sorted-name order (deterministic); ``keep`` is true iff no gate
    fired. Gate frames may carry extra columns — only their ``id_col``
    is used — and may contain duplicate ids (distinct-ed here)."""
    if not bad_ids:
        raise ValueError("curation_decisions requires at least one gate")
    out = df.select(id_col)
    flags = []
    for name in sorted(bad_ids):
        flag = f"_g_{name}"
        gate = (
            bad_ids[name]
            .select(F.col(id_col))
            .distinct()
            .withColumn(flag, F.lit(True))
        )
        out = out.join(gate, id_col, "left")
        flags.append((name, flag))
    reasons = F.array_compact(
        F.array(
            *[
                F.when(F.col(flag), F.lit(name))
                for name, flag in flags
            ]
        )
    )
    return out.select(
        F.col(id_col),
        reasons.alias("reasons"),
    ).select(
        id_col,
        (F.size("reasons") == 0).alias("keep"),
        F.size("reasons").cast("long").alias("n_reasons"),
        "reasons",
    )


def curation_summary(decisions: DataFrame) -> DataFrame:
    """(reason, n_docs): how many documents each gate fired on (a doc
    failing two gates counts under both) plus a ``__kept__`` row — the
    one-screen pipeline health check. One explode + count over the
    (id, reasons) table, which is corpus-ID-sized, not corpus-sized."""
    fired = (
        decisions.select(F.explode("reasons").alias("reason"))
        .groupBy("reason")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    kept = decisions.filter(F.col("keep")).agg(
        F.lit("__kept__").alias("reason"),
        F.count("*").cast("long").alias("n_docs"),
    )
    return fired.unionByName(kept)
