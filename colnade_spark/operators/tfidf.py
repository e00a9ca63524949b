"""TF-IDF term weighting over a document corpus — the workhorse for
rare-term filtering, keyword extraction, and cheap lexical relevance in
training-data pipelines.

Formulation: ``tf = count(term in doc) / len(doc)``,
``idf = ln((N + 1) / (df + 1)) + 1`` (smoothed — terms in every doc get
idf 1, unseen-term division never occurs), ``tfidf = tf · idf``.

Scale notes (100 TB):
- One explode → (doc, term) aggregation (map-side combined: shuffle
  volume is distinct terms per doc, not tokens).
- Doc length is computed BEFORE the explode (``size`` of the token
  array) and carried through the aggregation as ``first(_len)`` — no
  doc-keyed window needed in ``tf_idf`` at all; the only exchanges are
  the (doc, term) groupBy and the term document-frequency join.
- The corpus size N is a 1-row aggregate broadcast by a nested-loop
  cross join (constant cost at any scale).
- ``top_terms`` adds a doc-keyed rank; Spark plans the rank filter as a
  per-partition top-k before the exchange (WindowGroupLimit).

Reference parity: no counterpart in the reference repo — extension
layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from colnade_spark.operators.text import tokens

__all__ = ["tf_idf", "top_terms"]


def tf_idf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-(doc, term) weights: ``(id, term, n, tf, idf, tfidf)``.
    Tokens are lowercased whitespace words; empty docs contribute no
    rows."""
    toks = df.select(
        F.col(id_col),
        F.filter(tokens(F.lower(F.col(text_col))), lambda t: t != "").alias(
            "_toks"
        ),
    )
    terms = toks.select(
        id_col,
        F.size("_toks").alias("_len"),
        F.explode("_toks").alias("term"),
    )
    # Doc length is known pre-explode (array size), so carry it through
    # the aggregation with first() — constant per doc — instead of a
    # doc-keyed window over the aggregated table. One less window.
    counts = terms.groupBy(id_col, "term").agg(
        F.count("*").alias("n"), F.first("_len").alias("_len")
    )
    n_docs = df.select(F.count("*").cast("double").alias("_n_docs"))
    # Document frequency via groupBy + join, NOT a term-partitioned
    # window: a window puts EVERY row of a hot term ("the" = the whole
    # corpus) into one partition with no partial aggregation — a
    # guaranteed straggler at scale. The groupBy partial-aggregates the
    # skew away map-side, and the resulting (term, df) table is
    # vocabulary-sized; AQE broadcasts it when it fits (left AQE-decided
    # on purpose — a 100 TB corpus vocabulary can exceed the broadcast
    # threshold, and a shuffled-hash join on the de-skewed (term, df)
    # table is the correct fallback).
    dfreq = counts.groupBy("term").agg(F.count("*").alias("_df"))
    scored = counts.join(dfreq, "term").crossJoin(F.broadcast(n_docs))
    tf = F.col("n").cast("double") / F.col("_len")
    idf = F.log((F.col("_n_docs") + 1.0) / (F.col("_df") + 1.0)) + 1.0
    return scored.select(
        F.col(id_col),
        "term",
        F.col("n").cast("long").alias("n"),
        tf.alias("tf"),
        idf.alias("idf"),
        (tf * idf).alias("tfidf"),
    )


def top_terms(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k terms per document by TF-IDF (score desc, term asc — a
    total order, so results are deterministic)."""
    scored = tf_idf(df, id_col, text_col)
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tfidf")
    )
