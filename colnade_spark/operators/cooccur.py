"""Corpus co-occurrence statistics: adjacent-bigram counts and PMI
(pointwise mutual information) — the standard collocation signal used to
build tokenizer merge candidates, phrase lists, and corpus-drift probes.

PMI(a,b) = ln( (c(a,b)/B) / ((c(a)/T)·(c(b)/T)) ) where c(·) are corpus
counts, T total tokens, B total bigrams. All counts are exact integers
(order-independent aggregation); the single ``ln`` at the end is the only
float op, so cross-engine agreement is a round(…, 6) away.

Scale notes (100 TB):
- ONE tokenize + ONE explode over the corpus: each token zips with its
  successor (NULL for doc-final tokens), so the single map-side-combined
  pair aggregation also carries the unigram and total information —
  unigram counts, totals, and the bigram table all derive from the
  compact pair-count table (distinct-bigram-sized, ≪ corpus), which is
  lazily localCheckpoint'ed so the three derivations materialize it once.
- The unigram count table is vocab-sized (≪ corpus) and joins back to
  the bigram table twice as a BROADCAST; the totals ride along as a
  1-row cross join (literal-sized).
- ``min_count`` filters the bigram table BEFORE the joins, so the join
  input is the (power-law) head, not the raw bigram inventory.

Reference parity: no counterpart in the reference repo — extension
layer (corpus statistics for LLM-data pipelines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from colnade_spark.operators.spans import clean_tokens

__all__ = ["bigram_counts", "bigram_pmi", "bigram_logprob"]


def bigram_counts(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """(tok_a, tok_b, n_ab): corpus-wide adjacent-pair counts over the
    normalized token stream. Map-side combined; one shuffle on the pair."""
    staged = df.withColumn("_toks", clean_tokens(F.col(text_col)))
    pairs = staged.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("_toks"), 1, F.greatest(F.size("_toks") - 1, F.lit(0))),
                F.slice(
                    F.col("_toks"),
                    2,
                    F.greatest(F.size("_toks") - 1, F.lit(0)),
                ),
                lambda a, b: F.struct(a.alias("tok_a"), b.alias("tok_b")),
            )
        ).alias("_p")
    ).select("_p.tok_a", "_p.tok_b")
    return (
        pairs.groupBy("tok_a", "tok_b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= min_count)
    )


def bigram_pmi(
    df: DataFrame, text_col: str = "text", min_count: int = 5
) -> DataFrame:
    """(tok_a, tok_b, n_ab, pmi): PMI over adjacent bigrams with
    ``min_count`` support. Exact integer counts; ``pmi`` is the single
    ln at the end (round before cross-engine comparison).

    The corpus is tokenized ONCE: each token is zipped with its
    successor (``zip_with`` pads the shorter slice with NULL, so the
    last token of every doc pairs with NULL and every token appears
    exactly once as ``tok_a``). One explode + one map-side-combined
    aggregation yields the (tok_a, tok_b|NULL, n_ab) pair-count table;
    unigram counts (sum over successors), token/bigram totals, and the
    bigram table itself are all derived from that COMPACT table — no
    second or third pass over the corpus. The pair-count table is
    localCheckpoint'ed (lazily) so the three derivations share one
    materialization."""
    staged = df.withColumn("_toks", clean_tokens(F.col(text_col)))
    pairs = staged.select(
        F.explode(
            F.zip_with(
                F.col("_toks"),
                F.slice(
                    F.col("_toks"),
                    2,
                    F.greatest(F.size("_toks") - 1, F.lit(0)),
                ),
                lambda a, b: F.struct(a.alias("tok_a"), b.alias("tok_b")),
            )
        ).alias("_p")
    ).select("_p.tok_a", "_p.tok_b")
    pc = (
        pairs.groupBy("tok_a", "tok_b")
        .agg(F.count("*").alias("n_ab"))
        .localCheckpoint(eager=False)
    )
    uni = pc.groupBy("tok_a").agg(F.sum("n_ab").cast("long").alias("n_tok")).select(
        F.col("tok_a").alias("tok"), "n_tok"
    )
    totals = pc.agg(
        F.sum("n_ab").cast("long").alias("t_toks"),
        F.sum(F.when(F.col("tok_b").isNotNull(), F.col("n_ab")))
        .cast("long")
        .alias("t_bi"),
    )
    bi = pc.filter(
        F.col("tok_b").isNotNull() & (F.col("n_ab") >= min_count)
    )
    joined = (
        bi.join(
            F.broadcast(uni.select(F.col("tok").alias("tok_a"), F.col("n_tok").alias("n_a"))),
            "tok_a",
        )
        .join(
            F.broadcast(uni.select(F.col("tok").alias("tok_b"), F.col("n_tok").alias("n_b"))),
            "tok_b",
        )
        .crossJoin(F.broadcast(totals))
    )
    pmi = F.log(
        (F.col("n_ab") / F.col("t_bi"))
        / ((F.col("n_a") / F.col("t_toks")) * (F.col("n_b") / F.col("t_toks")))
    )
    return joined.select("tok_a", "tok_b", "n_ab", pmi.alias("pmi"))


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 1.0,
    scale: int = 10_000,
) -> DataFrame:
    """(id, n_bigrams, nll): per-document mean negative log-likelihood
    under an add-k-smoothed bigram LM fit on the SAME corpus — the
    in-engine stand-in for CCNet's KenLM perplexity filter (docs with
    high nll are "surprising" relative to the corpus: boilerplate-free
    gibberish, wrong-language fragments, OCR noise). Lower = more
    corpus-typical.

    P(b|a) = (c(ab)+k) / (c(a)+k·V); a document's nll is the mean of
    -ln P over its adjacent bigrams (docs with <2 tokens report NULL).

    Determinism: each bigram's ln is rounded to ``1/scale`` precision
    and summed as INTEGERS (order-independent — the DSIR trick), so the
    per-doc value is reproducible under any partitioning and replayable
    in SQL; the lone cross-engine float op is ln itself, evaluated once
    per distinct (a,b) context, not per occurrence.

    Scale shape: counts come from the single-pass successor-pair
    aggregation (see bigram_pmi); scoring explodes (doc, pair) and
    equi-joins the pair-count table keyed on the pair — the tf-idf cost
    tier. The unigram table and the two scalars (V, k) broadcast."""
    staged = df.withColumn("_toks", clean_tokens(F.col(text_col)))
    pairs = staged.select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.col("_toks"),
                F.slice(
                    F.col("_toks"), 2, F.greatest(F.size("_toks") - 1, F.lit(0))
                ),
                lambda a, b: F.struct(a.alias("tok_a"), b.alias("tok_b")),
            )
        ).alias("_p"),
    ).select(id_col, "_p.tok_a", "_p.tok_b")
    pc = (
        pairs.groupBy("tok_a", "tok_b")
        .agg(F.count("*").alias("n_ab"))
        .localCheckpoint(eager=False)
    )
    uni = pc.groupBy("tok_a").agg(F.sum("n_ab").cast("long").alias("n_a"))
    vocab = uni.agg(F.count("*").cast("long").alias("_v"))
    scoring_pairs = pairs.filter(F.col("tok_b").isNotNull())
    bi = pc.filter(F.col("tok_b").isNotNull())
    scored = (
        scoring_pairs.join(bi, ["tok_a", "tok_b"], "left")
        .join(F.broadcast(uni), "tok_a")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "_lp",
            F.round(
                F.log(
                    (F.coalesce(F.col("n_ab"), F.lit(0)) + F.lit(float(k)))
                    / (F.col("n_a") + F.lit(float(k)) * F.col("_v"))
                )
                * scale
            ).cast("long"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("_lp").alias("_sum_lp"),
    )
    nll = -(F.col("_sum_lp") / F.lit(float(scale))) / F.col("n_bigrams")
    out = per_doc.select(
        id_col, "n_bigrams", F.round(nll, 6).alias("nll")
    )
    # docs with <2 tokens have no bigrams: report them with NULL nll
    return (
        df.select(id_col)
        .join(out, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            "nll",
        )
    )
