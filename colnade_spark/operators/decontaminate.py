"""Benchmark decontamination: remove training documents that overlap an
evaluation/benchmark set (the GPT-3 appendix-C rule — any shared word
n-gram of length ``n`` is contamination; n=13 is the published default,
smaller corpora use smaller n).

Scale notes (100 TB): the benchmark side is SMALL (eval sets are MBs) —
its distinct n-gram hash set broadcasts. The corpus side explodes to
(doc, gram-hash) pairs ONLY long enough to semi-join against that
broadcast set: contaminated ids come back as a tiny distinct list, and
the final pass is a left-anti join of the corpus against it. No
corpus-sized shuffle anywhere — one broadcast semi-join + one
(broadcastable) anti-join; gram hashes are 8-byte xxhash64, raw text
never leaves the scan.

Reference parity: no counterpart in the reference repo — extension
layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from colnade_spark.operators.quality import word_ngrams
from colnade_spark.operators.text import normalized_text, tokens

__all__ = ["ngram_hashes", "contaminated_ids", "decontaminate"]


def ngram_hashes(text: Column, n: int) -> Column:
    """Distinct xxhash64 hashes of the normalized word n-grams of a
    document (normalization: lowercase, strip punctuation, collapse
    whitespace — matching on content, not formatting)."""
    toks = F.filter(
        tokens(normalized_text(F.coalesce(text, F.lit("")))), lambda t: t != ""
    )
    return F.array_distinct(
        F.transform(word_ngrams(toks, n), lambda g: F.xxhash64(g))
    )


def contaminated_ids(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    benchmark_text_col: str | None = None,
) -> DataFrame:
    """Ids of documents sharing at least one word n-gram with the
    benchmark set. The benchmark's gram-hash set is distinct-ed and
    broadcast; corpus grams stream through a semi-join against it."""
    bench_grams = (
        benchmark.select(
            F.explode(
                ngram_hashes(F.col(benchmark_text_col or text_col), n)
            ).alias("_g")
        )
        .distinct()
    )
    doc_grams = df.select(
        F.col(id_col), F.explode(ngram_hashes(F.col(text_col), n)).alias("_g")
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "_g", "left_semi")
        .select(id_col)
        .distinct()
    )


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    benchmark_text_col: str | None = None,
) -> DataFrame:
    """The corpus minus contaminated documents (full rows preserved)."""
    bad = contaminated_ids(df, benchmark, n, id_col, text_col, benchmark_text_col)
    return df.join(bad, id_col, "left_anti")


def semantic_contaminated_ids(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    benchmark_vec_col: str | None = None,
) -> DataFrame:
    """SEMANTIC decontamination: corpus ids whose embedding has cosine
    similarity >= ``threshold`` with ANY benchmark embedding — catches
    paraphrased eval leakage the exact n-gram rule misses.

    Scale shape: eval sets are small (10^2-10^5 vectors), so the
    benchmark side is BROADCAST and the corpus streams through one
    narrow map — no shuffle, no candidate generation needed. For a
    benchmark too large to broadcast, generate candidates with
    similarity.rp_candidates first and use this as the verifier.

    The cosine folds left-to-right over the broadcast array (same IEEE
    order in any engine); norms guard against zero vectors (null
    cosine -> never contaminated).

    Output: (id) distinct — feed to a left_anti join like decontaminate.
    """
    bcol = benchmark_vec_col or vec_col
    bench = benchmark.select(
        F.col(bcol).cast("array<double>").alias("_bv")
    )
    v = F.col(vec_col).cast("array<double>")

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    vnorm = F.sqrt(_dot(v, v))
    bnorm = F.sqrt(_dot(F.col("_bv"), F.col("_bv")))
    cos = F.when(
        (vnorm > 0) & (bnorm > 0), _dot(v, F.col("_bv")) / (vnorm * bnorm)
    )
    return (
        corpus.select(F.col(id_col), v.alias(vec_col))
        .crossJoin(F.broadcast(bench))
        .filter(cos >= threshold)
        .select(id_col)
        .distinct()
    )
