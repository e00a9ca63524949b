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
