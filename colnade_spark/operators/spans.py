"""Exact sub-document deduplication: duplicated token SPANS (Lee et al.
2022, "Deduplicating Training Data Makes Language Models Better") and
duplicated LINES (CCNet / RefinedWeb line-level boilerplate removal).

Whole-document dedup (operators/dedup.py) misses the common failure mode
of web corpora: distinct documents sharing long verbatim passages
(licenses, navigation chrome, quoted posts). The published remedy works
at sub-document granularity:

- ``duplicate_spans`` finds every k-token window whose content occurs
  >= ``min_count`` times corpus-wide and merges overlapping hits into
  maximal per-document spans — the Spark-native equivalent of the
  suffix-array pass in Lee et al. (a suffix array is a single-machine
  structure; the distributed formulation is the standard rolling
  k-gram-hash inversion, which finds the same >=k-token duplicates).
- ``remove_duplicate_spans`` drops the flagged token ranges and
  reassembles the text.
- ``duplicate_lines`` / ``remove_duplicate_lines`` are the line-level
  variant: a line (any delimiter) appearing in >= ``min_docs`` distinct
  documents is boilerplate and is removed everywhere, preserving the
  order of surviving lines.

Scale notes (100 TB):
- The only wide operations are keyed on 8-byte gram/line hashes: the
  (doc, pos, hash) hits shuffle ONCE on the hash and the corpus-wide
  occurrence count is a window over that one exchange (no second
  scan+hash pass, no join, nothing broadcast). Raw gram text never
  shuffles; span merging exchanges once on doc_id.
- Span merging is gaps-and-islands over per-doc hit positions — window
  state is one row (running lag), never the document.
- ``min_count``/``min_docs`` filtering happens in the same window pass,
  so only flagged positions (power-law corpus: a tiny fraction of all
  grams) reach the doc_id exchange.
- Detection and removal operate on the NORMALIZED token stream
  (operators/text.normalized_text) — duplicate detection must be
  formatting-insensitive; production pipelines that must preserve raw
  bytes would map span offsets back through an alignment, which is
  row-local and out of scope here.

Reference parity: no counterpart in the reference repo — extension
layer (the build brief's dedup family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from colnade_spark.operators.quality import word_ngrams
from colnade_spark.operators.text import md5_hash60, normalized_text, tokens

__all__ = [
    "clean_tokens",
    "duplicate_spans",
    "remove_duplicate_spans",
    "duplicate_lines",
    "remove_duplicate_lines",
    "merge_hit_islands",
    "remove_spans_text",
]


def clean_tokens(text: Column) -> Column:
    """Normalized, empty-stripped token array — the token stream all span
    operations index into."""
    return F.filter(
        tokens(normalized_text(F.coalesce(text, F.lit("")))), lambda t: t != ""
    )


def _gram_hits(
    df: DataFrame, id_col: str, text_col: str, k: int, hash_fn
) -> DataFrame:
    """(id, pos, _h): one row per k-token window, pos = 0-based start
    token index, _h = hash of the space-joined window content. Hashing
    happens in the projection BEFORE any exchange — only (id, pos, 8-byte
    hash) ever shuffles."""
    h = md5_hash60 if hash_fn is None else hash_fn
    staged = df.withColumn("_toks", clean_tokens(F.col(text_col)))
    return staged.select(
        F.col(id_col),
        F.posexplode(word_ngrams(F.col("_toks"), k)).alias("pos", "_g"),
    ).select(id_col, "pos", h(F.col("_g")).alias("_h"))


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
    hash_fn=None,
) -> DataFrame:
    """Maximal duplicated token spans per document.

    Output: (id_col, span_start, span_end) — 0-based inclusive token
    indices into ``clean_tokens(text)``; every k-token window inside a
    span occurs >= ``min_count`` times corpus-wide (counting repeats
    within one document), and overlapping windows are merged.

    ``hash_fn`` defaults to the portable ``md5_hash60`` (DuckDB-oracle
    checkable); pass ``F.xxhash64`` for the cheaper production hash.
    """
    hits = _gram_hits(df, id_col, text_col, k, hash_fn)
    # Corpus-wide occurrence count as a WINDOW over the hash, not
    # groupBy+join-back: the count side's partial aggregate gives its
    # exchange a different child plan than the join side's, so Catalyst
    # cannot ReuseExchange and the scan→tokenize→gram→hash subtree runs
    # TWICE (and shuffles twice: partial-agged hash counts + the full
    # hits). Power-law gram inventories barely compress under partial
    # aggregation (most grams are unique within a map task), so the
    # windowed form shuffles ~half the bytes, computes the expensive
    # hits subtree once, and drops the join. Skew on a mega-duplicated
    # gram concentrates one window partition exactly as it would one
    # groupBy partition — same hazard, one fewer copy of it.
    w = Window.partitionBy("_h")
    flagged = (
        hits.withColumn("_n", F.count("*").over(w))
        .filter(F.col("_n") >= min_count)
        .select(id_col, "pos")
    )
    return merge_hit_islands(flagged, id_col, k)


def merge_hit_islands(flagged: DataFrame, id_col: str, k: int) -> DataFrame:
    """Merge flagged k-token window starts ``(id, pos)`` into maximal
    spans ``(id, span_start, span_end)`` — gaps-and-islands: window ends
    (pos + k - 1) increase with pos, so a hit starts a new island iff it
    begins after the previous hit's window ends. Window state = one lag
    row; shared by corpus-internal span dedup and benchmark span
    decontamination (decontaminate.contaminated_spans)."""
    w = Window.partitionBy(id_col).orderBy("pos")
    prev = F.lag("pos").over(w)
    island_start = F.when(prev.isNull() | (F.col("pos") > prev + (k - 1)), 1).otherwise(0)
    islands = flagged.withColumn(
        "_island",
        F.sum(island_start).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return islands.groupBy(id_col, "_island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + (k - 1)).alias("span_end"),
    ).drop("_island")


def remove_spans_text(
    df: DataFrame,
    spans: DataFrame,
    id_col: str,
    text_col: str,
    out_col: str,
) -> DataFrame:
    """Input rows plus ``out_col``: the normalized text with every span's
    tokens removed (survivors re-joined with single spaces, original
    order preserved); rows without spans keep their full normalized
    text. ``spans`` is any (id, span_start, span_end) frame over
    ``clean_tokens(text)`` indices — the removal half shared by span
    dedup and span decontamination."""
    per_doc = spans.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("_spans")
    )
    joined = df.join(per_doc, id_col, "left").withColumn(
        "_spans", F.coalesce(F.col("_spans"), F.array())
    )
    staged = joined.withColumn("_toks", clean_tokens(F.col(text_col)))
    kept = F.filter(
        F.col("_toks"),
        lambda t, i: ~F.exists(
            F.col("_spans"),
            lambda s: (i >= s["span_start"]) & (i <= s["span_end"]),
        ),
    )
    return staged.withColumn(out_col, F.concat_ws(" ", kept)).drop(
        "_toks", "_spans"
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
    hash_fn=None,
    out_col: str = "text_dedup",
) -> DataFrame:
    """Input rows plus ``out_col``: the normalized text with every
    duplicated span's tokens removed (surviving tokens re-joined with
    single spaces, original order preserved). Documents with no
    duplicated span get their full normalized text."""
    spans = duplicate_spans(df, id_col, text_col, k, min_count, hash_fn)
    return remove_spans_text(df, spans, id_col, text_col, out_col)


def _split_literal(text: Column, delimiter: str) -> Column:
    """Split on the delimiter as a LITERAL string: F.split takes a Java
    regex, so a raw '|' or '.' delimiter would split on every character
    (and the docstrings promise 'any delimiter'). re.escape's output is
    valid Java-regex quoting for every ASCII delimiter."""
    import re as _re

    return F.split(text, _re.escape(delimiter))


def _line_hits(
    df: DataFrame, id_col: str, line_col: Column, hash_fn
) -> DataFrame:
    """(id, pos, _h, _line): one row per line with its 0-based position."""
    h = (md5_hash60 if hash_fn is None else hash_fn)(F.col("_line"))
    return (
        df.select(F.col(id_col), F.posexplode(line_col).alias("pos", "_line"))
        .filter(F.col("_line") != "")
        .withColumn("_h", h)
    )


def duplicate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str = "\n",
    min_docs: int = 2,
    hash_fn=None,
) -> DataFrame:
    """Line hashes occurring in >= ``min_docs`` DISTINCT documents
    (corpus-wide boilerplate). Output: (_h, n_docs, n_total).

    Distinct-doc counting shuffles (line-hash, doc) pairs once and
    aggregates twice — never countDistinct over raw lines."""
    lines = _line_hits(
        df, id_col, _split_literal(F.col(text_col), delimiter), hash_fn
    )
    per_doc = lines.select("_h", id_col).distinct()
    n_docs = per_doc.groupBy("_h").agg(F.count("*").alias("n_docs"))
    n_total = lines.groupBy("_h").agg(F.count("*").alias("n_total"))
    return (
        n_docs.filter(F.col("n_docs") >= min_docs)
        .join(n_total, "_h")
        .select("_h", "n_docs", "n_total")
    )


def remove_duplicate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str = "\n",
    min_docs: int = 2,
    hash_fn=None,
    out_col: str = "text_dedup",
) -> DataFrame:
    """Input rows plus ``out_col``: the text with boilerplate lines (those
    in >= ``min_docs`` distinct documents) removed, surviving lines
    re-joined with ``delimiter`` in original order. Empty lines are
    dropped (they carry no content and would otherwise all count as
    duplicates of each other)."""
    lines = _line_hits(
        df, id_col, _split_literal(F.col(text_col), delimiter), hash_fn
    )
    # Distinct-doc counts as two stacked windows over ONE exchange on the
    # line hash (row_number flags the first hit per (_h, doc), the outer
    # sum totals the flags per _h) instead of duplicate_lines + broadcast
    # anti-join. The join form re-ran the whole split+hash pass for the
    # count side AND broadcast the boilerplate-hash set — unbounded in
    # the corpus, a driver/executor memory hazard at scale. Here the
    # line rows shuffle once more (the _h exchange) but the text is
    # split and hashed exactly once and nothing broadcasts.
    wd = Window.partitionBy("_h", id_col).orderBy("pos")
    w = Window.partitionBy("_h")
    n_docs = F.sum(
        F.when(F.row_number().over(wd) == 1, 1).otherwise(0)
    ).over(w)
    kept = (
        lines.withColumn("_nd", n_docs)
        .filter(F.col("_nd") < min_docs)
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "_line"))),
                    lambda s: s["_line"],
                ),
                delimiter,
            ).alias(out_col)
        )
    )
    return df.join(kept, id_col, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(""))
    )
