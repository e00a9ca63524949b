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

from colnade_spark.operators.litutil import lit_long_array
from colnade_spark.operators.quality import word_ngrams
from colnade_spark.operators.spans import clean_tokens

__all__ = [
    "ngram_hashes",
    "contaminated_ids",
    "contamination_report",
    "semantic_contamination_report",
    "decontaminate",
    "bloom_positions",
    "build_bloom",
    "bloom_words_df",
    "maintain_bloom_table",
    "maintain_fingerprint_bloom",
    "bloom_duplicate_gate",
    "load_bloom",
    "bloom_contaminated_ids",
    "BLOOM_SCHEME",
    "read_bloom_manifest",
    "write_bloom_manifest",
    "contaminated_spans",
    "remove_contaminated_spans",
]

# Hash-scheme tag persisted with every Bloom table. A table's bit layout
# is a function of (scheme, n, m_bits, n_hashes): probing old bits with
# different parameters returns near-all-negatives — contamination
# silently leaks through — so the layout parameters are written as a
# manifest next to the table and VERIFIED on load. Bump this tag whenever
# bloom_positions changes (it moved from k independent md5s to
# Kirsch-Mitzenmacher double hashing once already).
BLOOM_SCHEME = "km-md5-v1"

_BLOOM_MANIFEST = "_bloom_params.json"


def read_bloom_manifest(spark, table_path: str) -> dict | None:
    """The params manifest persisted next to a Bloom word table, or None
    for a pre-manifest table (which cannot be verified). Delegates to the
    generic maintained-table manifest (streaming.stream)."""
    from colnade_spark.streaming.stream import read_table_manifest

    return read_table_manifest(spark, table_path, _BLOOM_MANIFEST)


def write_bloom_manifest(
    spark, table_path: str, n: int, m_bits: int, n_hashes: int
) -> dict:
    """Write the (scheme, n, m_bits, n_hashes) manifest for a Bloom table,
    or verify it against an existing one — ERRORING on mismatch rather
    than letting a maintainer append bits in a different layout."""
    from colnade_spark.streaming.stream import write_table_manifest

    return write_table_manifest(
        spark,
        table_path,
        {
            "scheme": BLOOM_SCHEME,
            "n": n,
            "m_bits": m_bits,
            "n_hashes": n_hashes,
        },
        _BLOOM_MANIFEST,
    )


def ngram_hashes(toks: Column, n: int) -> Column:
    """Distinct xxhash64 hashes of the normalized word n-grams of a
    document (normalization: lowercase, strip punctuation, collapse
    whitespace — matching on content, not formatting).

    ``toks`` MUST be a staged token-array COLUMN (spans.clean_tokens via
    withColumn), not an inline expression: word_ngrams references it
    inside HOF lambdas, which re-evaluate outer expressions per element
    — an inline tokenizer would re-run its regexes once per gram
    position (measured 20x slowdown at sf0.1)."""
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
        benchmark.withColumn(
            "_tk", clean_tokens(F.col(benchmark_text_col or text_col))
        )
        .select(F.explode(ngram_hashes(F.col("_tk"), n)).alias("_g"))
        .distinct()
    )
    doc_grams = df.withColumn("_tk", clean_tokens(F.col(text_col))).select(
        F.col(id_col), F.explode(ngram_hashes(F.col("_tk"), n)).alias("_g")
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


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    benchmark_id_col: str | None = None,
    benchmark_text_col: str | None = None,
) -> DataFrame:
    """GRADED decontamination audit: for every benchmark document, the
    fraction of its distinct word n-grams that appear anywhere in the
    corpus — (id, n_grams, n_hit, overlap_frac). The boolean
    ``contaminated_ids`` rule (any shared gram) is ``overlap_frac > 0``;
    the graded fraction is what eval maintainers actually triage (a
    benchmark item 95% contained in the corpus is a different problem
    from one sharing a single idiom).

    Scale shape: the BENCHMARK gram set is eval-sized and broadcasts;
    corpus grams stream through one semi-join against it, so the only
    aggregated data is the (bounded) set of bench grams that were hit —
    the corpus contributes a scan, never a corpus-sized shuffle. Bench
    documents shorter than ``n`` tokens have no grams and are omitted.
    """
    bid = benchmark_id_col or id_col
    btext = benchmark_text_col or text_col
    bg = benchmark.withColumn("_tk", clean_tokens(F.col(btext))).select(
        F.col(bid).alias("_bid"),
        F.explode(ngram_hashes(F.col("_tk"), n)).alias("_g"),
    )
    cg = corpus.withColumn("_tk", clean_tokens(F.col(text_col))).select(
        F.explode(ngram_hashes(F.col("_tk"), n)).alias("_g")
    )
    # bench grams that occur in the corpus: bounded by the bench set
    hits = (
        cg.join(F.broadcast(bg.select("_g").distinct()), "_g", "left_semi")
        .distinct()
        .withColumn("_h", F.lit(1))
    )
    per = (
        bg.join(F.broadcast(hits), "_g", "left")
        .groupBy("_bid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.count("_h").cast("long").alias("n_hit"),
        )
    )
    return per.select(
        F.col("_bid").alias(bid),
        "n_grams",
        "n_hit",
        (F.col("n_hit") / F.col("n_grams")).alias("overlap_frac"),
    )


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
    v = F.col(vec_col).cast("array<double>")

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    # Norms staged ONCE PER ROW on each side before the cross join: the
    # interpreted HOF fold is the whole per-pair cost here, and inlining
    # vnorm/bnorm into the pair predicate re-evaluates them per PAIR —
    # 3 folds per pair instead of 1 (same arithmetic, same values).
    bench = benchmark.select(
        F.col(bcol).cast("array<double>").alias("_bv")
    )
    bench = bench.withColumn("_bn", F.sqrt(_dot(F.col("_bv"), F.col("_bv"))))
    staged = corpus.select(F.col(id_col), v.alias(vec_col)).withColumn(
        "_vn", F.sqrt(_dot(F.col(vec_col), F.col(vec_col)))
    )
    # the broadcast join is narrow, so a single-split corpus (the fixture
    # is one parquet file) would fold every pair on one core; at real
    # scale the reader's splits make this branch dead.
    # few_input_splits: streaming-safe (returns False on streams) and
    # milliseconds — the .rdd partition probe ran the whole planner on a
    # throwaway plan, ~1 s of driver time per bench rep
    from colnade_spark.operators.skew import few_input_splits

    if few_input_splits(staged):
        staged = staged.repartition(
            corpus.sparkSession.sparkContext.defaultParallelism
        )
    cos = F.when(
        (F.col("_vn") > 0) & (F.col("_bn") > 0),
        _dot(F.col(vec_col), F.col("_bv")) / (F.col("_vn") * F.col("_bn")),
    )
    return (
        staged.crossJoin(F.broadcast(bench))
        .filter(cos >= threshold)
        .select(id_col)
        .distinct()
    )


def semantic_contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    benchmark_vec_col: str | None = None,
) -> DataFrame:
    """GRADED semantic audit: (id, max_cos) — each corpus row's cosine
    to its NEAREST benchmark embedding, rounded to 6 places. The boolean
    ``semantic_contaminated_ids`` rule is ``max_cos >= threshold``; the
    graded value is what triage actually ranks by (how close is the
    paraphrase?). Zero-norm corpus rows report NULL (cosine undefined —
    same guard as the boolean operator). Same scale shape: benchmark
    broadcasts, the corpus streams through one narrow map + a per-id
    max — no shuffle of vectors beyond the id-keyed aggregation."""
    bcol = benchmark_vec_col or vec_col
    v = F.col(vec_col).cast("array<double>")

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    # same staging discipline as semantic_contaminated_ids: norms once
    # per row (not per pair), single-split corpora spread before the
    # narrow broadcast join.
    bench = benchmark.select(
        F.col(bcol).cast("array<double>").alias("_bv")
    )
    bench = bench.withColumn("_bn", F.sqrt(_dot(F.col("_bv"), F.col("_bv"))))
    staged = corpus.select(F.col(id_col), v.alias(vec_col)).withColumn(
        "_vn", F.sqrt(_dot(F.col(vec_col), F.col(vec_col)))
    )
    # few_input_splits: streaming-safe (returns False on streams) and
    # milliseconds — the .rdd partition probe ran the whole planner on a
    # throwaway plan, ~1 s of driver time per bench rep
    from colnade_spark.operators.skew import few_input_splits

    if few_input_splits(staged):
        staged = staged.repartition(
            corpus.sparkSession.sparkContext.defaultParallelism
        )
    cos = F.when(
        (F.col("_vn") > 0) & (F.col("_bn") > 0),
        _dot(F.col(vec_col), F.col("_bv")) / (F.col("_vn") * F.col("_bn")),
    )
    return (
        staged.crossJoin(F.broadcast(bench))
        .groupBy(id_col)
        .agg(F.round(F.max(cos), 6).alias("max_cos"))
    )


def _word_ngram_texts(toks: Column, n: int) -> Column:
    """Distinct normalized word n-grams as STRINGS (the portable form both
    engines hash identically — xxhash64 is Spark-only). ``toks`` must be
    a STAGED token-array column — see ngram_hashes."""
    return F.array_distinct(word_ngrams(toks, n))


def bloom_positions(gram: Column, m_bits: int, n_hashes: int) -> Column:
    """The ``n_hashes`` Bloom bit positions of a gram via
    Kirsch-Mitzenmacher double hashing: ONE md5 per gram, positions
    (h1 + j*h2) mod m with h1 = low 30 bits, h2 = (high 30 bits | 1).
    Within-ulp of independent hashes for FP rate (K-M 2006), 1/k the
    hash cost — hashing dominates both build and probe — and pure
    integer arithmetic, so any engine reproduces the positions from the
    same md5."""
    from colnade_spark.operators.text import md5_hash60

    h = md5_hash60(gram)
    h1 = h.bitwiseAND(F.lit((1 << 30) - 1))
    h2 = F.shiftright(h, 30).bitwiseAND(F.lit((1 << 30) - 1)).bitwiseOR(
        F.lit(1)
    )
    return F.array(
        *[(h1 + F.lit(j) * h2) % F.lit(m_bits) for j in range(n_hashes)]
    )


def build_bloom(
    benchmark: DataFrame,
    n: int = 13,
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
    text_col: str = "text",
) -> list[int]:
    """Bloom filter of the benchmark's word-n-gram set, as a bounded
    ``m_bits/64``-long list of 64-bit words (driver-side, like an IVF
    codebook: the MODEL is small by construction — 2^20 bits = 16 K words
    = 128 KB — only the corpus stays distributed).

    Why Bloom instead of the exact hash set in ``contaminated_ids``: the
    broadcast is ``m_bits/8`` bytes REGARDLESS of benchmark size (an
    exact 8-byte-hash set for a 10 M-gram benchmark broadcasts 80 MB;
    the same benchmark Blooms into 8 MB at m=2^26 with FP ≈ 1e-5), and
    membership checks become pure scan-side bit probes. False positives
    flag extra docs — acceptable for decontamination (errs toward
    removal) and deterministic given (m_bits, n_hashes).
    """
    words = [0] * (m_bits // 64)
    for r in bloom_words_df(benchmark, n, m_bits, n_hashes, text_col).collect():
        words[r._w] = r._bits
    return words


def bloom_words_df(
    benchmark: DataFrame,
    n: int = 13,
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """(_w, _bits): the Bloom filter as a sparse 64-bit-word table — the
    distributed/persistable form. Bloom words merge LOSSLESSLY with
    bit_or (associative, idempotent), so per-shard / per-batch word
    tables union into exactly the filter a single pass would build —
    the same build-once/merge-anywhere contract as sketches.py."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    grams = benchmark.withColumn(
        "_tk", clean_tokens(F.col(text_col))
    ).select(F.explode(_word_ngram_texts(F.col("_tk"), n)).alias("_g"))
    return _words_from_grams(grams, m_bits, n_hashes)


def _words_from_grams(
    grams: DataFrame, m_bits: int, n_hashes: int
) -> DataFrame:
    """(_w, _bits) sparse Bloom word table from a ``_g`` gram column —
    the one positions→words chain every Bloom builder shares. NULL
    grams (e.g. fingerprint(NULL) from a NULL-text row) are dropped:
    their positions are all-NULL, and a (_w=NULL, _bits=NULL) row in
    the maintained table would crash every subsequent ``load_bloom``."""
    return (
        grams.filter(F.col("_g").isNotNull())
        .select(
            F.explode(bloom_positions(F.col("_g"), m_bits, n_hashes)).alias("_p")
        )
        # no distinct: bit_or is idempotent, a pre-dedup shuffle buys nothing
        .select(
            F.shiftright(F.col("_p"), 6).cast("int").alias("_w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"),
                F.col("_p").bitwiseAND(63).cast("int"),
            ).alias("_m"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_m").alias("_bits"))
    )


def maintain_bloom_table(
    stream: DataFrame,
    table_path: str,
    checkpoint: str,
    n: int = 13,
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
    text_col: str = "text",
    available_now: bool = True,
):
    """STREAMING maintenance of a persisted Bloom word table: each
    micro-batch builds its own sparse word table and OVERWRITES its
    ``batch_id=<n>`` partition (idempotent under foreachBatch
    redelivery). ``load_bloom(spark, table_path, m_bits)`` bit_or-merges
    the history into the dense bitmap — identical to a single batch
    build over everything ever streamed (pinned by test). A benchmark
    set that grows over time (new eval suites) thus keeps its
    decontamination filter current without rescanning old benchmarks.
    Writes (or verifies) the params manifest BEFORE starting the stream —
    a maintainer pointed at a table built with different (scheme, n,
    m_bits, n_hashes) fails fast instead of appending bits in an
    incompatible layout. Returns the started StreamingQuery."""

    from colnade_spark.streaming.stream import maintain_partitioned_table

    write_bloom_manifest(
        stream.sparkSession, table_path, n, m_bits, n_hashes
    )
    return maintain_partitioned_table(
        stream,
        lambda b: bloom_words_df(b, n, m_bits, n_hashes, text_col),
        table_path,
        checkpoint,
        available_now,
    )


def maintain_fingerprint_bloom(
    stream: DataFrame,
    table_path: str,
    checkpoint: str,
    m_bits: int = 1 << 22,
    n_hashes: int = 4,
    text_col: str = "text",
    available_now: bool = True,
):
    """STREAMING cross-batch dedup state with BOUNDED memory: maintain a
    Bloom filter over normalized-text FINGERPRINTS (one "gram" per doc —
    ``text.fingerprint``) instead of Structured Streaming's
    ``dropDuplicates``, whose exact state grows with every distinct key
    ever seen. The bitmap is ``m_bits/8`` bytes forever; false positives
    drop a few NON-duplicates (the safe direction for corpus work, same
    bias as Bloom decontamination) and false negatives are impossible —
    a true duplicate of anything ever streamed always probes positive.

    Gate each incoming batch with ``bloom_duplicate_gate`` against
    ``load_bloom(..., n=0)`` of the history, then append the batch here.
    Manifest ``n=0`` marks the fingerprint (non-n-gram) layout so a
    gram-Bloom and a fingerprint-Bloom can never be cross-probed.
    Returns the started StreamingQuery."""
    from colnade_spark.streaming.stream import maintain_partitioned_table

    write_bloom_manifest(
        stream.sparkSession, table_path, 0, m_bits, n_hashes
    )
    from colnade_spark.operators.text import fingerprint

    def _build(b: DataFrame) -> DataFrame:
        grams = b.select(fingerprint(F.col(text_col)).alias("_g"))
        return _words_from_grams(grams, m_bits, n_hashes)

    return maintain_partitioned_table(
        stream, _build, table_path, checkpoint, available_now
    )


def bloom_duplicate_gate(
    df: DataFrame,
    bloom_words: list[int],
    m_bits: int = 1 << 22,
    n_hashes: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Rows whose normalized-text fingerprint is NOT in the history
    Bloom — the probe half of ``maintain_fingerprint_bloom``'s
    cross-batch dedup (full rows preserved; scan-side bit probes, no
    join, no shuffle). Duplicates WITHIN ``df`` itself all pass (the
    history doesn't contain them yet); compose with ``dedup_exact`` /
    ``dedup_fingerprint`` for in-batch uniqueness. NULL-text rows pass
    through (no fingerprint — they can't duplicate anything)."""
    if len(bloom_words) * 64 != m_bits:
        raise ValueError("bloom_words length must equal m_bits/64")
    from colnade_spark.operators.text import fingerprint

    lit_words = lit_long_array(bloom_words)
    fp = fingerprint(F.col(text_col))
    probe = F.forall(
        bloom_positions(fp, m_bits, n_hashes),
        lambda p: F.get(lit_words, F.shiftright(p, 6).cast("int")).bitwiseAND(
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), p.bitwiseAND(63).cast("int")
            )
        )
        != 0,
    )
    # probe is NULL for NULL text: keep those rows instead of letting
    # the filter's three-valued logic silently drop them
    return df.filter(~F.coalesce(probe, F.lit(False)))


def load_bloom(
    spark,
    table_path: str,
    m_bits: int,
    n: int | None = None,
    n_hashes: int | None = None,
) -> list[int]:
    """Merge a persisted Bloom word-table history into the dense word
    list ``bloom_contaminated_ids`` consumes. If the table carries a
    params manifest (every ``maintain_bloom_table`` write does), the
    caller's parameters are VERIFIED against it — probing a table built
    under a different hash scheme / m_bits / n_hashes silently returns
    near-all-negatives, so a mismatch is an error, not a warning. Pass
    ``n`` / ``n_hashes`` to also pin the gram length and hash count you
    intend to probe with; pre-manifest tables skip the check."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    mf = read_bloom_manifest(spark, table_path)
    if mf is not None:
        expect = {"scheme": BLOOM_SCHEME, "m_bits": m_bits}
        if n is not None:
            expect["n"] = n
        if n_hashes is not None:
            expect["n_hashes"] = n_hashes
        diff = {k: v for k, v in expect.items() if mf.get(k) != v}
        if diff:
            raise ValueError(
                f"bloom table at {table_path} was built with "
                f"{ {k: mf.get(k) for k in diff} }; caller expected {diff} "
                "— probing with mismatched parameters yields false negatives"
            )
    merged = (
        spark.read.parquet(table_path)
        .groupBy("_w")
        .agg(F.bit_or("_bits").alias("_bits"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in merged:
        words[r._w] = r._bits
    return words


def bloom_contaminated_ids(
    df: DataFrame,
    bloom_words: list[int],
    n: int = 13,
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Ids of documents with at least one word n-gram whose ``n_hashes``
    Bloom bits are ALL set (contains every truly-contaminated doc from
    ``contaminated_ids``; may add deterministic false positives).

    Scale shape: the bitmap rides the plan as a 16 K-long array literal —
    the corpus pass is one scan-speed projection (explode grams → probe
    bits with get/shift/and) + a distinct on the surviving ids. No join,
    no shuffle of gram data at all — strictly cheaper than the broadcast
    semi-join in ``contaminated_ids``.
    """
    if len(bloom_words) * 64 != m_bits:
        raise ValueError("bloom_words length must equal m_bits/64")
    lit_words = lit_long_array(bloom_words)
    grams = df.withColumn("_tk", clean_tokens(F.col(text_col))).select(
        F.col(id_col), F.explode(_word_ngram_texts(F.col("_tk"), n)).alias("_g")
    )
    probe = F.forall(
        bloom_positions(F.col("_g"), m_bits, n_hashes),
        lambda p: F.get(lit_words, F.shiftright(p, 6).cast("int")).bitwiseAND(
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), p.bitwiseAND(63).cast("int")
            )
        )
        != 0,
    )
    return grams.filter(probe).select(id_col).distinct()


def contaminated_spans(
    df: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 13,
    hash_fn=None,
) -> DataFrame:
    """SURGICAL decontamination, detection half: maximal per-document
    token spans whose every ``n``-gram appears in the benchmark —
    instead of dropping a whole document for one leaked passage
    (``contaminated_ids``), find exactly the leaked ranges. Output
    (id, span_start, span_end), 0-based inclusive indices into
    ``spans.clean_tokens(text)``; overlapping n-gram hits merge via the
    shared gaps-and-islands pass. Same n=13 default as the GPT-3 rule.

    Scale shape: corpus side is the usual (id, pos, 8-byte hash)
    projection; the benchmark gram set is distinct-ed and BROADCAST
    (benchmarks are small by definition — the contaminated_ids
    contract), so flagging is a broadcast semi-join at scan speed; the
    only corpus exchange is the per-doc island merge.
    """
    from colnade_spark.operators.spans import (
        _gram_hits,
        clean_tokens,
        merge_hit_islands,
    )
    from colnade_spark.operators.quality import word_ngrams
    from colnade_spark.operators.text import md5_hash60

    h = md5_hash60 if hash_fn is None else hash_fn
    hits = _gram_hits(df, id_col, text_col, n, hash_fn)
    staged = bench.withColumn("_toks", clean_tokens(F.col(bench_text_col)))
    bench_hashes = (
        staged.select(
            F.explode(word_ngrams(F.col("_toks"), n)).alias("_g")
        )
        .select(h(F.col("_g")).alias("_h"))
        .distinct()
    )
    flagged = hits.join(F.broadcast(bench_hashes), "_h").select(id_col, "pos")
    return merge_hit_islands(flagged, id_col, n)


def remove_contaminated_spans(
    df: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 13,
    hash_fn=None,
    out_col: str = "text_clean",
) -> DataFrame:
    """SURGICAL decontamination, removal half: input rows plus
    ``out_col`` — the normalized text with every benchmark-overlapping
    span's tokens removed (the Llama-style alternative to dropping
    whole documents: the document's unique content survives, only the
    leaked passage goes). Documents without contamination keep their
    full normalized text, so the output column is a drop-in for the
    training text field."""
    from colnade_spark.operators.spans import remove_spans_text

    spans = contaminated_spans(
        df, bench, id_col, text_col, bench_text_col, n, hash_fn
    )
    return remove_spans_text(df, spans, id_col, text_col, out_col)
