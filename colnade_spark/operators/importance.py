"""DSIR-style importance weighting and resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

Quality classifiers (operators/classifier.py) need labels; DSIR needs
only a TARGET corpus (e.g. curated wiki/books): score every raw document
by how much more likely its hashed n-gram features are under the target
distribution than under the raw distribution, then resample with
probability proportional to the importance weight. Features are hashed
into a fixed number of buckets, so both distributions are bounded-size
tables regardless of corpus scale.

Determinism (what makes this oracle-checkable bit-exactly):
- bucket ids come from the portable 60-bit md5 hash (text.md5_hash60),
  identical in DuckDB;
- per-bucket log-ratios are rounded and SCALED TO INTEGER MICROS once
  (round(lr * 1e6) as long); a document's weight is then an exact
  integer sum — order-independent, unlike a float sum;
- resampling uses the Gumbel-top-k trick with a content-addressed
  uniform (md5 of id + salt), not an RNG: keys are reproducible and
  rank ties break on id.

Scale shape (100 TB):
- feature extraction is a narrow projection (tokens -> hashed buckets,
  no explode until counting);
- each distribution is one map-side-combined explode/count with at most
  ``buckets`` result rows — KB-scale however large the corpus;
- the log-ratio table (``buckets`` rows) broadcast-joins against the
  exploded features; per-doc weights are one doc_id-keyed aggregation
  with partial combine. Raw text never shuffles;
- Gumbel top-k is a rank over (weight + noise) — one exchange. For a
  fixed global k at extreme scale, pre-filter with an approximate
  threshold (quantile sketch) before the sort.

Reference parity: no counterpart in the reference repo — extension
layer (the build brief's sampling/quality family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from colnade_spark.operators.litutil import lit_long_array
from colnade_spark.operators.quality import word_ngrams
from colnade_spark.operators.spans import clean_tokens
from colnade_spark.operators.text import md5_hash60

__all__ = [
    "hashed_feature_buckets",
    "bucket_distribution",
    "logratio_table",
    "dsir_weights",
    "fit_logratio",
    "fit_logratio_flagged",
    "dsir_score_frozen",
    "gumbel_topk",
    "commonness_weights",
    "fit_gram_counts",
    "commonness_score_frozen",
    "duplication_weights",
]

MICRO = 1_000_000


def hashed_feature_buckets(
    toks: Column, buckets: int = 1024, bigrams: bool = True
) -> Column:
    """Array of hashed feature bucket ids (longs in [0, buckets)) for a
    token array: one per token, plus one per adjacent token bigram when
    ``bigrams`` — the DSIR feature map. Empty token array -> empty
    feature array (word_ngrams position-guards sub-n docs)."""
    uni = F.transform(toks, lambda t: F.pmod(md5_hash60(t), F.lit(buckets)))
    if not bigrams:
        return uni
    bi = F.transform(
        word_ngrams(toks, 2),
        lambda g: F.pmod(md5_hash60(g), F.lit(buckets)),
    )
    return F.concat(uni, bi)


def bucket_distribution(
    df: DataFrame,
    text_col: str = "text",
    buckets: int = 1024,
    bigrams: bool = True,
) -> DataFrame:
    """(bucket, n) feature counts over a corpus — at most ``buckets``
    rows, one map-side-combined aggregation."""
    staged = df.withColumn("_tk", clean_tokens(F.col(text_col)))
    return (
        staged.select(
            F.explode(
                hashed_feature_buckets(F.col("_tk"), buckets, bigrams)
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def logratio_table(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    buckets: int = 1024,
    smoothing: float = 1.0,
) -> DataFrame:
    """(bucket, lr_micro) per-bucket importance log-ratio, integer-scaled:
    lr = ln p_target(b) - ln p_raw(b) with additive smoothing
    p(b) = (n_b + s) / (total + s*buckets), rounded to micros so document
    sums are exact integer arithmetic."""
    s = float(smoothing)
    all_b = F.broadcast(
        target_counts.sparkSession.range(buckets).select(
            F.col("id").alias("bucket")
        )
    )
    t = target_counts.select("bucket", F.col("n").alias("_tn"))
    r = raw_counts.select("bucket", F.col("n").alias("_rn"))
    joined = (
        all_b.join(F.broadcast(t), "bucket", "left")
        .join(F.broadcast(r), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("_tn", F.lit(0)).alias("_tn"),
            F.coalesce("_rn", F.lit(0)).alias("_rn"),
        )
    )
    tot = joined.agg(
        F.sum("_tn").alias("_tt"), F.sum("_rn").alias("_rt")
    )
    lr = F.log(
        (F.col("_tn") + F.lit(s)) / (F.col("_tt") + F.lit(s * buckets))
    ) - F.log((F.col("_rn") + F.lit(s)) / (F.col("_rt") + F.lit(s * buckets)))
    return joined.crossJoin(F.broadcast(tot)).select(
        "bucket", F.round(lr * MICRO).cast("long").alias("lr_micro")
    )


def dsir_weights(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    bigrams: bool = True,
    smoothing: float = 1.0,
) -> DataFrame:
    """Per-document DSIR importance: (id, n_feats, weight) where weight is
    the exact integer-micro sum of per-bucket log-ratios over the
    document's hashed features, divided back to a double. Featureless
    (empty/null text) documents keep weight 0.0.

    Implemented as fit + frozen scoring: the two bucket distributions
    collapse to a driver-side ``buckets``-length table (bounded whatever
    the corpus size), and scoring is then a shuffle-free scan-side array
    fold — no explode/join/doc-keyed aggregation at all. Identical
    values to the join formulation (integer sums are order-independent;
    pinned by test against the explicit-join python model). NOTE the fit
    runs two Spark jobs eagerly at call time (same bounded-driver
    contract as build_bloom / the IVF training sample)."""
    lr = fit_logratio(corpus, target, text_col, buckets, bigrams, smoothing)
    return dsir_score_frozen(corpus, lr, id_col, text_col, bigrams)


def fit_logratio(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    buckets: int = 1024,
    bigrams: bool = True,
    smoothing: float = 1.0,
) -> list[int]:
    """The frozen DSIR model: the per-bucket integer-micro log-ratio
    table as a plain list indexed by bucket id. Bounded at ``buckets``
    entries regardless of corpus size (the same bounded-driver-
    materialization tier as build_bloom / the IVF training sample) —
    fit once offline, then score batches or streams with
    ``dsir_score_frozen``."""
    lr = logratio_table(
        bucket_distribution(target, text_col, buckets, bigrams),
        bucket_distribution(corpus, text_col, buckets, bigrams),
        buckets,
        smoothing,
    )
    out = [0] * buckets
    for r in lr.collect():
        out[r["bucket"]] = r["lr_micro"]
    return out


def fit_logratio_flagged(
    corpus: DataFrame,
    target_flag: Column,
    text_col: str = "text",
    buckets: int = 1024,
    bigrams: bool = True,
    smoothing: float = 1.0,
) -> list[int]:
    """``fit_logratio(corpus.filter(target_flag), corpus)`` computed in
    ONE tokenize+explode+aggregate pass, for the common case where the
    target corpus is a predicate-subset of the raw corpus (e.g. the
    curated-language slice of the crawl). Bit-identical to the two-pass
    fit (pinned by test): the per-bucket target count is a conditional
    count over the same exploded features the raw count aggregates, and
    the log-ratio expression is the exact same Catalyst tree evaluated on
    the same integer counts — only the number of corpus scans changes
    (2 tokenize passes -> 1).

    Scale shape: identical to ``fit_logratio`` (one map-side-combined
    aggregation bounded at ``buckets`` rows) minus a full corpus
    tokenize pass — at 100 TB the fit reads the corpus once, not twice."""
    s = float(smoothing)
    staged = corpus.withColumn("_tk", clean_tokens(F.col(text_col)))
    counts = (
        staged.select(
            F.explode(
                hashed_feature_buckets(F.col("_tk"), buckets, bigrams)
            ).alias("bucket"),
            target_flag.alias("_is_t"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("_rn"),
            F.count_if(F.col("_is_t")).alias("_tn"),
        )
    )
    all_b = F.broadcast(
        corpus.sparkSession.range(buckets).select(F.col("id").alias("bucket"))
    )
    joined = all_b.join(F.broadcast(counts), "bucket", "left").select(
        "bucket",
        F.coalesce("_tn", F.lit(0)).alias("_tn"),
        F.coalesce("_rn", F.lit(0)).alias("_rn"),
    )
    tot = joined.agg(F.sum("_tn").alias("_tt"), F.sum("_rn").alias("_rt"))
    lr = F.log(
        (F.col("_tn") + F.lit(s)) / (F.col("_tt") + F.lit(s * buckets))
    ) - F.log((F.col("_rn") + F.lit(s)) / (F.col("_rt") + F.lit(s * buckets)))
    table = joined.crossJoin(F.broadcast(tot)).select(
        "bucket", F.round(lr * MICRO).cast("long").alias("lr_micro")
    )
    out = [0] * buckets
    for r in table.collect():
        out[r["bucket"]] = r["lr_micro"]
    return out


def dsir_score_frozen(
    df: DataFrame,
    lr_micro: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
    bigrams: bool = True,
) -> DataFrame:
    """(id, n_feats, weight) against a FROZEN log-ratio table — a pure
    scan-side projection: feature hashing + an array fold over the
    staged table column. NO shuffle, no state, so it drops into a
    streaming ingest as a stateless gate (pinned by test) — the
    production shape: fit offline on a snapshot, score everything
    after at wire speed. Identical weights to dsir_weights when the
    table came from the same corpus/target (integer sums are
    order-independent)."""
    buckets = len(lr_micro)
    staged = df.withColumns(
        {
            "_tk": clean_tokens(F.col(text_col)),
            "_lr": lit_long_array(lr_micro),
        }
    ).withColumn("_fs", hashed_feature_buckets(F.col("_tk"), buckets, bigrams))
    weight = (
        F.aggregate(
            F.col("_fs"),
            F.lit(0).cast("long"),
            lambda acc, b: acc + F.get(F.col("_lr"), b.cast("int")),
        )
        / F.lit(float(MICRO))
    )
    return staged.select(
        F.col(id_col),
        F.size("_fs").cast("long").alias("n_feats"),
        weight.alias("weight"),
    )


def gumbel_topk(
    df: DataFrame,
    k: int,
    weight_col: str = "weight",
    id_col: str = "doc_id",
    salt: str = "dsir",
    decimals: int = 6,
) -> DataFrame:
    """Deterministic importance resampling WITHOUT replacement: the
    Gumbel-top-k trick over log-weights. The uniform is content-addressed
    (md5 of salt+id -> (0,1)), so the draw is reproducible and
    engine-portable; keys are rounded before ranking and ties break on
    id. Returns the k selected rows plus their rank ``rk``.

    Scale shape: orderBy().limit(k) plans TakeOrderedAndProject — a
    per-partition k-heap merged at the driver — NOT a global sort; the
    rank window then runs over only the k survivors (a global
    row_number over the corpus would single-partition everything)."""
    # +0.5 keeps u strictly inside (0,1): no ln(0) at either end
    u = (
        md5_hash60(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 60))
    gumbel = -F.log(-F.log(u))
    key = F.round(F.col(weight_col) + gumbel, decimals)
    topk = (
        df.withColumn("_gkey", key)
        .orderBy(F.desc("_gkey"), F.col(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.desc("_gkey"), F.col(id_col))
    return (
        topk.withColumn("rk", F.row_number().over(w).cast("long"))
        .drop("_gkey")
    )


def commonness_weights(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    weight_col: str = "weight",
) -> DataFrame:
    """SoftDeDup-style soft deduplication (He et al. 2024, "SoftDedup":
    reweight common data instead of dropping it): a document's
    COMMONNESS is the mean corpus-wide occurrence count of its word
    n-grams, and its training weight is the inverse —
    ``weight = n_grams / sum_df`` — so a fully unique document weighs
    1.0 (every gram's count is its own occurrence) and a document made
    of boilerplate seen d times corpus-wide weighs ~1/d. Unlike hard
    dedup this keeps the long tail of partially-duplicated text, just
    down-weighted; compose with ``sampling.weighted_sample`` or emit the
    weight into the training manifest.

    Returns ``(id_col, n_grams, sum_df, weight_col)`` — ids only, the
    payload joins back by id (candidate-join discipline). Every output
    is exact-integer-derived: n_grams and sum_df are exact counts and
    the weight is ONE correctly-rounded IEEE division, so the result is
    bit-reproducible in any engine. Documents with no grams (NULL/empty
    text, or fewer than ``n`` tokens) carry weight 1.0 by definition —
    no duplication evidence.

    Scale shape (100 TB): tokens are STAGED as a real column before the
    n-gram HOF (outer-ref re-eval gotcha, see NOTES); the explode
    carries (id, 8-byte gram hash) only; the gram-count table is one
    map-side-combined aggregation (the token-count tier). The count
    join-back joins ONLY the REPEATED grams (df > 1): a df=1 gram
    contributes exactly its own occurrence, so
    ``sum_df = n_grams + Σ_{df>1 occurrences}(df - 1)`` — identical
    integers (oracle-pinned), with the join's build side shrunk from
    every distinct gram to the repeated vocabulary (7.6x fewer rows on
    the round-8 generated fixture; far more on real corpora, where
    boilerplate is a small minority of distinct shingles — small
    enough there for AQE's runtime broadcast conversion to delete the
    gram-side shuffle entirely). The probe side (every occurrence) is
    unchanged; for scoring STREAMS or avoiding the corpus-wide join
    altogether, the frozen bucketed table
    (``fit_gram_counts``/``commonness_score_frozen``) is the
    production path — the round-8 scale board measured this exact
    operator at 1.13 last-decade exponent at 5M docs (the join-back's
    sort constant) vs 0.90 for the frozen twin. Raw text never
    shuffles. Deliberate trade-off: the exploded-gram subtree is
    referenced twice (count build + join back), so tokenization+hashing
    run twice — a constant 2x of embarrassingly-parallel scan CPU. The
    alternative (repartition once on the gram hash and reuse the
    exchange for both) saves that pass but drops the counts' map-side
    combine, turning a boilerplate hot gram into a single-task
    straggler; skew-robustness wins at 100 TB.
    """
    if n < 1:
        raise ValueError("commonness_weights: n must be >= 1")
    for c in ("_sd_tk", "_sd_g", "_sd_gh", "_sd_df"):
        if c in df.columns:
            raise ValueError(f"commonness_weights: input already has {c!r}")
    staged = df.withColumn("_sd_tk", clean_tokens(F.col(text_col)))
    grams = staged.select(
        F.col(id_col),
        F.explode_outer(word_ngrams(F.col("_sd_tk"), n)).alias("_sd_g"),
    ).select(
        id_col,
        F.when(
            F.col("_sd_g").isNotNull(), md5_hash60(F.col("_sd_g"))
        ).alias("_sd_gh"),
    )
    counts = (
        grams.filter(F.col("_sd_gh").isNotNull())
        .groupBy("_sd_gh")
        .agg(F.count(F.lit(1)).alias("_sd_df"))
    )
    repeated = counts.filter(F.col("_sd_df") > 1)
    per_doc = (
        grams.join(repeated, "_sd_gh", "left")
        .groupBy(id_col)
        .agg(
            F.count("_sd_gh").alias("n_grams"),
            (
                F.count("_sd_gh")
                + F.coalesce(F.sum(F.col("_sd_df") - 1), F.lit(0))
            )
            .cast("long")
            .alias("sum_df"),
        )
    )
    w = F.when(
        F.col("sum_df") > 0,
        F.col("n_grams").cast("double") / F.col("sum_df").cast("double"),
    ).otherwise(F.lit(1.0))
    return per_doc.select(
        id_col, "n_grams", "sum_df", w.alias(weight_col)
    )


def fit_gram_counts(
    corpus: DataFrame,
    text_col: str = "text",
    n: int = 3,
    buckets: int = 4096,
) -> list[int]:
    """The FROZEN SoftDeDup model: corpus-wide word-n-gram occurrence
    counts folded into a ``buckets``-length table indexed by
    ``md5_hash60(gram) % buckets`` — the commonness twin of
    ``fit_logratio`` (same bounded-driver-materialization tier: the
    groupBy yields at most ``buckets`` rows whatever the corpus size).
    Fit once on a corpus snapshot, then score batches or STREAMS with
    ``commonness_score_frozen``.

    Bucketing is the stream-legality trade: the exact gram-count table
    (``commonness_weights``) is unbounded and needs a corpus-wide
    aggregation per scoring pass; this table is a broadcastable
    constant. Collisions only ever OVER-count a gram's frequency, so
    frozen weights are conservative (never higher than the exact ones)
    — size ``buckets`` to the corpus's boilerplate vocabulary."""
    if n < 1:
        raise ValueError("fit_gram_counts: n must be >= 1")
    if buckets < 1:
        raise ValueError("fit_gram_counts: buckets must be >= 1")
    staged = corpus.withColumn("_cf_tk", clean_tokens(F.col(text_col)))
    b = staged.select(
        F.explode(word_ngrams(F.col("_cf_tk"), n)).alias("_cf_g")
    ).select(
        F.pmod(md5_hash60(F.col("_cf_g")), F.lit(buckets))
        .cast("int")
        .alias("_cf_b")
    )
    out = [0] * buckets
    for r in b.groupBy("_cf_b").agg(F.count(F.lit(1)).alias("_n")).collect():
        out[r["_cf_b"]] = r["_n"]
    return out


def commonness_score_frozen(
    df: DataFrame,
    counts: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    weight_col: str = "weight",
) -> DataFrame:
    """SoftDeDup commonness scoring against a FROZEN bucketed gram-count
    table (``fit_gram_counts``) — a pure scan-side projection: tokenize,
    n-gram, bucket-hash, one array fold over the staged count column. NO
    shuffle, no state, so it drops into a streaming ingest as a
    stateless gate (pinned by test) — the production shape for
    continuously arriving data, where ``commonness_weights``' exact
    corpus-wide gram aggregation is not stream-legal.

    Semantics: each gram's document frequency is the frozen bucket
    count clamped to ≥ 1 — a gram the fit corpus never saw counts only
    its own occurrence, so entirely-novel documents weigh exactly 1.0.
    Scoring the fit corpus itself reproduces ``commonness_weights``
    bit-exactly when no two distinct grams share a bucket (equivalence
    pinned by test); under collisions ``sum_df`` only grows, so frozen
    weights are CONSERVATIVE (≤ exact). Output matches
    ``commonness_weights``: ``(id_col, n_grams, sum_df, weight_col)``,
    exact longs plus one IEEE division.

    Scale (100 TB): the count table rides along as one literal array
    column (``buckets`` longs — the DSIR ``_lr`` discipline: stage it
    as a REAL column, never an outer ref re-evaluated per element); the
    fold is per-row arithmetic inside the projection. Raw text never
    shuffles; there is no exchange at all."""
    if n < 1:
        raise ValueError("commonness_score_frozen: n must be >= 1")
    buckets = len(counts)
    if buckets < 1:
        raise ValueError("commonness_score_frozen: empty count table")
    for c in ("_cf_tk", "_cf_ct", "_cf_gb"):
        if c in df.columns:
            raise ValueError(
                f"commonness_score_frozen: input already has {c!r}"
            )
    staged = df.withColumns(
        {
            "_cf_tk": clean_tokens(F.col(text_col)),
            "_cf_ct": lit_long_array(counts),
        }
    ).withColumn(
        "_cf_gb",
        F.transform(
            word_ngrams(F.col("_cf_tk"), n),
            lambda g: F.pmod(md5_hash60(g), F.lit(buckets)).cast("int"),
        ),
    )
    sum_df = F.aggregate(
        F.col("_cf_gb"),
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + F.greatest(F.get(F.col("_cf_ct"), b), F.lit(1).cast("long")),
    )
    scored = staged.select(
        F.col(id_col),
        F.size("_cf_gb").cast("long").alias("n_grams"),
        sum_df.alias("sum_df"),
    )
    return scored.select(
        id_col,
        "n_grams",
        "sum_df",
        F.when(
            F.col("sum_df") > 0,
            F.col("n_grams").cast("double") / F.col("sum_df").cast("double"),
        )
        .otherwise(F.lit(1.0))
        .alias(weight_col),
    )


def duplication_weights(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weight_col: str = "dup_weight",
) -> DataFrame:
    """Cluster-size soft dedup: each document's weight is 1/|its exact
    near-dup cluster| by normalized-text fingerprint — the k copies of a
    document together contribute ONE document's worth of training mass
    (the downweight-instead-of-drop counterpart of ``dedup.
    dedup_fingerprint``, which keeps a single survivor). Documents with
    a NULL fingerprint (NULL text) carry weight 1.0 — NULLs are not a
    cluster.

    Returns ``(id_col, cluster_size, weight_col)``; the weight is one
    IEEE division of an exact count, bit-reproducible anywhere.

    Scale: one map-side-combined count on the 16-byte digest, then a
    digest-keyed join back of (id, digest) — ids and digests only, the
    payload never shuffles.
    """
    from colnade_spark.operators.text import fingerprint

    for c in ("_dw_fp", "_dw_n"):
        if c in df.columns:
            raise ValueError(f"duplication_weights: input already has {c!r}")
    idsfp = df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("_dw_fp"))
    counts = (
        idsfp.filter(F.col("_dw_fp").isNotNull())
        .groupBy("_dw_fp")
        .agg(F.count(F.lit(1)).alias("_dw_n"))
    )
    joined = idsfp.join(counts, "_dw_fp", "left")
    return joined.select(
        id_col,
        F.coalesce(F.col("_dw_n"), F.lit(1)).cast("long").alias("cluster_size"),
        F.coalesce(
            F.lit(1.0) / F.col("_dw_n").cast("double"), F.lit(1.0)
        ).alias(weight_col),
    )
