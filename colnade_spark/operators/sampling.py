"""Deterministic, reproducible sampling for training-data pipelines:
hash-gated row sampling, train/val/test splitting, and exact per-group
stratified sampling.

Reference parity: the reference's ``sample`` (colnade dataframe op) is
seeded-random; these operators are the *content-addressed* variants a
large corpus pipeline needs — membership depends only on the key bytes,
so re-runs, backfills, and incremental loads select identical rows
without coordination. All three are built on the portable md5-derived
60-bit hash (operators/text.md5_hash60), reproducible in any engine.

Scale notes (100 TB):
- ``hash_sample`` / ``hash_split`` are scan-speed filters/projections —
  no shuffle, no UDF; the gate pushes into the scan stage.
- ``stratified_sample`` is one shuffle keyed by the group column
  (window row_number); skewed groups are bounded by k via
  rank-pushdown (Spark translates the rank filter into a per-partition
  top-k before the exchange).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from colnade_spark.operators.text import md5_hash60

__all__ = [
    "sample_hash",
    "hash_sample",
    "hash_split",
    "group_split",
    "mixture_sample",
    "temperature_mixture",
    "weighted_sample",
    "stratified_sample",
    "upsample_epochs",
    "solve_epochs",
]

_HASH_SPACE = 1 << 60


def sample_hash(key: Column, salt: str = "") -> Column:
    """The 60-bit sampling hash: md5 of (key ∥ salt), top 15 hex digits
    as a non-negative BIGINT. Uniform over [0, 2^60)."""
    return md5_hash60(F.concat(key.cast("string"), F.lit(salt)))


def hash_sample(
    df: DataFrame, frac: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep rows whose sampling hash falls below ``frac`` of the hash
    space. Deterministic in the key: the same rows survive on every run
    and on every engine; disjoint salts give independent samples.
    NULL keys hash to NULL and are dropped (sampling requires an
    identity; filter nulls upstream if they must be kept)."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError("frac must be in [0, 1]")
    threshold = int(frac * _HASH_SPACE)
    return df.filter(sample_hash(F.col(key_col), salt) < F.lit(threshold))


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Append a deterministic split label (e.g. train/val/test) chosen by
    the key's hash bucket; weights must sum to 1. Label boundaries are
    cumulative-weight thresholds over the hash space, so every key maps
    to exactly one label, stable across runs and engines."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    h = sample_hash(F.col(key_col), salt)
    expr = None
    acc = 0.0
    *head, (last_label, _) = list(weights.items())
    for label, w in head:
        acc += w
        bound = int(acc * _HASH_SPACE)
        branch = F.when(h < F.lit(bound), F.lit(label))
        expr = branch if expr is None else expr.when(h < F.lit(bound), F.lit(label))
    expr = F.lit(last_label) if expr is None else expr.otherwise(F.lit(last_label))
    return df.withColumn(out_col, expr)


def group_split(
    df: DataFrame,
    groups: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    group_col: str = "component",
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """LEAKAGE-SAFE train/val/test split: the split label is hashed from
    the GROUP id, not the row key, so every member of a group — a
    near-duplicate cluster (connected_components output), a canonical
    mapping, a domain, an author — lands in the SAME split. Splitting
    i.i.d. by row puts one near-duplicate in train and its twin in
    test, silently inflating eval; grouping by duplicate cluster is the
    standard fix.

    ``groups`` is a (``key_col``, ``group_col``) mapping; rows of ``df``
    absent from it form singleton groups keyed by their own key (so a
    partial mapping — e.g. only the duplicate-bearing docs — is fine).
    Same deterministic hash gate as ``hash_split``: stable across runs,
    partitionings, and engines.

    Scale shape: one equi-join against an ids-only mapping (broadcast it
    when only the duplicate-bearing subset is mapped — the common case —
    else a key-partitioned shuffle), then the scan-side hash CASE. The
    realized fractions converge on GROUP counts, not row counts: a few
    giant clusters skew row proportions by design (they must stay
    whole)."""
    # a key mapped twice would fan out the join: collapse to one group
    # per key deterministically (min group id)
    g = (
        groups.select(
            F.col(key_col), F.col(group_col).cast("string").alias("_grp")
        )
        .groupBy(key_col)
        .agg(F.min("_grp").alias("_grp"))
    )
    joined = df.join(g, key_col, "left").withColumn(
        "_grp", F.coalesce(F.col("_grp"), F.col(key_col).cast("string"))
    )
    return hash_split(joined, weights, key_col="_grp", salt=salt, out_col=out_col).drop(
        "_grp"
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis A-Res): rank rows by ``u^(1/w)`` where ``u`` is
    the key's hash mapped to (0, 1] — higher-weight rows win
    proportionally more often, yet membership is still content-addressed
    (same rows on every run and engine). Rows with non-positive or null
    weights are excluded. One global top-k (TakeOrderedAndProject —
    per-partition top-k then a k-row merge, no full shuffle)."""
    if k <= 0:
        raise ValueError("k must be positive")
    u = (sample_hash(F.col(key_col), salt).cast("double") + 1.0) / float(_HASH_SPACE)
    score = F.pow(u, 1.0 / F.col(weight_col).cast("double"))
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("_ws", score)
        .orderBy(F.col("_ws").desc(), F.col(key_col).asc())
        .limit(k)
        .drop("_ws")
    )


def stratified_sample(
    df: DataFrame, group_col: str, k: int, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Exactly ``min(k, group size)`` rows per group, chosen by sampling-
    hash order (ties broken by the key) — a deterministic reservoir
    sample. One shuffle on the group column; the rank filter becomes a
    per-partition top-k before the exchange."""
    if k <= 0:
        raise ValueError("k must be positive")
    w = Window.partitionBy(group_col).orderBy(
        sample_hash(F.col(key_col), salt).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_ss_rn", F.row_number().over(w))
        .filter(F.col("_ss_rn") <= k)
        .drop("_ss_rn")
    )


def mixture_sample(
    df: DataFrame,
    source_col: str,
    targets: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministically subsample each source so the OUTPUT approximates
    the ``targets`` mixture (domain reweighting for training corpora) —
    downsampling only, never duplication: output size is the largest M
    with t_s*M <= n_s for every source (the binding source is kept
    whole).

    One counting aggregate fixes per-source keep rates (a handful of
    rows to the driver — bounded by the number of SOURCES, not data);
    membership is then the same content-addressed md5 gate as
    hash_sample, evaluated at scan speed with no data shuffle.
    Reproducible across runs, partitionings, and engines. Sources not
    in ``targets`` are dropped; a target source absent from the data
    raises (its rate would silently be unachievable).
    """
    if not targets:
        raise ValueError("mixture_sample requires at least one target")
    if any(w <= 0 for w in targets.values()):
        raise ValueError("target weights must be positive")
    tot = sum(targets.values())
    t = {s: w / tot for s, w in targets.items()}
    counts = {
        r[0]: r[1]
        for r in df.groupBy(source_col).count().collect()
        if r[0] in t
    }
    missing = sorted(set(t) - set(counts))
    if missing:
        raise ValueError(f"mixture_sample: sources absent from data: {missing}")
    m = min(counts[s] / t[s] for s in t)
    thresholds = {s: int(((t[s] * m) / counts[s]) * _HASH_SPACE) for s in t}
    return _threshold_gate(df, thresholds, source_col, key_col, salt)


def _threshold_gate(
    df: DataFrame,
    thresholds: dict[str, int],
    source_col: str,
    key_col: str,
    salt: str,
) -> DataFrame:
    """Filter to rows whose sampling hash clears their source's
    threshold (scan-side CASE; unknown sources always dropped) — the
    shared realization step of the mixture samplers."""
    thr = None
    for s, th in thresholds.items():
        cond = F.col(source_col) == s
        thr = F.when(cond, th) if thr is None else thr.when(cond, th)
    thr = thr.otherwise(F.lit(-1))  # unknown source -> always dropped
    return df.filter(sample_hash(F.col(key_col), salt) < thr)


def temperature_mixture(
    df: DataFrame,
    alpha: float = 0.5,
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Temperature-flattened mixture (the multilingual alpha-sampling
    recipe — XLM-R / mBERT exponentiated sampling): the output mixture
    is proportional to ``n_s**alpha``, so abundant sources flatten and
    rare sources keep relatively more — realized by DOWNSAMPLING only
    (the source scarcest relative to its flattened target keeps every
    row). ``alpha=1`` keeps the natural mixture; ``alpha -> 0``
    approaches uniform.

    Same machinery as ``mixture_sample`` but with the UNNORMALIZED
    weights ``w_s = n_s**alpha``: every keep rate is then a pure
    per-source scalar expression of the counts —
    ``rate_s = (w_s * m) / n_s`` with ``m = min_k n_k / w_k`` — with no
    cross-source float sum and no iteration-order ambiguity. With the
    default ``alpha=0.5`` the weight is ``sqrt`` (correctly-rounded
    IEEE), so thresholds are bit-reproducible in any engine; other
    alphas go through ``pow``, which libms don't guarantee correctly
    rounded — fine for sampling, but pin 0.5 when an oracle must replay
    the thresholds.

    One counting aggregate to the driver (bounded by source count);
    membership is the scan-side content-addressed hash gate — no data
    shuffle, deterministic across runs, partitionings, and engines."""
    import math

    if alpha <= 0:
        raise ValueError("alpha must be positive")
    # NULL source keys are excluded from the solve: _threshold_gate
    # drops them unconditionally, so counting them could make a large
    # NULL group the binding minimum and depress every real source's
    # keep rate (mixture_sample likewise counts only target sources).
    counts = {
        r[0]: r[1]
        for r in df.groupBy(source_col).count().collect()
        if r[0] is not None
    }
    if not counts:
        # no real sources: an empty frame stays empty, and a frame of
        # only NULL-source rows still drops them all (the gate contract)
        # instead of short-circuiting to keep-all
        return df.filter(F.col(source_col).isNotNull())
    w = {
        s: (math.sqrt(float(n)) if alpha == 0.5 else float(n) ** alpha)
        for s, n in counts.items()
    }
    m = min(counts[s] / w[s] for s in w)
    thresholds = {
        s: int(((w[s] * m) / counts[s]) * _HASH_SPACE) for s in w
    }
    return _threshold_gate(df, thresholds, source_col, key_col, salt)


def upsample_epochs(
    df: DataFrame,
    epochs: dict[str, float],
    domain_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "",
    copy_col: str = "epoch",
) -> DataFrame:
    """Materialized domain upsampling: each row is replicated
    ``epochs[domain]`` times (DoReMi / LLaMA-style data mixing, where
    high-value domains see multiple training epochs).

    Fractional epochs are content-addressed: a domain weighted 2.5 gives
    every row 2 copies, plus a 3rd for the deterministic hash-gated half
    of its keys — so the realized mix is exact in expectation AND
    reproducible row-for-row across runs and engines (same
    ``sample_hash`` gate as ``hash_sample``, independent per salt).

    Output: input rows replicated, with ``copy_col`` numbering each
    copy from 1 — downstream shuffles (e.g. pack/shard) spread the
    copies apart; identical copies are distinguishable for debugging.
    Domains absent from ``epochs`` get 1 copy (epoch weights default to
    1.0, matching "no upsampling" semantics).

    Scale notes: one projection + explode — no shuffle, no UDF, no
    driver state; the count expression is a literal CASE over domains.
    Replication multiplies downstream volume by design; run it AFTER
    filtering/dedup, immediately before shard/pack.
    """
    if any(e < 0 for e in epochs.values()):
        raise ValueError("epoch weights must be non-negative")
    whole_expr = None
    frac_expr = None
    for dom, e in epochs.items():
        whole, frac = int(e), e - int(e)
        cond = F.col(domain_col) == dom
        gate = F.lit(int(frac * _HASH_SPACE))
        if whole_expr is None:
            whole_expr = F.when(cond, whole)
            frac_expr = F.when(cond, gate)
        else:
            whole_expr = whole_expr.when(cond, whole)
            frac_expr = frac_expr.when(cond, gate)
    whole_expr = whole_expr.otherwise(F.lit(1))
    frac_expr = frac_expr.otherwise(F.lit(0))
    copies = whole_expr + (
        sample_hash(F.col(key_col), salt) < frac_expr
    ).cast("int")
    staged = df.withColumn("_n_copies", copies).filter(F.col("_n_copies") >= 1)
    return (
        staged.withColumn(
            copy_col, F.explode(F.sequence(F.lit(1), F.col("_n_copies")))
        )
        .drop("_n_copies")
    )


def solve_epochs(
    token_counts: dict[str, float],
    target_weights: dict[str, float],
    max_epochs: float = 8.0,
) -> dict[str, float]:
    """Epoch multipliers that realize a target domain TOKEN mixture with
    no downsampling (the LLaMA/DoReMi recipe computation): the domain
    MOST ABUNDANT relative to its target — minimum w_d/n_d — anchors at
    1 epoch, and scarcer domains (larger w_d/n_d) replicate
    proportionally, capped at ``max_epochs`` (the published recipes cap
    repetition; repeated data loses value fast). A domain that hits the
    cap UNDER-REALIZES its target weight — the realized mixture shifts
    toward the uncapped domains — so callers who must hit the target
    exactly should either raise ``max_epochs`` or downsample the
    abundant domains instead (``mixture_sample``).

    Pure driver arithmetic over per-domain aggregate counts (a
    ``groupBy(domain).sum(tokens)`` away at any scale) — feed the result
    to ``upsample_epochs``. Deterministic; domains missing a target
    weight default to weight 0 (one epoch, no upsampling).

    Derivation: realized tokens are e_d * n_d; forcing
    e_d * n_d ∝ w_d with min_d e_d = 1 gives
    e_d = (w_d / n_d) / min_k(w_k / n_k).
    """
    if not token_counts:
        return {}
    if min(token_counts.values()) <= 0:
        raise ValueError("token counts must be positive")
    ratios = {
        d: (float(target_weights.get(d, 0.0)) / float(n))
        for d, n in token_counts.items()
    }
    positive = [r for r in ratios.values() if r > 0]
    if not positive:
        return {d: 1.0 for d in token_counts}
    base = min(positive)
    return {
        d: 1.0 if r <= 0 else min(float(max_epochs), r / base)
        for d, r in ratios.items()
    }


def stratified_exact_split(
    df: DataFrame,
    weights: dict[str, float],
    strata_col: str,
    key_col: str = "doc_id",
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Split with EXACT per-stratum proportions: within each stratum,
    rows are ranked in content-addressed hash order (unbiased,
    reproducible — the ``hash_split`` gate's order) and cut at integer
    boundaries ``floor(cum_weight_k * n_stratum)``; the last label takes
    the remainder. Where ``hash_split`` realizes its fractions only in
    expectation (a 1% val split of a 300-row language can come back
    empty), this realizes them exactly per stratum — the shape eval-set
    construction needs. Ties cannot occur (rank is over a hash with the
    key as tiebreak), so the assignment is deterministic in any engine;
    cumulative weights accumulate in IEEE float exactly as
    ``hash_split``'s boundaries do, and the boundary product
    ``cum * n`` is one float multiply both engines round identically.

    NULL strata form their own stratum (they get exact proportions
    too). Weights must sum to 1.

    Scale: one rank window per stratum — the ``quality_prune`` tier; at
    the extreme (a stratum too large to sort) reduce with the
    percentile_approx threshold pattern over the hash itself.
    """
    from pyspark.sql.window import Window

    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    for c in ("_ses_rn", "_ses_n"):
        if c in df.columns:
            raise ValueError(f"stratified_exact_split: input already has {c!r}")
    if out_col in df.columns:
        raise ValueError(
            f"stratified_exact_split: output column {out_col!r} already exists"
        )
    w = Window.partitionBy(strata_col).orderBy(
        sample_hash(F.col(key_col), salt), F.col(key_col)
    )
    wc = Window.partitionBy(strata_col)
    staged = df.withColumn("_ses_rn", F.row_number().over(w)).withColumn(
        "_ses_n", F.count(F.lit(1)).over(wc)
    )
    expr = None
    acc = 0.0
    *head, (last_label, _) = list(weights.items())
    for label, wgt in head:
        acc += wgt
        bound = F.floor(F.col("_ses_n") * F.lit(acc)).cast("long")
        cond = F.col("_ses_rn") <= bound
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(
            cond, F.lit(label)
        )
    expr = F.lit(last_label) if expr is None else expr.otherwise(F.lit(last_label))
    return staged.withColumn(out_col, expr).drop("_ses_rn", "_ses_n")
