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

__all__ = [
    "curation_decisions",
    "curation_summary",
    "corpus_diff",
    "corpus_card",
    "corpus_card_approx",
    "changed_rows_gate",
    "maintain_corpus_churn",
    "compact_corpus_fingerprints",
    "source_overlap_matrix",
    "length_drift_psi",
    "fit_psi_baseline",
    "psi_against_baseline",
    "maintain_drift_reports",
    "curation_funnel",
    "curation_attribution",
    "maintain_funnel_counts",
    "merge_funnel_counts",
]


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
    # internal flag names are INDEX-based: gate names are arbitrary
    # report labels, and embedding them in column names breaks F.col()
    # parsing for dots/backticks
    for i, name in enumerate(sorted(bad_ids)):
        flag = f"_g_{i}"
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


def corpus_diff(
    old: DataFrame,
    *,
    new: DataFrame,
    id_col: str = "doc_id",
    fingerprint_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """(id, status) where status ∈ {added, removed, changed}: what an
    ingest actually did to the corpus between two snapshots — the
    verification artifact every incremental pipeline run owes its
    operators (a re-crawl that silently drops a domain, or rewrites
    documents it should have left alone, is invisible in row counts).
    ``changed`` means the id exists in both snapshots with different
    content fingerprints (``fingerprint_col`` if the snapshots already
    carry one, else the normalized-text md5 computed here). Unchanged
    rows — the overwhelming bulk — are never emitted.

    Snapshots must be keyed: a duplicate id in either side would fan
    out through the id-keyed full-outer join (a doc with old
    fingerprints {A} and new {A, B} would emit both nothing and a
    ``changed`` row), so duplicate ids RAISE. ``new`` is keyword-only —
    both snapshot operators here take any two same-shaped frames, and a
    silently transposed call would invert added/removed.

    Scale (100 TB): each side reduces to (id, fingerprint) at the scan
    before the one full-outer join on id — content never shuffles; the
    output is bounded by the churn, not the corpus. Diffing against a
    small reference slice broadcasts. The per-side duplicate-id check
    is one aggregate over the already-reduced (id, fingerprint) rows,
    partitioned on the same key the join shuffles on."""
    if fingerprint_col is None:
        from colnade_spark.operators.text import fingerprint

        fp = lambda d: d.select(  # noqa: E731
            F.col(id_col), fingerprint(F.col(text_col)).alias("_fp")
        )
    else:
        fp = lambda d: d.select(  # noqa: E731
            F.col(id_col), F.col(fingerprint_col).alias("_fp")
        )
    # presence is tracked by explicit markers, NOT by fingerprint
    # nullness — a NULL-text row fingerprints to NULL, and deriving
    # status from the fingerprint would misread it as absent. The
    # marker doubles as the duplicate-id guard: it lives inside an
    # expression every status decision consumes, so the optimizer
    # cannot prune it (a standalone assert column would be).
    def side(d: DataFrame, name: str) -> DataFrame:
        marker = F.when(
            F.col("_dup_n") > 1,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"corpus_diff: duplicate {id_col} in the"
                        f" {name} snapshot: "
                    ),
                    F.col(id_col).cast("string"),
                )
            ).cast("boolean"),
        ).otherwise(F.lit(True))
        return (
            fp(d)
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).alias("_dup_n"),
                F.max("_fp").alias(f"_fp_{name}"),
            )
            .select(id_col, f"_fp_{name}", marker.alias(f"_in_{name}"))
        )

    j = side(old, "old").join(side(new, "new"), id_col, "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), "added")
        .when(F.col("_in_new").isNull(), "removed")
        # null-safe: NULL->value and value->NULL are real changes;
        # NULL->NULL is unchanged
        .when(~F.col("_fp_old").eqNullSafe(F.col("_fp_new")), "changed")
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(id_col, "status")
    )


def _card_stage(
    df: DataFrame,
    group_col: str,
    size_col: str,
    quantiles: tuple[int, ...],
    op_name: str,
) -> DataFrame:
    """Shared corpus-card staging (both tiers must agree on it forever):
    validate the integer-percent quantiles, report NULL group keys under
    the literal '__null__', and REJECT NULL sizes — the guard lives
    inside the size expression itself, so the optimizer cannot prune it
    (every downstream op consumes it)."""
    if not quantiles:
        raise ValueError(f"{op_name} requires at least one quantile")
    for p in quantiles:
        if not isinstance(p, int) or not 0 < p <= 100:
            raise ValueError(f"quantile {p!r} must be an int percent in (0, 100]")
    g = F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
    size = F.when(
        F.col(size_col).isNull(),
        F.raise_error(F.lit(f"{op_name}: NULL {size_col} row")),
    ).otherwise(F.col(size_col).cast("long"))
    return df.select(g.alias("_cc_g"), size.alias("_cc_s"))


def corpus_card(
    df: DataFrame,
    group_col: str = "lang",
    size_col: str = "n_chars",
    quantiles: tuple[int, ...] = (50, 90),
) -> DataFrame:
    """Per-group corpus card: (group, n_docs, total_size, q_50, q_90,
    ...) — the one-table dataset datasheet (docs, mass, and EXACT size
    quantiles per language/domain). Quantiles are integer PERCENTS and
    the definition is pinned in pure integer arithmetic so any engine
    reproduces it bit-for-bit: q_p = the value at ascending rank
    ``ceil(p * n / 100)`` = ``(p * n + 99) div 100`` (lower empirical
    quantile, no interpolation, no float rank math — ``ceil(0.9 * n)``
    in doubles is off-by-one whenever 0.9*n lands an ulp above the
    integer).

    Scale: one per-group sort window (rank + count) + one aggregate —
    the same cost tier as any per-key ranking; groups sort
    independently. For corpora where single groups are too big to
    sort, use quality.quality_prune_threshold's percentile_approx
    pattern instead (scan-side, no window) and accept approximate
    quantiles. NULL group keys report under the literal '__null__';
    NULL sizes are rejected (their rank position is engine-dependent —
    Spark sorts NULL first, DuckDB last — which would silently corrupt
    the quantiles); fill or filter upstream."""
    from pyspark.sql.window import Window

    staged = _card_stage(df, group_col, size_col, quantiles, "corpus_card")
    w = Window.partitionBy("_cc_g").orderBy("_cc_s")
    ranked = staged.withColumn(
        "_cc_r", F.row_number().over(w).cast("long")
    ).withColumn(
        "_cc_n", F.count("*").over(Window.partitionBy("_cc_g"))
    )
    aggs = [
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_cc_s").cast("long").alias("total_size"),
    ]
    for p in quantiles:
        q = F.max(
            F.when(
                F.col("_cc_r") == F.expr(f"(_cc_n * {p} + 99) div 100"),
                F.col("_cc_s"),
            )
        )
        aggs.append(q.alias(f"q_{p}"))
    return ranked.groupBy(F.col("_cc_g").alias(group_col)).agg(*aggs)


def corpus_card_approx(
    df: DataFrame,
    group_col: str = "lang",
    size_col: str = "n_chars",
    quantiles: tuple[int, ...] = (50, 90),
    accuracy: int = 10000,
) -> DataFrame:
    """``corpus_card``'s scan-side twin for groups too large to sort:
    same output shape (group, n_docs, total_size, q_p...), but the
    quantiles come from ``percentile_approx`` (Greenwald-Khanna sketch,
    rank error ≤ n/``accuracy``) inside ONE hash aggregate — no
    per-group sort window anywhere in the plan (gated by test), so a
    single hot language/domain with billions of documents costs a
    partial-aggregating shuffle of sketch buffers instead of a full
    per-group sort. Use the exact card when groups fit the sort tier;
    this one when they don't. Same NULL policy: NULL group keys report
    under '__null__', NULL sizes raise (their quantile position would
    be engine-dependent)."""
    staged = _card_stage(df, group_col, size_col, quantiles, "corpus_card_approx")
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_cc_s").cast("long").alias("total_size"),
    ]
    for p in quantiles:
        aggs.append(
            F.percentile_approx("_cc_s", p / 100.0, accuracy).alias(f"q_{p}")
        )
    return staged.groupBy(F.col("_cc_g").alias(group_col)).agg(*aggs)


def fit_size_edges(
    df: DataFrame,
    size_col: str = "n_chars",
    id_col: str = "doc_id",
    n_edges: int = 6,
    sample_n: int = 2048,
) -> tuple[int, ...]:
    """FROZEN log-spaced bin edges for ``size_histogram``, auto-fit from
    a BOUNDED content-addressed sample — the frozen-artifact tier of the
    corpus-card family (fit once on a reference snapshot, pin in the
    maintainer manifest, bin every batch forever): hand-picked fixed
    edges go stale when the corpus's size distribution isn't known up
    front, and edges that miss the mass put every quantile in the
    unbounded top bin.

    The fit is INTEGER-EXACT and fully replayable in SQL (no RNG, no
    float spacing): the sample is the ``sample_n`` rows with the
    smallest ``md5_hash60(id)`` (content-addressed — same rows in any
    engine, any partitioning; a top-k, never a full sort, and the
    driver transfer is bounded by construction like the
    ``train_ivf_centroids`` codebook fit); ``lo = max(1, min(size))``,
    ``hi = max(size)`` over the sample; the geometric ratio is the
    SMALLEST INTEGER ``r >= 2`` with ``lo * r^(n_edges-1) >= hi`` (so
    the sampled mass spans the bins as evenly as integer ratios allow),
    and the edges are ``lo * r^k`` for ``k in [0, n_edges)`` — pure
    integer products, bit-identical across engines, valid for
    ``size_histogram``'s int-edges contract.

    NULL-``id_col`` rows are EXCLUDED from the sample before the top-k
    (mirroring ``overlap_band_keys``'s NULL text/source exclusion):
    ``md5_hash60(NULL)`` is NULL and Spark's ASC default is NULLS
    FIRST, so without the filter NULL-id rows would preferentially fill
    the sample while a SQL replay with NULLS-LAST semantics would drop
    them — a silent sample divergence. ``id_col`` is assumed UNIQUE
    among the sampled rows (the corpus-wide contract everywhere else in
    this module); duplicate ids with different sizes make the
    ``(hash, id)`` tie-break underdetermined and the replay
    engine-dependent.

    Raises on an empty/all-NULL sample, on a degenerate distribution
    (``hi <= lo``), and on a spread so wide the ratio exceeds 63
    (``hi/lo > 63^(n_edges-1)`` — bins 64x apart carry no resolution;
    raise ``n_edges`` instead). The ratio cap also pins the SQL-replay
    contract: the oracle's minimal-ratio scan enumerates r in [2, 63],
    where every ``lo * r^k`` product is integer-exact in both engines.
    Auto-fitting edges nobody can bin against should fail at fit time,
    not at the first card read."""
    from colnade_spark.operators.text import md5_hash60

    if n_edges < 2:
        raise ValueError("fit_size_edges: n_edges must be >= 2")
    if sample_n < 2:
        raise ValueError("fit_size_edges: sample_n must be >= 2")
    rows = (
        df.filter(F.col(id_col).isNotNull())
        .select(
            F.col(size_col).cast("long").alias("_fse_s"),
            md5_hash60(F.col(id_col).cast("string")).alias("_fse_h"),
            F.col(id_col).alias("_fse_id"),
        )
        .orderBy("_fse_h", "_fse_id")
        .limit(sample_n)
        .select("_fse_s")
        .collect()
    )
    sizes = [r[0] for r in rows if r[0] is not None]
    if not sizes:
        raise ValueError(
            f"fit_size_edges: no non-NULL {size_col!r} values in the sample"
        )
    lo = max(1, min(sizes))
    hi = max(sizes)
    if hi <= lo:
        raise ValueError(
            f"fit_size_edges: degenerate size distribution"
            f" (lo={lo}, hi={hi}); fixed edges are the honest choice here"
        )
    r = 2
    while lo * r ** (n_edges - 1) < hi:
        r += 1
        if r > 63:
            raise ValueError(
                f"fit_size_edges: size spread lo={lo}, hi={hi} needs a"
                f" geometric ratio > 63 at n_edges={n_edges} — the bins"
                " would carry no resolution; raise n_edges"
            )
    return tuple(lo * r**k for k in range(n_edges))


def size_histogram(
    df: DataFrame,
    group_col: str = "lang",
    size_col: str = "n_chars",
    edges: tuple[int, ...] = (100, 200, 400, 800, 1600),
) -> DataFrame:
    """The MERGEABLE half of the streaming corpus card: per-(group,
    size-bin) exact doc counts and size sums on FIXED integer edges —
    |groups|·|bins| rows of longs whatever the corpus size, and pure
    associative sums, so per-slice tables (one per micro-batch, shard,
    or source) merge by re-summing: the fertility-sums tier applied to
    the size distribution. Bins follow the PSI convention (bin i =
    number of edges <= size; right-open; bin 0 below the first edge,
    bin len(edges) at-or-above the last). Same NULL policy as the
    card tiers (shared staging): NULL group keys report under
    '__null__', NULL sizes RAISE — their bin is engine-dependent
    nonsense."""
    _psi_validate_edges(edges)
    if any(not isinstance(e, int) or isinstance(e, bool) for e in edges):
        raise ValueError(
            "size_histogram: edges must be ints (sizes are cast to long;"
            " fractional edges would bin differently across engines)"
        )
    staged = _card_stage(df, group_col, size_col, (50,), "size_histogram")
    idx = F.aggregate(
        F.array(*[F.lit(int(e)).cast("long") for e in edges]),
        F.lit(0),
        lambda acc, e: acc + F.when(F.col("_cc_s") >= e, 1).otherwise(0),
    )
    return (
        staged.select(
            F.col("_cc_g").alias(group_col),
            idx.alias("bin"),
            F.col("_cc_s"),
        )
        .groupBy(group_col, "bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("_cc_s").cast("long").alias("sum_size"),
        )
    )


def histogram_card(
    hist: DataFrame,
    edges: tuple[int, ...],
    quantiles: tuple[int, ...] = (50, 90),
    group_col: str = "lang",
) -> DataFrame:
    """Corpus card derived from a (group, bin, n, sum_size) histogram:
    (group, n_docs, total_size, q_<p>_le ...). ``n_docs``/``total_size``
    are EXACT (sums of sums); each quantile is BIN-RESOLUTION — the
    integer-rank definition pinned by ``corpus_card`` (rank
    ``(p·n + 99) div 100``) applied to the cumulative bin counts, and
    ``q_<p>_le`` reports the quantile bin's UPPER edge: the smallest
    pinned edge E such that at least p% of docs have size < E... i.e.
    "p% of documents are <= q_p_le" holds exactly, with the true exact
    quantile somewhere inside that bin (NULL when the quantile falls in
    the unbounded top bin — widen the edges if that matters). This is
    the deterministic trade for stream-legality: exact per-group
    quantiles need a sort over all history; bin counts merge.

    Shared tail of the one-pass ``corpus_card_binned`` and the
    maintained-store reader ``merge_corpus_card`` (one code path, the
    overlap-matrix rule). Cost: everything here operates on the
    bounded histogram — a |groups|·|bins| window + one aggregation."""
    from pyspark.sql.window import Window

    _psi_validate_edges(edges)
    if not quantiles:
        raise ValueError("histogram_card requires at least one quantile")
    for p in quantiles:
        if not isinstance(p, int) or not 0 < p <= 100:
            raise ValueError(
                f"quantile {p!r} must be an int percent in (0, 100]"
            )
    w = Window.partitionBy(group_col).orderBy("bin")
    wg = Window.partitionBy(group_col)
    c = hist.withColumn("_hc_cum", F.sum("n").over(w)).withColumn(
        "_hc_nd", F.sum("n").over(wg)
    )
    edge_arr = F.array(*[F.lit(int(e)).cast("long") for e in edges])
    aggs = [
        F.max("_hc_nd").cast("long").alias("n_docs"),
        F.sum("sum_size").cast("long").alias("total_size"),
    ]
    for p in quantiles:
        qb = F.min(
            F.when(
                F.col("_hc_cum")
                >= F.expr(f"(_hc_nd * {int(p)} + 99) div 100"),
                F.col("bin"),
            )
        )
        # upper edge of the quantile bin; the top bin (== len(edges))
        # indexes past the array -> NULL (F.get is OOB-safe)
        aggs.append(F.get(edge_arr, qb.cast("int")).alias(f"q_{p}_le"))
    return c.groupBy(group_col).agg(*aggs)


def corpus_card_binned(
    df: DataFrame,
    group_col: str = "lang",
    size_col: str = "n_chars",
    edges: tuple[int, ...] = (100, 200, 400, 800, 1600),
    quantiles: tuple[int, ...] = (50, 90),
) -> DataFrame:
    """One-pass binned corpus card — ``size_histogram`` composed with
    ``histogram_card``: exact doc counts and size mass, bin-resolution
    quantile bounds, no per-group sort anywhere (the scan aggregates
    |groups|·|bins| longs). The batch twin of the maintained card
    (``maintain_corpus_card``/``merge_corpus_card``), equal by
    construction since both run the same tail over the same mergeable
    histogram (pinned by test). Use ``corpus_card`` when exact
    quantiles matter and groups fit the sort tier;
    ``corpus_card_approx`` for sketch quantiles in one aggregation;
    this one when the card must also be maintainable on a stream."""
    return histogram_card(
        size_histogram(df, group_col, size_col, edges),
        edges,
        quantiles,
        group_col,
    )


def maintain_corpus_card(
    stream: DataFrame,
    table_path: str,
    checkpoint: str,
    group_col: str = "lang",
    size_col: str = "n_chars",
    edges: tuple[int, ...] = (100, 200, 400, 800, 1600),
    available_now: bool = True,
):
    """STREAMING maintenance of the corpus-card histogram: each
    micro-batch aggregates its own ``size_histogram`` (|groups|·|bins|
    rows of longs) and OVERWRITES its ``batch_id=<n>`` partition — the
    fertility-sums maintainer pattern: idempotent under redelivery,
    associative sums, merged table ≡ one batch pass over everything
    ever streamed. Read with ``merge_corpus_card``. The manifest pins
    (group_col, size_col, edges): counts binned on different edges are
    not comparable — fail fast on a drifted resume."""
    from colnade_spark.streaming.stream import (
        maintain_partitioned_table,
        write_table_manifest,
    )

    write_table_manifest(
        stream.sparkSession,
        table_path,
        {
            "kind": "size_histogram",
            "group_col": group_col,
            "size_col": size_col,
            "edges": [int(e) for e in edges],
        },
    )
    return maintain_partitioned_table(
        stream,
        lambda b: size_histogram(b, group_col, size_col, edges),
        table_path,
        checkpoint,
        available_now,
    )


def merge_corpus_card(
    spark, table_path: str, quantiles: tuple[int, ...] = (50, 90)
) -> DataFrame:
    """Manifest-validating reader for a ``maintain_corpus_card`` store:
    validate the kind, recover (group_col, edges) FROM THE MANIFEST,
    re-sum the bin history per (group, bin) (associative — merge ≡ one
    ``corpus_card_binned`` pass over everything streamed, pinned), and
    derive the card through the shared ``histogram_card`` tail. A
    registered-but-no-batch store yields a valid EMPTY card rather
    than a raw read error (the merge_fertility_store shape; group
    label pinned string — the shared staging reports groups as
    strings always, so nothing is lost here)."""
    from colnade_spark.streaming.stream import (
        read_batched_history,
        read_table_manifest,
    )

    mf = read_table_manifest(spark, table_path)
    if mf is None or mf.get("kind") != "size_histogram":
        raise ValueError(
            f"no size_histogram manifest at {table_path}; was this table"
            " written by maintain_corpus_card?"
        )
    group_col = mf["group_col"]
    edges = tuple(int(e) for e in mf["edges"])
    hist = read_batched_history(spark, table_path)
    if hist is None:
        hist = spark.createDataFrame(
            [], f"{group_col} string, bin int, n long, sum_size long"
        )
    merged = hist.groupBy(group_col, "bin").agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("sum_size").cast("long").alias("sum_size"),
    )
    return histogram_card(merged, edges, quantiles, group_col)


def maintain_corpus_churn(
    stream: DataFrame,
    table_path: str,
    churn_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    fingerprint_col: str | None = None,
    text_col: str = "text",
    status_col: str = "status",
    available_now: bool = True,
):
    """STREAMING corpus_diff: gate each micro-batch against a MAINTAINED
    fingerprint table and emit the churn (added/changed full rows), so a
    continuously-ingesting pipeline gets the per-batch diff artifact
    without ever holding two full snapshots — the streaming half of
    ``corpus_diff`` (batch x batch) and ``changed_rows_gate`` (stream x
    frozen snapshot).

    Per micro-batch (foreachBatch — the gate's join is stream-batch
    illegal as a pure streaming plan because the old side grows):
    1. resolve the CURRENT fingerprint per id from the table's
       ``batch_id=<n>`` partitions STRICTLY BELOW this batch id
       (max_by fp over batch_id — so a redelivered batch replays against
       exactly the state it originally saw);
    2. validate and append the batch's (id, fingerprint) pairs to
       ``table_path/batch_id=<n>`` (overwrite) — fps are written FIRST
       so a batch that fails validation never publishes churn rows;
    3. ``changed_rows_gate`` the batch against the step-1 state → full
       added/changed rows, written to ``churn_path/batch_id=<n>``
       (overwrite). The gate only ever reads strictly-earlier
       partitions, so the step-2 write cannot feed back into it.
    Both writes overwrite their own batch partition, so redelivery is
    idempotent end-to-end. An id carrying >1 DISTINCT fingerprint within
    one batch RAISES (same keyed-snapshot discipline as corpus_diff —
    which row is 'current' would be nondeterministic); a NULL and a
    non-NULL fingerprint for one id is a conflict too (the gate's own
    change rule is null-safe, so NULL is a real content state). The
    fingerprint table collapses repeated identical rows; the CHURN
    artifact does not — each incoming row gates independently (same
    policy as changed_rows_gate), so upstream duplicates surface
    downstream. A params manifest beside the table errors a resumed
    run whose id/fingerprint configuration drifted.

    Scale (100 TB): the table holds ids+fingerprints only; per batch, the
    old side reduces to one (id)-keyed aggregate over those pairs and the
    join shuffles ids+fps against the batch — payloads never leave the
    batch. The per-batch table scan grows with ingest history; compact
    periodically (rewrite max_by-resolved pairs as a fresh epoch) the
    same way the sketch tables compact."""
    from colnade_spark.streaming.stream import (
        read_batched_history,
        write_table_manifest,
    )

    fp_src = "fingerprint(text)" if fingerprint_col is None else fingerprint_col
    # start-time guard over EVERY name any batch path writes or stages —
    # including changed_rows_gate's internals and status_col, so a clash
    # fails here instead of mid-stream after batch 0 already committed a
    # clobbered churn partition (the first-batch path bypasses the gate
    # and with it the gate's own validation)
    clash = sorted(
        {
            "_mcc_fp",
            "batch_id",
            status_col,
            "_crg_fp",
            "_crg_in_old",
            "_crg_new_fp",
        }
        & set(stream.columns)
    )
    if clash:
        raise ValueError(
            f"columns {clash} collide with maintain_corpus_churn's"
            " staging/status/partition names; rename them upstream or"
            " pass a different status_col"
        )
    write_table_manifest(
        stream.sparkSession,
        table_path,
        {
            "kind": "corpus_fingerprints",
            "id_col": id_col,
            "fingerprint": fp_src,
            "text_col": None if fingerprint_col is not None else text_col,
        },
    )
    if fingerprint_col is None:
        from colnade_spark.operators.text import fingerprint

        fp_expr = fingerprint(F.col(text_col))
    else:
        fp_expr = F.col(fingerprint_col)

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        staged = batch_df.withColumn("_mcc_fp", fp_expr)
        # one aggregate: collapse repeats, RAISE on conflicting
        # fingerprints for one id (marker folded into the fp expression
        # so the optimizer cannot prune it). NULL counts as a distinct
        # content state: count_distinct ignores NULLs, so the conflict
        # count adds 1 when the id also has a NULL fp — a (NULL, 'x')
        # pair is exactly the nondeterministic-'current' case, and the
        # gate's own change rule is null-safe about it.
        batch_fps = (
            staged.groupBy(F.col(id_col))
            .agg(
                (
                    F.count_distinct(F.col("_mcc_fp"))
                    + F.max(F.col("_mcc_fp").isNull().cast("int"))
                ).alias("_n"),
                F.max("_mcc_fp").alias("_fp"),
            )
            .select(
                F.col(id_col),
                F.when(
                    F.col("_n") > 1,
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "maintain_corpus_churn: conflicting"
                                f" fingerprints for one {id_col} within a"
                                " batch: "
                            ),
                            F.col(id_col).cast("string"),
                        )
                    ),
                )
                .otherwise(F.col("_fp"))
                .alias("_mcc_fp"),
            )
        )
        # explicit first-batch probe (shared helper): a store with no
        # batch_id partitions is first-batch; any real read failure
        # raises instead of silently labeling the whole batch "added"
        hist = read_batched_history(spark, table_path)
        if hist is not None:
            latest = (
                hist.filter(F.col("batch_id") < F.lit(batch_id))
                .groupBy(F.col(id_col))
                .agg(F.max_by("_mcc_fp", "batch_id").alias("_mcc_fp"))
            )
            churn = changed_rows_gate(
                staged,
                old=latest,
                id_col=id_col,
                fingerprint_col="_mcc_fp",
                status_col=status_col,
            ).drop("_mcc_fp")
        else:
            churn = staged.drop("_mcc_fp").withColumn(
                status_col, F.lit("added")
            )
        # fps FIRST: this write evaluates the conflict marker, so a batch
        # that can never commit also never publishes a churn partition
        # for consumers to read. The gate above only reads partitions
        # with batch_id strictly below this one, so the write cannot
        # feed back into the churn computation (or a redelivery of it).
        batch_fps.write.mode("overwrite").parquet(
            f"{table_path}/batch_id={batch_id}"
        )
        churn.write.mode("overwrite").parquet(f"{churn_path}/batch_id={batch_id}")

    w = stream.writeStream.foreachBatch(_gate).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def compact_corpus_fingerprints(
    spark, table_path: str, dest_path: str
) -> dict:
    """Compact a ``maintain_corpus_churn`` fingerprint table: resolve the
    latest fingerprint per id across every batch partition EXCEPT the
    trailing one into a single epoch partition, carry the trailing
    partition over verbatim, and write both plus the verbatim params
    manifest to ``dest_path``. Like ``io.compact_parquet``, the swap is
    the caller's move (rename while the maintainer is quiesced) —
    compaction never overwrites its own input, and ``dest_path`` must
    not already exist (a reused dest could smuggle a stale older epoch
    partition into the swapped table).

    Why the trailing partition is never folded: the maintainer writes
    a batch's partitions BEFORE the checkpoint commits, so after a crash
    the on-disk max batch id may belong to an UNCOMMITTED batch that the
    restarted stream will redeliver. Folding it into the epoch would
    label the epoch with that id — the redelivered batch (filtering
    ``batch_id < id``) would then see NO state and its own overwrite
    would erase the entire compacted history. Batches below the max are
    always committed (streaming is sequential: batch N starts only after
    N-1 commits), so epoch = second-max id is safe WITHOUT any
    unverifiable "checkpoint has committed" precondition; a redelivery
    of the carried batch replays against exactly the compacted state.

    Why at all: the maintainer appends one (ids+fps) partition per
    micro-batch; after N batches every gate scans N partitions and
    re-resolves ids that churned many times. Compaction collapses the
    history to one pre-resolved partition.

    Returns {"rows", "epoch", "carried_batch", "source_batches"}."""
    from colnade_spark.streaming.stream import compact_batched_table

    def _resolve(body, mf):
        return body.groupBy(F.col(mf["id_col"])).agg(
            F.max_by("_mcc_fp", "batch_id").alias("_mcc_fp")
        )

    return compact_batched_table(
        spark, table_path, dest_path, "corpus_fingerprints", _resolve
    )


def changed_rows_gate(
    new: DataFrame,
    *,
    old: DataFrame,
    id_col: str = "doc_id",
    fingerprint_col: str | None = None,
    text_col: str = "text",
    status_col: str = "status",
) -> DataFrame:
    """The rows of ``new`` worth processing against a known snapshot:
    full rows whose id is absent from ``old`` (``added``) or whose
    content fingerprint differs (``changed``); unchanged rows drop.
    This is ``corpus_diff``'s INGEST-side half — the filter an
    incremental pipeline puts in front of expensive downstream ops so
    re-crawled-but-identical documents don't re-tokenize, re-embed, or
    re-shard. (Removal detection needs both full snapshots — that's
    ``corpus_diff``.)

    Works on a STREAMING ``new`` unchanged: ``old`` reduces to an
    (id, fingerprint) static side and the stream-static left join is
    append-mode legal (pinned by the streaming test) — each micro-batch
    gates against the frozen snapshot with no streaming state.

    ``old`` is keyword-only (``corpus_diff`` reads (old, new=...);
    this gate's primary input is the incoming frame — a positional
    second snapshot could be silently transposed between the two).
    Duplicate ids in ``old`` RAISE: a new row matching two old rows
    would duplicate its payload through the left join. Duplicate ids
    in ``new`` are fine — each incoming row gates independently.

    Scale (100 TB): the old side is ids+fingerprints only (broadcast
    when the reference slice is small; a key-partitioned shuffle
    otherwise); new rows carry their payload once, and only churn
    survives the gate."""
    if status_col in new.columns:
        raise ValueError(
            f"status_col {status_col!r} already exists in the new"
            " snapshot; pass a different status_col (withColumn would"
            " clobber the payload and the output would carry two"
            " identically named columns)"
        )
    clash = sorted({"_crg_fp", "_crg_in_old", "_crg_new_fp"} & set(new.columns))
    if clash:
        raise ValueError(
            f"columns {clash} in the incoming frame collide with"
            " changed_rows_gate's internal staging names; rename them"
            " upstream (withColumn would silently clobber the payload)"
        )
    if fingerprint_col is None:
        from colnade_spark.operators.text import fingerprint

        new_fp = fingerprint(F.col(text_col))
        old_fp = old.select(
            F.col(id_col), fingerprint(F.col(text_col)).alias("_crg_fp")
        )
    else:
        new_fp = F.col(fingerprint_col)
        old_fp = old.select(
            F.col(id_col), F.col(fingerprint_col).alias("_crg_fp")
        )
    # one aggregate over the ids+fingerprints side: the presence marker
    # doubles as a duplicate-id guard (consumed by every status
    # decision, so it cannot be pruned), exactly as in corpus_diff
    old_fp = (
        old_fp.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("_dup_n"),
            F.max("_crg_fp").alias("_crg_fp"),
        )
        .select(
            id_col,
            "_crg_fp",
            F.when(
                F.col("_dup_n") > 1,
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"changed_rows_gate: duplicate {id_col} in"
                            " the old snapshot: "
                        ),
                        F.col(id_col).cast("string"),
                    )
                ).cast("boolean"),
            )
            .otherwise(F.lit(True))
            .alias("_crg_in_old"),
        )
    )
    staged = new.withColumn("_crg_new_fp", new_fp).join(
        old_fp, id_col, "left"
    )
    status = F.when(F.col("_crg_in_old").isNull(), "added").when(
        ~F.col("_crg_new_fp").eqNullSafe(F.col("_crg_fp")), "changed"
    )
    return (
        staged.withColumn(status_col, status)
        .filter(F.col(status_col).isNotNull())
        .select(*new.columns, status_col)
    )


def source_overlap_matrix(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    key_col: str | None = None,
) -> DataFrame:
    """Cross-source duplication matrix: for every unordered source pair,
    how many distinct normalized-text fingerprints appear in BOTH — the
    "how much of crawl X is already in dataset Y" datasheet every
    multi-source corpus owes its users (mixture weights double-count
    mass that two sources share). One row per pair with each side's
    distinct-fingerprint total, the shared count, and their Jaccard
    (ONE IEEE division of exact counts — bit-reproducible anywhere).
    Only pairs that share at least one fingerprint are emitted;
    ``source_a < source_b`` lexicographically, so each pair appears
    once. NULL fingerprints (NULL text) and NULL sources are excluded —
    NULLs are not a cluster and not a source.

    ``key_col`` swaps the exact fingerprint for ANY precomputed overlap
    key: MinHash band hashes give a NEAR-dup overlap matrix (counts =
    shared candidate buckets), a normalized URL column gives URL-level
    overlap — same plan, same guarantees, no new machinery.

    Scale shape (100 TB): the join is keyed on the 16-byte digest and
    carries (digest, source) pairs only — payloads never shuffle. The
    per-fingerprint fanout is |sources sharing that digest| squared;
    sources are corpus-level labels (dozens, not millions), so the
    blowup is bounded by the label vocabulary, and a digest shared by
    ALL sources produces |sources| choose 2 rows, not |docs| squared.
    The totals table is |sources| rows and broadcasts. The distinct-ed
    (digest, source) table is referenced three times (self-join sides +
    totals) but its exchange subtree is identical in all three, so
    Spark's exchange reuse materializes the fingerprint scan ONCE at
    runtime (verified: the adaptive plan shows ReusedExchange for both
    extra references).
    """
    s = overlap_fingerprints(df, group_col, text_col, key_col)
    return _overlap_matrix_from_pairs(s)


def overlap_fingerprints(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    key_col: str | None = None,
) -> DataFrame:
    """The MERGEABLE half of the cross-source overlap matrix: a
    snapshot's DISTINCT (source, fingerprint) pairs, as the two-column
    frame (``_so_src``, ``_so_fp``). Distinct pairs merge by
    distinct-union (set union is associative and idempotent), so
    per-slice pair tables — one per micro-batch, shard, or ingest day —
    recombine into exactly the matrix a single pass would produce
    (pinned by test); this is the model ``maintain_source_overlap``
    persists. NULL fingerprints (NULL text) and NULL sources are
    excluded here, once, for every consumer — NULLs are not a source
    and not a cluster. Cost: one scan-side fingerprint projection into
    one distinct on (label, 32-char digest) — payloads never shuffle."""
    from colnade_spark.operators.text import fingerprint

    key = F.col(key_col) if key_col else fingerprint(F.col(text_col))
    return (
        df.select(
            F.col(group_col).alias("_so_src"),
            key.alias("_so_fp"),
        )
        .filter(F.col("_so_fp").isNotNull() & F.col("_so_src").isNotNull())
        .distinct()
    )


def _overlap_matrix_from_pairs(s: DataFrame) -> DataFrame:
    """The matrix tail over a DISTINCT (``_so_src``, ``_so_fp``) pair
    frame — shared verbatim by the one-pass ``source_overlap_matrix``
    and the maintained-store reader ``merge_overlap_store`` (the two
    paths must stay one code path: a drifted reimplementation would
    un-pin their equivalence). The tail references ``s`` four times
    (two totals broadcasts + both join sides): producers whose pair
    frame is expensive to recompute materialize it first
    (``overlap_band_keys``' lazy localCheckpoint); the exact tier's
    md5 projection re-runs cheaply by design."""
    totals = s.groupBy("_so_src").agg(F.count(F.lit(1)).alias("_so_n"))
    a = s.select(F.col("_so_src").alias("source_a"), "_so_fp")
    b = s.select(F.col("_so_src").alias("source_b"), "_so_fp")
    shared = (
        a.join(b, "_so_fp")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    out = (
        shared.join(
            F.broadcast(totals.withColumnRenamed("_so_src", "source_a")),
            "source_a",
        )
        .withColumnRenamed("_so_n", "n_fps_a")
        .join(
            F.broadcast(totals.withColumnRenamed("_so_src", "source_b")),
            "source_b",
        )
        .withColumnRenamed("_so_n", "n_fps_b")
    )
    jac = F.col("n_shared").cast("double") / (
        F.col("n_fps_a") + F.col("n_fps_b") - F.col("n_shared")
    ).cast("double")
    return out.select(
        "source_a",
        "source_b",
        F.col("n_fps_a").cast("long").alias("n_fps_a"),
        F.col("n_fps_b").cast("long").alias("n_fps_b"),
        "n_shared",
        jac.alias("jaccard"),
    )


def overlap_band_keys(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    num_hashes: int = 96,
    bands: int = 16,
    shingle_k: int = 13,
    seed: int = 42,
) -> DataFrame:
    """The MERGEABLE half of the NEAR-dup cross-source overlap matrix:
    a snapshot's DISTINCT (source, MinHash-LSH band key) pairs as the
    (``_so_src``, ``_so_fp``) frame — ``overlap_fingerprints`` with the
    exact content fingerprint swapped for the dedup pipeline's banded
    sketch (``dedup.minhash_signatures`` + the ``minhash_candidate_pairs``
    band hashing), so two sources overlap on a key exactly when they
    hold documents the near-dedup banding would pair: boilerplate
    variants, templated rewrites, near-copies — not just byte-identical
    normalized text. Distinct pairs still merge by set union
    (associative, idempotent), so the maintained/merged/compacted
    machinery is shared with the exact tier.

    Defaults are the PRODUCTION dedup sizing (num_hashes=96 /
    shingle_k=13 — the k=5 fixture shingles saturate: background
    Jaccard ~0.14 makes unrelated sources share band keys). Band keys
    are ``band_index:xxhash64(band slice)`` — 8-byte-hash discipline
    through the distinct/shuffle, injective up to ~2^-64 like the dedup
    banding itself. NULL text and NULL sources are excluded (not a
    source, not content); sub-shingle-length docs share the EMPTY
    shingle set's signature — trivially identical content, same
    semantics as ``dedup_minhash`` — so all-boilerplate-short sources
    read as overlapping, which they are.

    Scale: one scan-side signature projection (vectorized UDF), one
    explode to ``bands`` (id-free!) key rows, one distinct on (label,
    ~20-char key). Raw text never shuffles; doc ids never even leave
    the scan. Consumers that reference the result more than once must
    materialize it themselves (``source_overlap_near`` lazily
    localCheckpoints — see there); the maintainer writes it exactly
    once per batch, so this producer stays checkpoint-free."""
    from colnade_spark.operators.dedup import minhash_signatures

    if num_hashes < 1 or bands < 1 or num_hashes % bands:
        raise ValueError(
            "overlap_band_keys: num_hashes must be a positive multiple"
            " of bands"
        )
    rows_per = num_hashes // bands
    sigs = minhash_signatures(
        df.filter(
            F.col(text_col).isNotNull() & F.col(group_col).isNotNull()
        ),
        text_col=text_col,
        num_hashes=num_hashes,
        shingle_k=shingle_k,
        seed=seed,
    )
    # the band-key array is parsed from ONE SQL expression: the
    # element-wise F.concat_ws/F.xxhash64/F.slice form costs one py4j
    # round-trip per sub-expression × bands (measured ~1 s of driver
    # time per build at bands=16); the parsed tree is the identical
    # expression, so values and plans are unchanged (the litutil lesson
    # applied to expression trees)
    band_exprs = ",".join(
        f"concat_ws(':', '{bi}', cast(xxhash64(cast("
        f"slice(_sig, {bi * rows_per + 1}, {rows_per}) as string)"
        f") as string))"
        for bi in range(bands)
    )
    return (
        sigs.select(
            F.col(group_col).alias("_so_src"),
            F.explode(F.expr(f"array({band_exprs})")).alias("_so_fp"),
        )
        .distinct()
    )


def source_overlap_near(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    num_hashes: int = 96,
    bands: int = 16,
    shingle_k: int = 13,
    seed: int = 42,
) -> DataFrame:
    """NEAR-dup cross-source overlap matrix (source_a < source_b,
    n_fps_a/n_fps_b = distinct band keys per source, n_shared, jaccard)
    — ``source_overlap_matrix`` with band keys instead of exact
    fingerprints: the answer to "how much of source B is a near-copy of
    source A" rather than "how much is byte-identical after
    normalization". Shares the exact tier's matrix tail verbatim
    (``_overlap_matrix_from_pairs`` — one code path, the maintained
    twin cannot drift). Read jaccard as banded-content overlap: a
    document cluster contributes its ``bands`` keys to every source
    holding a member.

    The pair set is lazily ``localCheckpoint``-ed HERE (the cooccur/
    dedup materialization pattern) because the matrix tail references
    it four times (two totals broadcasts + both join sides) and a
    repartition barrier cannot dedupe them — at broadcastable sizes
    AQE plants BroadcastExchange variants that cannot reuse a shuffle
    — so without it the corpus-wide signature UDF would re-run per
    consumer. Only the bounded distinct pair set (labels + ~20-char
    keys) lands on executor storage, once (plan-gated). The streaming
    maintainer deliberately does NOT go through this function: it
    consumes the pair frame exactly once per batch and needs no
    checkpoint."""
    return _overlap_matrix_from_pairs(
        overlap_band_keys(
            df, group_col, text_col, num_hashes, bands, shingle_k, seed
        ).localCheckpoint(eager=False)
    )


def maintain_source_overlap_near(
    stream: DataFrame,
    table_path: str,
    checkpoint: str,
    group_col: str = "source",
    text_col: str = "text",
    num_hashes: int = 96,
    bands: int = 16,
    shingle_k: int = 13,
    seed: int = 42,
    available_now: bool = True,
):
    """STREAMING maintenance of the NEAR-dup overlap matrix: per
    micro-batch, persist the batch's distinct (source, band key) pairs
    (``overlap_band_keys``) into its ``batch_id=<n>`` partition — the
    ``maintain_source_overlap`` pattern over the banded sketch; merged
    store ≡ one ``source_overlap_near`` pass over everything ever
    streamed (pinned by test). Read with ``merge_overlap_near_store``;
    compact with ``compact_overlap_near_table``. The manifest pins the
    FULL sketch parameterization (group/text cols, num_hashes, bands,
    shingle_k, seed): band keys from different sketches collide only by
    accident — a resumed run with a drifted sketch refuses at the
    manifest, never silently mixes keys."""
    from colnade_spark.streaming.stream import (
        maintain_partitioned_table,
        write_table_manifest,
    )

    write_table_manifest(
        stream.sparkSession,
        table_path,
        {
            "kind": "overlap_band_keys",
            "group_col": group_col,
            "text_col": text_col,
            "num_hashes": num_hashes,
            "bands": bands,
            "shingle_k": shingle_k,
            "seed": seed,
        },
    )
    return maintain_partitioned_table(
        stream,
        lambda b: overlap_band_keys(
            b, group_col, text_col, num_hashes, bands, shingle_k, seed
        ),
        table_path,
        checkpoint,
        available_now,
    )


def _merge_overlap_kind(spark, table_path: str, kind: str, maintainer: str):
    """Shared manifest-validating merge for BOTH overlap-store tiers
    (exact fingerprints and band keys): validate the kind (a path never
    written by the right maintainer fails loudly, not with a
    missing-column error), DISTINCT the (``_so_src``, ``_so_fp``) pair
    history across batches (set union is idempotent), and emit the
    matrix through the shared tail. A registered-but-no-batch store
    yields a valid EMPTY matrix (source label pinned string — the
    shared staging reports labels as strings). One code path: a fix to
    either tier's reader IS a fix to the other."""
    from colnade_spark.streaming.stream import (
        read_batched_history,
        read_table_manifest,
    )

    mf = read_table_manifest(spark, table_path)
    if mf is None or mf.get("kind") != kind:
        raise ValueError(
            f"no {kind} manifest at {table_path}; was this table"
            f" written by {maintainer}?"
        )
    hist = read_batched_history(spark, table_path)
    if hist is None:
        hist = spark.createDataFrame([], "_so_src string, _so_fp string")
    return _overlap_matrix_from_pairs(
        hist.select("_so_src", "_so_fp").distinct()
    )


def _compact_overlap_kind(
    spark, table_path: str, dest_path: str, kind: str
) -> dict:
    """Shared compaction for both overlap-store tiers: fold all but the
    trailing batch partition into one DISTINCT epoch partition (see
    ``streaming.compact_batched_table`` for the crash-safety
    argument)."""
    from colnade_spark.streaming.stream import compact_batched_table

    def _resolve(body, mf):
        return body.drop("batch_id").distinct()

    return compact_batched_table(spark, table_path, dest_path, kind, _resolve)


def merge_overlap_near_store(spark, table_path: str) -> DataFrame:
    """Manifest-validating reader for a ``maintain_source_overlap_near``
    store — the shared overlap merge over kind ``overlap_band_keys``."""
    return _merge_overlap_kind(
        spark, table_path, "overlap_band_keys", "maintain_source_overlap_near"
    )


def compact_overlap_near_table(spark, table_path: str, dest_path: str) -> dict:
    """``compact_overlap_table`` for the banded tier (shared helper)."""
    return _compact_overlap_kind(
        spark, table_path, dest_path, "overlap_band_keys"
    )


def maintain_source_overlap(
    stream: DataFrame,
    table_path: str,
    checkpoint: str,
    group_col: str = "source",
    text_col: str = "text",
    key_col: str | None = None,
    available_now: bool = True,
):
    """STREAMING maintenance of the cross-source overlap matrix: each
    micro-batch persists its own DISTINCT (source, fingerprint) pairs
    (``overlap_fingerprints``) into its ``batch_id=<n>`` partition —
    the mergeable-model maintainer pattern (fertility/HLL tier):
    idempotent under redelivery, and since distinct pairs merge by
    set union the merged store equals one ``source_overlap_matrix``
    pass over everything ever streamed (pinned by test). Read with
    ``merge_overlap_store``; compact with ``compact_overlap_table``.

    Unlike the sums maintainers the per-batch state is NOT
    |groups|-bounded — it grows with the batch's distinct content —
    but each row is (label, 32-char digest): the raw text never lands
    in the store, re-streamed duplicates collapse inside their batch,
    and compaction collapses them across batches. The params manifest
    pins (group_col, text_col, key_col): pairs keyed on different
    columns are not comparable — fail fast on a drifted resume."""
    from colnade_spark.streaming.stream import (
        maintain_partitioned_table,
        write_table_manifest,
    )

    write_table_manifest(
        stream.sparkSession,
        table_path,
        {
            "kind": "overlap_fps",
            "group_col": group_col,
            "text_col": text_col,
            "key_col": key_col,
        },
    )
    return maintain_partitioned_table(
        stream,
        lambda b: overlap_fingerprints(b, group_col, text_col, key_col),
        table_path,
        checkpoint,
        available_now,
    )


def merge_overlap_store(spark, table_path: str) -> DataFrame:
    """Manifest-validating reader for a ``maintain_source_overlap``
    store: validate the manifest ``kind`` (a path never written by the
    maintainer fails loudly, not with a missing-column error), DISTINCT
    the pair history across batches (a fingerprint re-streamed in ten
    batches is still one pair — set union is idempotent), and emit the
    same matrix ``source_overlap_matrix`` computes in one pass
    (equivalence pinned by test; the tail is literally the same code
    path). A registered-but-no-batch store (manifest only) yields a
    valid EMPTY matrix rather than a raw read error
    (``merge_fertility_store`` shape; the empty frame pins the source
    label as string — the maintainer's overwhelmingly common case —
    since an empty store carries no dtype to recover)."""
    return _merge_overlap_kind(
        spark, table_path, "overlap_fps", "maintain_source_overlap"
    )


def compact_overlap_table(spark, table_path: str, dest_path: str) -> dict:
    """Compact a ``maintain_source_overlap`` history: fold every batch
    partition EXCEPT the trailing one into a single epoch partition —
    DISTINCT-ed back to one row per (source, fingerprint) pair (set
    union is idempotent, so the fold changes nothing the reader can
    observe) — carry the trailing partition verbatim, and write both
    plus the manifest to a FRESH ``dest_path``. Shares
    ``streaming.compact_batched_table``'s skeleton; see it for why the
    trailing partition is never folded. This is the knob that bounds
    the store: after compaction the epoch partition holds the deduped
    pair set, not |batches| copies of recurring boilerplate."""
    return _compact_overlap_kind(spark, table_path, dest_path, "overlap_fps")


def length_drift_psi(
    old: DataFrame,
    *,
    new: DataFrame,
    value_col: str = "n_chars",
    edges: tuple[int, ...] = (100, 200, 400, 800, 1600),
    group_col: str | None = None,
) -> DataFrame:
    """Population-stability-index drift report between two corpus
    snapshots over a numeric metric column (doc length, token count,
    a blend score): bin both snapshots on the same literal edges, add-1 smooth,
    and emit one row per (group,) bin with both counts, both smoothed
    fractions, and the bin's PSI contribution
    ``(p_new - p_old) * ln(p_new / p_old)`` rounded to 6 places (the
    cross-engine float convention). Sum ``psi_term`` for the scalar PSI;
    the usual reading: <0.1 stable, 0.1-0.25 drifting, >0.25 shifted.
    Snapshot arguments are keyword-only (the corpus_diff discipline —
    transposing old/new silently flips every sign).

    Rows with a NULL metric are counted in a dedicated NULL bin (drift
    TO null-ness is drift). Bins are right-open: bin i holds
    ``edges[i-1] <= x < edges[i]``, bin 0 everything below, bin
    ``len(edges)`` everything at or above the last edge.

    Scale: two scan-side bin projections into map-side-combined counts
    (shuffle carries |groups|·|bins| rows of longs), one bin-keyed join
    of the two bounded count tables. Exact integer counts; each
    fraction is one IEEE division, so the report replays bit-exactly.
    """
    _psi_validate_edges(edges)
    n_bins = len(edges) + 2  # below/between/above ... plus the NULL bin
    co = _psi_counts(old, value_col, edges, group_col, "n_old")
    cn = _psi_counts(new, value_col, edges, group_col, "n_new")
    return _psi_report(co, cn, group_col, n_bins)


def _psi_validate_edges(edges) -> None:
    import numbers

    if not edges or list(edges) != sorted(set(edges)):
        raise ValueError("edges must be strictly increasing and non-empty")
    if not all(isinstance(e, numbers.Real) and not isinstance(e, bool)
               for e in edges):
        raise ValueError("edges must be numeric")


def _psi_counts(d, value_col, edges, group_col, out) -> DataFrame:
    """Exact (group?, bin, count) table of one snapshot — the shared
    binning of the two-frame report, the frozen baseline, and the
    per-batch scorer (all three MUST bin identically forever)."""
    n_bins = len(edges) + 2

    def _bin(c):
        # number of edges <= x, computed over a literal edge array (the
        # edge literals keep their Python type — float edges bin float
        # metrics like blend scores); the NULL bin is the last index
        idx = F.aggregate(
            F.array(*[F.lit(e).cast("double") for e in edges]),
            F.lit(0),
            lambda acc, e: acc + F.when(c >= e, 1).otherwise(0),
        )
        return F.when(c.isNull(), F.lit(n_bins - 1)).otherwise(idx)

    keys = ([group_col] if group_col else []) + ["bin"]
    return (
        d.select(
            *([group_col] if group_col else []),
            _bin(F.col(value_col)).alias("bin"),
        )
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).cast("long").alias(out))
    )


def _psi_report(co, cn, group_col, n_bins) -> DataFrame:
    """The smoothing/ln tail over two (group?, bin, count) tables.

    null-SAFE key equality: a NULL group is a real stratum (drift in
    unlabeled rows is drift); a plain name-list join would mismatch the
    two sides' NULL groups into disjoint half-rows with wrong totals.
    Frames are alias-qualified — both snapshots often derive from the
    same scan, and unqualified column refs are ambiguous on self-joins."""
    keys = ([group_col] if group_col else []) + ["bin"]
    co = co.alias("_psi_o")
    cn = cn.alias("_psi_n")
    cond = None
    for k in keys:
        c = F.col(f"_psi_o.{k}").eqNullSafe(F.col(f"_psi_n.{k}"))
        cond = c if cond is None else cond & c
    j = co.join(cn, cond, "full").select(
        *[
            F.coalesce(F.col(f"_psi_o.{k}"), F.col(f"_psi_n.{k}")).alias(k)
            for k in keys
        ],
        F.coalesce("n_old", F.lit(0)).cast("long").alias("n_old"),
        F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
    )
    # totals per group (or global): bounded-size window over the counts
    from pyspark.sql.window import Window

    w = Window.partitionBy(*([group_col] if group_col else [F.lit(1)]))
    j = j.withColumn("_t_old", F.sum("n_old").over(w)).withColumn(
        "_t_new", F.sum("n_new").over(w)
    )
    p_old = (F.col("n_old") + 1).cast("double") / (
        F.col("_t_old") + n_bins
    ).cast("double")
    p_new = (F.col("n_new") + 1).cast("double") / (
        F.col("_t_new") + n_bins
    ).cast("double")
    term = F.round((p_new - p_old) * F.log(p_new / p_old), 6)
    return j.select(
        *keys,
        "n_old",
        "n_new",
        p_old.alias("p_old"),
        p_new.alias("p_new"),
        term.alias("psi_term"),
    )


def curation_attribution(
    df: DataFrame,
    stages: dict[str, DataFrame],
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, ``stage_idx``): each document's FIRST-fired gate index in
    ``stages`` order — ``len(stages)`` for survivors. The per-document
    half of the funnel, factored out because it is STATELESS given
    static gate frames: ids-only distinct gate joins (broadcast when
    small — stream-static joins on a stream) plus one scan-side CASE,
    no window, no aggregation — so attribution drops into a streaming
    ingest unchanged (pinned by test). Only the funnel's counts/running-
    survivor arithmetic needs batch semantics; maintain that half with
    ``maintain_funnel_counts``."""
    if not stages:
        raise ValueError("curation_attribution requires at least one stage")
    names = list(stages)
    out = df.select(id_col)
    # index-based internal flags: stage names are labels, not column
    # names (a dotted name would break F.col() parsing)
    for i, name in enumerate(names):
        gate = stages[name].select(F.col(id_col)).distinct().withColumn(
            f"_g_{i}", F.lit(True)
        )
        out = out.join(gate, id_col, "left")
    first = F.coalesce(
        *[
            F.when(F.col(f"_g_{i}").isNotNull(), F.lit(i))
            for i in range(len(names))
        ],
        F.lit(len(names)),
    )
    return out.select(F.col(id_col), first.cast("int").alias("stage_idx"))


def curation_funnel(
    df: DataFrame,
    stages: dict[str, DataFrame],
    id_col: str = "doc_id",
) -> DataFrame:
    """The curation FUNNEL: survivor counts through an ORDERED chain of
    drop-id gates — the stage-by-stage "where did my corpus go" summary
    every pipeline run should print (aggregate keep rates hide which
    gate did the damage; ``curation_decisions`` explains single docs,
    this explains the run). Each document is attributed to the FIRST
    gate (in ``stages`` order) that fired on it; later gates never see
    it, exactly as a sequential pipeline would behave. One row per
    stage: ``stage_idx``, ``stage``, docs entering, dropped here,
    surviving, and the drop fraction (one IEEE division of exact
    counts; NULL for a stage nothing entered).

    Scale shape: each gate joins as an ids-only distinct table (the
    curation_decisions discipline — broadcast when small); attribution
    is a scan-side CASE over the flags (``curation_attribution``); the
    count table is |stages|-sized, and the running survivor arithmetic
    runs as a window over THAT table, never the corpus.

    NOTE the count table is localCheckpoint-ed (its producer — every
    gate's corpus pass — feeds two consumers that AQE cannot share):
    under AQE, building this frame therefore runs the gate jobs at
    CONSTRUCTION time, and the checkpointed blocks are executor-local
    (an executor lost between build and action fails the consumer
    instead of recomputing — the standard localCheckpoint trade, fine
    for a ≤|stages|+1-row table that is cheap to rebuild by re-calling
    the operator).
    """
    names = list(stages)
    counts = (
        curation_attribution(df, stages, id_col)
        .select(F.col("stage_idx").alias("_stage_idx"))
        .groupBy("_stage_idx")
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
        # |stages|+1 rows at most, but its producer is the whole
        # attribution pipeline (every gate's corpus pass): the funnel
        # tail consumes it twice (total-agg + spine join), and AQE's
        # broadcast exchanges block plan-level reuse of the producer —
        # a tiny checkpoint makes both consumers read the counts, not
        # recompute the gates. Batch-only op (the window below), so the
        # checkpoint is stream-safe by construction.
        .localCheckpoint(eager=False)
    )
    return _funnel_from_counts(df.sparkSession, counts, names)


def _funnel_from_counts(
    spark, counts: DataFrame, names: list[str]
) -> DataFrame:
    """The funnel datasheet from a (``_stage_idx``, ``_n``) count table
    (at most |stages|+1 rows — survivors land at index len(names)):
    spine join, running-survivor window over the count table, drop
    fractions. Shared by the batch funnel and the maintained-counts
    reader (``merge_funnel_counts``)."""
    spine = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], ["stage_idx", "stage"]
    )
    from pyspark.sql.window import Window

    # total = sum over the |stages|+1-row count table (every doc lands in
    # exactly one bucket, survivors included) — keeps the whole funnel
    # one lazy plan instead of forcing an eager corpus count here
    tot = counts.agg(F.sum("_n").cast("long").alias("_total"))
    joined = (
        spine.join(counts, spine["stage_idx"] == counts["_stage_idx"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "stage_idx",
            "stage",
            F.coalesce("_n", F.lit(0)).cast("long").alias("n_dropped"),
            F.coalesce("_total", F.lit(0)).alias("_total"),
        )
    )
    w = (
        Window.orderBy("stage_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_in = F.col("_total") - F.coalesce(F.sum("n_dropped").over(w), F.lit(0))
    staged = joined.withColumn("n_in", n_in.cast("long")).drop("_total")
    return staged.select(
        "stage_idx",
        "stage",
        "n_in",
        "n_dropped",
        (F.col("n_in") - F.col("n_dropped")).cast("long").alias("n_out"),
        F.when(
            F.col("n_in") > 0,
            F.col("n_dropped").cast("double") / F.col("n_in").cast("double"),
        ).alias("drop_frac"),
    )


def maintain_funnel_counts(
    stream: DataFrame,
    stages: dict[str, DataFrame],
    table_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    available_now: bool = True,
):
    """STREAMING maintenance of the curation funnel: per micro-batch,
    attribute each document to its first-fired gate
    (``curation_attribution`` — stateless stream-static joins against
    the STATIC gate frames) and OVERWRITE the batch's own
    ``batch_id=<n>`` partition with the |stages|+1-row attribution
    count table — the mergeable-model maintainer tier (fertility/HLL/
    CMS): counts are associative sums, so the merged history equals one
    batch funnel over everything ever streamed (pinned by test), and
    redelivery is idempotent. Read with ``merge_funnel_counts``.

    What is NOT stream-legal, and why this shape exists: the funnel's
    running-survivor window needs every stage's GLOBAL count — a
    streaming aggregation over the whole history — so the datasheet
    itself cannot be one incremental query; the bounded per-batch count
    table + read-time merge is the honest decomposition. Gate frames
    must be static (blocklists, benchmark fingerprints, a frozen short-
    doc id set): a gate computed from the evolving corpus itself would
    make earlier batches' attributions retroactively wrong.

    A params manifest pins the STAGE CHAIN (names, order, id_col):
    merging count tables attributed under different chains would
    silently mix semantics — fail fast instead (the sketch-manifest
    rule)."""
    from colnade_spark.streaming.stream import (
        maintain_partitioned_table,
        write_table_manifest,
    )

    if not stages:
        raise ValueError("maintain_funnel_counts requires at least one stage")
    names = list(stages)
    write_table_manifest(
        stream.sparkSession,
        table_path,
        {"kind": "funnel_counts", "stages": names, "id_col": id_col},
    )

    def _build(batch_df: DataFrame) -> DataFrame:
        return (
            curation_attribution(batch_df, stages, id_col)
            .groupBy("stage_idx")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        )

    return maintain_partitioned_table(
        stream, _build, table_path, checkpoint, available_now
    )


def merge_funnel_counts(spark, table_path: str) -> DataFrame:
    """Collapse a ``maintain_funnel_counts`` history into the funnel
    datasheet (same columns as ``curation_funnel``): re-sum the
    per-batch attribution counts (associative — equal to one batch
    funnel over everything ever streamed), then run the spine/window
    tail over the |stages|+1-row merged table. Stage names and order
    come from the manifest the maintainer pinned."""
    from colnade_spark.streaming.stream import read_table_manifest

    from colnade_spark.streaming.stream import read_batched_history

    mf = read_table_manifest(spark, table_path)
    if mf is None or mf.get("kind") != "funnel_counts":
        raise ValueError(
            f"no funnel_counts manifest at {table_path}; was this table"
            " written by maintain_funnel_counts?"
        )
    hist = read_batched_history(spark, table_path)
    if hist is None:
        # maintainer registered but no batch committed yet: a valid
        # all-zero datasheet, not a cryptic read error
        counts = spark.createDataFrame([], "_stage_idx int, _n long")
    else:
        counts = hist.groupBy(F.col("stage_idx").alias("_stage_idx")).agg(
            F.sum("n_docs").cast("long").alias("_n")
        )
    return _funnel_from_counts(spark, counts, list(mf["stages"]))


def fit_psi_baseline(
    df: DataFrame,
    value_col: str = "n_chars",
    edges: tuple[float, ...] = (100, 200, 400, 800, 1600),
    group_col: str | None = None,
) -> dict:
    """The FROZEN PSI baseline: a snapshot's exact per-(group, bin)
    counts plus the binning parameters that produced them — fit once on
    a reference corpus, then score any batch or MICRO-BATCH against it
    with ``psi_against_baseline``. Counts are exact longs (deterministic
    whatever the partitioning — unlike quantile sketches, nothing here
    is approximate), and the table is |groups|·|bins| rows: the
    fit_logratio bounded-driver tier.

    The returned dict pins ``edges``/``value_col``/``group_col``
    alongside the counts: scoring against a baseline binned on
    different edges silently mis-reports drift, so the scorer refuses
    a parameter mismatch (the sketch-manifest rule, driver-side)."""
    _psi_validate_edges(edges)
    rows = _psi_counts(df, value_col, edges, group_col, "n_old").collect()
    return {
        "value_col": value_col,
        "edges": [float(e) for e in edges],
        "group_col": group_col,
        "counts": [r.asDict() for r in rows],
    }


def psi_against_baseline(
    df: DataFrame,
    baseline: dict,
    value_col: str = "n_chars",
    edges: tuple[float, ...] = (100, 200, 400, 800, 1600),
    group_col: str | None = None,
) -> DataFrame:
    """PSI drift report of ``df`` against a FROZEN baseline
    (``fit_psi_baseline``): same output columns and bit-identical
    values as ``length_drift_psi(old=<fit snapshot>, new=df, ...)`` —
    pinned by test — but the old side is a constant table instead of a
    second scan, so this is the monitoring shape: fit once, score every
    ingest batch against the same reference forever. Parameter drift
    vs the baseline RAISES (mis-binned drift reports read as stable).

    Scale: one scan-side bin projection + map-side-combined count of
    ``df`` (|groups|·|bins| longs on the shuffle), joined to the
    literal baseline table. Per-batch on streams via foreachBatch
    (``maintain_drift_reports``): PSI needs the batch's own bin counts,
    an aggregation — not a stateless projection — so the per-batch
    report table is the stream-legal artifact (reports are per-batch BY
    DESIGN: PSI is not associative, nothing is merged)."""
    _psi_validate_edges(edges)
    want = {
        "value_col": value_col,
        "edges": [float(e) for e in edges],
        "group_col": group_col,
    }
    have = {k: baseline.get(k) for k in want}
    if have != want:
        raise ValueError(
            f"psi_against_baseline: baseline was fit with {have}; caller"
            f" passed {want} — mis-binned baselines mis-report drift"
        )
    n_bins = len(edges) + 2
    spark = df.sparkSession
    if group_col:
        gtype = df.schema[group_col].dataType.simpleString()
        schema = f"{group_col} {gtype}, bin int, n_old long"
        rows = [
            (r.get(group_col), r["bin"], r["n_old"])
            for r in baseline["counts"]
        ]
    else:
        schema = "bin int, n_old long"
        rows = [(r["bin"], r["n_old"]) for r in baseline["counts"]]
    co = spark.createDataFrame(rows, schema)
    cn = _psi_counts(df, value_col, edges, group_col, "n_new")
    return _psi_report(co, cn, group_col, n_bins)


def _psi_baseline_fingerprint(baseline: dict) -> str:
    """Stable content hash of a ``fit_psi_baseline`` artifact: the
    sorted (group, bin, n_old) count rows plus the binning parameters.
    Two baselines fit on different reference snapshots differ here even
    when their binning parameters are identical — which is exactly the
    drift the maintainer manifest must refuse (per-batch PSI scored
    against a silently-swapped reference reads as a monitoring
    discontinuity, not an error)."""
    import hashlib
    import json

    group_col = baseline.get("group_col")
    rows = sorted(
        (
            [r.get(group_col) if group_col else None, r["bin"], r["n_old"]]
            for r in baseline["counts"]
        ),
        key=lambda t: (repr(t[0]), t[1]),
    )
    key = {
        "value_col": baseline.get("value_col"),
        "edges": baseline.get("edges"),
        "group_col": group_col,
        "counts": rows,
    }
    return hashlib.sha256(
        json.dumps(key, sort_keys=True, default=str).encode("utf-8")
    ).hexdigest()


def maintain_drift_reports(
    stream: DataFrame,
    baseline: dict,
    table_path: str,
    checkpoint: str,
    value_col: str = "n_chars",
    edges: tuple[float, ...] = (100, 200, 400, 800, 1600),
    group_col: str | None = None,
    available_now: bool = True,
):
    """STREAMING drift monitoring: per micro-batch, the batch's PSI
    report against the FROZEN baseline overwrites its own
    ``batch_id=<n>`` partition — one |groups|·|bins|-row report per
    batch, idempotent under redelivery. Unlike the fertility/funnel
    maintainers nothing merges at read time: PSI is not associative,
    and per-batch reports are the monitoring artifact (read partition
    N for "how drifted was batch N"; alert on sum(psi_term) per
    group). The manifest pins the binning parameters AND a fingerprint
    of the baseline's counts, so a resumed run can neither silently
    score against different bins nor against a baseline refit on a
    different reference snapshot (identical params, different counts —
    the subtler mix, and the one the binning pins alone would miss)."""
    from colnade_spark.streaming.stream import (
        maintain_partitioned_table,
        write_table_manifest,
    )

    _psi_validate_edges(edges)
    write_table_manifest(
        stream.sparkSession,
        table_path,
        {
            "kind": "psi_reports",
            "value_col": value_col,
            "edges": [float(e) for e in edges],
            "group_col": group_col,
            "baseline_sha256": _psi_baseline_fingerprint(baseline),
        },
    )
    return maintain_partitioned_table(
        stream,
        lambda b: psi_against_baseline(
            b, baseline, value_col, edges, group_col
        ),
        table_path,
        checkpoint,
        available_now,
    )
