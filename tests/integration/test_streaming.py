"""Structured Streaming: file source → watermark → window agg / stateful
sessionization, verified against batch equivalents on the same data.

Uses availableNow triggers: process the whole backlog, then stop — bounded
test runtime, real streaming machinery (state stores, watermarks).
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from colnade_spark.expr import lit
from colnade_spark.operators import sessions
from colnade_spark.streaming import scan_stream_parquet
from colnade_spark.tpch import Events, table_path


def _await(query, timeout=120):
    try:
        query.processAllAvailable()
    finally:
        query.stop()


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir):
    return lambda: scan_stream_parquet(
        table_path(sf_dir, "events"), Events, spark=spark
    )


def test_stream_is_streaming_and_filter(spark, sf_dir, events_stream):
    sf = events_stream().filter(Events.event_type == "click")
    assert sf.is_streaming
    name = f"t_{uuid.uuid4().hex[:8]}"
    _await(sf.to_memory_sink(name))
    got = spark.table(name).count()
    from colnade_spark import read_parquet

    batch_all = read_parquet(table_path(sf_dir, "events"), Events, spark=spark)
    batch_match = batch_all.filter(Events.event_type == "click").height
    assert got == batch_match
    assert 0 < got < batch_all.height


def test_stream_window_agg_matches_batch(spark, sf_dir, events_stream):
    from pyspark.sql import functions as F

    sf = (
        events_stream()
        .with_watermark(Events.ts, "1 hour")
        .window_agg(
            Events.ts,
            "6 hours",
            Events.value.sum().alias("sum_value"),
            Events.event_id.count().alias("n"),
            keys=(Events.event_type,),
        )
    )
    name = f"t_{uuid.uuid4().hex[:8]}"
    _await(sf.to_memory_sink(name, output_mode="append"))
    got = {
        (r.window_start, r.event_type): (round(r.sum_value, 6), r.n)
        for r in spark.table(name).collect()
    }

    # batch equivalent over the same file
    from colnade_spark import read_parquet

    e = read_parquet(table_path(sf_dir, "events"), Events, spark=spark)
    batch = (
        e.native.groupBy(
            F.window("ts", "6 hours").alias("w"), "event_type"
        )
        .agg(F.sum("value").alias("sum_value"), F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("ws"), "event_type", "sum_value", "n"
        )
        .collect()
    )
    want = {(r.ws, r.event_type): (round(r.sum_value, 6), r.n) for r in batch}
    # the final (open) windows may be withheld by the watermark in append
    # mode; everything emitted must match the batch result exactly
    assert got
    for k, v in got.items():
        assert want.get(k) == v, (k, v, want.get(k))


def test_stream_sessionize_matches_batch(spark, sf_dir, events_stream):
    sf = events_stream().with_watermark(Events.ts, "1 hour")
    sess = sessions.sessionize_stream(sf.native, gap_minutes=30)
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        sess.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table(name).collect()
    }

    from colnade_spark import read_parquet

    events_batch = read_parquet(table_path(sf_dir, "events"), Events, spark=spark)
    batch = sessions.sessionize_batch(events_batch.native, gap_minutes=30)
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch.collect()
    }
    # sessions closed before the final watermark must match batch exactly;
    # open sessions at end-of-stream may be missing from the streaming side
    assert got, "no sessions emitted"
    assert got <= want, got - want
    assert len(got) >= len(want) * 0.5


def test_native_session_window_matches_custom_state_sessionizer(
    spark, sf_dir, events_stream
):
    """session_window_agg (engine-native) must agree with the
    applyInPandasWithState sessionizer on (user, n_events) per session —
    same gap semantics, two implementations. Timestamps differ by design:
    native session_end = last event + gap, custom = last event."""
    from pyspark.sql import functions as F

    sf = (
        events_stream()
        .with_watermark(Events.ts, "1 hour")
        .session_window_agg(
            Events.ts,
            "30 minutes",
            Events.event_id.count().alias("n_events"),
            keys=(Events.user_id,),
        )
    )
    name = f"t_{uuid.uuid4().hex[:8]}"
    _await(sf.to_memory_sink(name, output_mode="append"))
    got = {
        (r.user_id, r.session_start, r.n_events)
        for r in spark.table(name).collect()
    }

    from colnade_spark import read_parquet

    events_batch = read_parquet(table_path(sf_dir, "events"), Events, spark=spark)
    batch = sessions.sessionize_batch(events_batch.native, gap_minutes=30)
    want = {
        (r.user_id, r.session_start, r.n_events) for r in batch.collect()
    }
    assert got, "no sessions emitted"
    # append mode withholds sessions still open at the final watermark
    assert got <= want, list(got - want)[:5]
    assert len(got) >= len(want) * 0.5


def test_session_window_agg_requires_watermark(events_stream):
    import pytest

    with pytest.raises(ValueError):
        events_stream().session_window_agg(
            Events.ts, "30 minutes", Events.event_id.count().alias("n")
        )


def test_hash_sample_is_stateless_on_streams(spark, sf_dir, events_stream):
    """Content-addressed sampling is a stateless filter: applied to a
    STREAM it selects exactly the rows the batch gate selects — no state
    store, no watermark, deterministic membership at ingest time."""
    from colnade_spark.operators import sampling

    sf = events_stream()
    sampled = sf.with_raw(
        lambda d: sampling.hash_sample(d, 0.25, key_col="event_id", salt="st")
    )
    name = f"t_{uuid.uuid4().hex[:8]}"
    _await(sampled.to_memory_sink(name, output_mode="append"))
    got = {r.event_id for r in spark.table(name).collect()}

    batch = spark.read.parquet(table_path(sf_dir, "events"))
    want = {
        r.event_id
        for r in sampling.hash_sample(
            batch, 0.25, key_col="event_id", salt="st"
        ).collect()
    }
    assert got == want and 0 < len(got) < batch.count()


def test_stream_drop_duplicates_matches_batch_distinct(spark, sf_dir, events_stream):
    sf = events_stream().drop_duplicates(Events.user_id)
    name = f"t_{uuid.uuid4().hex[:8]}"
    _await(sf.to_memory_sink(name))
    got = spark.table(name).select("user_id").distinct().count()
    total = spark.table(name).count()
    from colnade_spark import read_parquet

    batch = read_parquet(table_path(sf_dir, "events"), Events, spark=spark)
    want = batch.native.select("user_id").distinct().count()
    assert got == total == want  # one row per user, each user once


def test_stream_dedup_within_watermark_requires_watermark(events_stream):
    with pytest.raises(ValueError):
        events_stream().drop_duplicates_within_watermark(Events.user_id)


def test_stream_dedup_within_watermark_drops_near_dups(spark, sf_dir, events_stream):
    sf = (
        events_stream()
        .with_watermark(Events.ts, "2 hours")
        .drop_duplicates_within_watermark(Events.user_id, Events.event_type)
    )
    name = f"t_{uuid.uuid4().hex[:8]}"
    _await(sf.to_memory_sink(name))
    got = spark.table(name).count()
    from colnade_spark import read_parquet

    batch = read_parquet(table_path(sf_dir, "events"), Events, spark=spark)
    n_raw = batch.height
    n_exact_distinct = batch.native.select("user_id", "event_type").distinct().count()
    # watermark-bounded dedup removes SOME rows but cannot dedup harder
    # than global distinct (duplicates far apart in event time survive)
    assert n_exact_distinct <= got < n_raw


def test_stream_group_agg_running_totals(spark, sf_dir, events_stream):
    sf = events_stream().group_agg(
        (Events.event_type,),
        Events.value.sum().alias("sum_value"),
        Events.event_id.count().alias("n"),
    )
    name = f"t_{uuid.uuid4().hex[:8]}"
    _await(sf.to_memory_sink(name, output_mode="complete"))
    got = {r.event_type: (round(r.sum_value, 6), r.n) for r in spark.table(name).collect()}
    from pyspark.sql import functions as F

    from colnade_spark import read_parquet

    e = read_parquet(table_path(sf_dir, "events"), Events, spark=spark)
    want = {
        r.event_type: (round(r.s, 6), r.n)
        for r in e.native.groupBy("event_type")
        .agg(F.sum("value").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_stream_stream_join_matches_batch(spark, sf_dir, events_stream):
    """click ⋈ purchase per user within +1 hour, both sides watermarked;
    emitted pairs must equal the batch join on the same files."""
    from pyspark.sql import functions as F

    clicks = (
        events_stream()
        .filter(Events.event_type == "click")
        .with_watermark(Events.ts, "2 hours")
    )
    buys = (
        events_stream()
        .filter(Events.event_type == "purchase")
        .with_watermark(Events.ts, "2 hours")
    )
    joined = clicks.join_stream(
        buys,
        Events.user_id == Events.user_id,
        time_condition="ts__r BETWEEN ts AND ts + INTERVAL 1 HOUR",
    )
    name = f"t_{uuid.uuid4().hex[:8]}"
    _await(joined.to_memory_sink(name))
    got = spark.table(name).count()

    from colnade_spark import read_parquet

    e = read_parquet(table_path(sf_dir, "events"), Events, spark=spark).native
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"), F.col("ts").alias("cts")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u2"), F.col("ts").alias("pts")
    )
    want = c.join(
        p,
        (F.col("u") == F.col("u2"))
        & (F.col("pts") >= F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 1 HOUR")),
    ).count()
    assert got == want and got > 0


def test_stream_stream_join_requires_both_watermarks(events_stream):
    clicks = events_stream().filter(Events.event_type == "click")
    buys = events_stream().filter(Events.event_type == "purchase")
    with pytest.raises(ValueError):
        clicks.join_stream(buys, Events.user_id == Events.user_id)


def test_idempotent_parquet_sink_survives_redelivery(spark, sf_dir, events_stream, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    sf = events_stream().filter(Events.event_type == "click")
    q = sf.to_idempotent_parquet_sink(out, ckpt)
    _await(q)
    back = spark.read.parquet(out)
    from colnade_spark import read_parquet

    batch = read_parquet(table_path(sf_dir, "events"), Events, spark=spark)
    want = batch.native.filter("event_type = 'click'").count()
    assert back.count() == want

    # simulate the crash-redelivery: rewrite batch 0 with the same data —
    # the partition overwrites itself, the total count must NOT change.
    # (materialize first: can't lazily read the directory being replaced)
    rows = back.filter("batch_id = 0").drop("batch_id").collect()
    redelivered = spark.createDataFrame(rows)
    redelivered.write.mode("overwrite").parquet(f"{out}/batch_id=0")
    assert spark.read.parquet(out).count() == want


def test_quality_gate_is_stateless_on_streams(spark, sf_dir):
    """Quality filtering (scan-side feature projections + threshold gate)
    is stateless: applied to a streamed documents source it keeps exactly
    the doc_ids the batch gate keeps — no state store, no watermark, so a
    100 TB/day ingest can apply Gopher-style gates at the ingest boundary
    with zero streaming-state cost."""
    from colnade_spark.operators import text
    from colnade_spark.streaming import scan_stream_parquet
    from colnade_spark.tpch import Documents
    from pyspark.sql import functions as F

    def gate(d):
        scored = text.quality_features(d)
        return scored.filter(
            (F.col("q_words") >= 10) & (F.col("q_stopword_ratio") > 0.0)
        ).select("doc_id")

    sf = scan_stream_parquet(table_path(sf_dir, "documents"), Documents, spark=spark)
    gated = sf.with_raw(gate)
    name = f"t_{uuid.uuid4().hex[:8]}"
    _await(gated.to_memory_sink(name, output_mode="append"))
    got = {r.doc_id for r in spark.table(name).collect()}

    batch = spark.read.parquet(table_path(sf_dir, "documents"))
    want = {r.doc_id for r in gate(batch).collect()}
    assert got == want and 0 < len(got) <= batch.count()


def test_classifier_gate_is_stateless_on_streams(spark, sf_dir):
    """Hashed linear classifier scoring is a stateless projection: a
    streamed documents source gates on clf_prob identically to batch —
    model-based quality gating drops in at the ingest boundary with no
    state store."""
    from colnade_spark.operators import classifier
    from colnade_spark.streaming import scan_stream_parquet
    from colnade_spark.tpch import Documents
    from pyspark.sql import functions as F

    def gate(d):
        scored = classifier.hashed_linear_score(d, dim=4096, seed=7)
        return scored.filter(F.col("clf_prob") >= 0.5).select("doc_id")

    sf = scan_stream_parquet(table_path(sf_dir, "documents"), Documents, spark=spark)
    gated = sf.with_raw(gate)
    name = f"t_{uuid.uuid4().hex[:8]}"
    _await(gated.to_memory_sink(name, output_mode="append"))
    got = {r.doc_id for r in spark.table(name).collect()}

    batch = spark.read.parquet(table_path(sf_dir, "documents"))
    want = {r.doc_id for r in gate(batch).collect()}
    assert got == want and 0 < len(got) < batch.count()


def test_upsample_epochs_is_stateless_on_streams(spark, sf_dir):
    """Epoch upsampling (projection + generate) is stateless: a streamed
    source replicates exactly the (doc_id, epoch) multiset the batch
    operator produces — domain mixing can run inline on ingest."""
    from colnade_spark.operators import sampling
    from colnade_spark.streaming import scan_stream_parquet
    from colnade_spark.tpch import Documents

    def up(d):
        return sampling.upsample_epochs(
            d, {"en": 2.0, "zh": 1.5}, domain_col="lang", salt="st"
        ).select("doc_id", "epoch")

    sf = scan_stream_parquet(table_path(sf_dir, "documents"), Documents, spark=spark)
    name = f"t_{uuid.uuid4().hex[:8]}"
    _await(sf.with_raw(up).to_memory_sink(name, output_mode="append"))
    got = sorted((r.doc_id, r.epoch) for r in spark.table(name).collect())

    batch = spark.read.parquet(table_path(sf_dir, "documents"))
    want = sorted((r.doc_id, r.epoch) for r in up(batch).collect())
    assert got == want and len(got) > batch.count()


def test_dsir_frozen_gate_is_stateless_on_streams(spark, sf_dir):
    """DSIR scoring against a frozen log-ratio table is a pure scan-side
    projection (array fold over a staged literal table): a streamed
    documents source scores and gates identically to batch — fit the
    table offline on a snapshot, then importance-gate the ingest with
    zero streaming state."""
    from colnade_spark.operators.importance import dsir_score_frozen, fit_logratio
    from colnade_spark.streaming import scan_stream_parquet
    from colnade_spark.tpch import Documents
    from pyspark.sql import functions as F

    batch = spark.read.parquet(table_path(sf_dir, "documents"))
    lr = fit_logratio(batch, batch.filter(F.col("lang") == "en"), buckets=256)

    def gate(d):
        return (
            dsir_score_frozen(d, lr)
            .filter(F.col("weight") > 0.0)
            .select("doc_id")
        )

    sf = scan_stream_parquet(table_path(sf_dir, "documents"), Documents, spark=spark)
    name = f"t_{uuid.uuid4().hex[:8]}"
    _await(sf.with_raw(gate).to_memory_sink(name, output_mode="append"))
    got = {r.doc_id for r in spark.table(name).collect()}
    want = {r.doc_id for r in gate(batch).collect()}
    assert got == want and 0 < len(got) < batch.count()


def test_commonness_frozen_gate_is_stateless_on_streams(spark, sf_dir):
    """SoftDeDup commonness scoring against a frozen bucketed gram-count
    table is a pure scan-side projection (array fold over a staged
    literal table): a streamed documents source scores and gates
    identically to batch — fit the table offline on a corpus snapshot,
    then down-weight/gate the ingest with zero streaming state (the
    stream-legal stand-in for commonness_weights' corpus-wide gram
    aggregation, which is not expressible on a stream)."""
    from colnade_spark.operators.importance import (
        commonness_score_frozen,
        fit_gram_counts,
    )
    from colnade_spark.streaming import scan_stream_parquet
    from colnade_spark.tpch import Documents
    from pyspark.sql import functions as F

    batch = spark.read.parquet(table_path(sf_dir, "documents"))
    ct = fit_gram_counts(batch, n=3, buckets=2048)

    def gate(d):
        return commonness_score_frozen(d, ct, n=3).filter(
            F.col("weight") >= 0.066  # ~median on this fixture: a real gate
        )

    sf = scan_stream_parquet(table_path(sf_dir, "documents"), Documents, spark=spark)
    name = f"t_{uuid.uuid4().hex[:8]}"
    _await(sf.with_raw(gate).to_memory_sink(name, output_mode="append"))
    got = {(r.doc_id, r.n_grams, r.sum_df, r.weight)
           for r in spark.table(name).collect()}
    want = {(r.doc_id, r.n_grams, r.sum_df, r.weight)
            for r in gate(batch).collect()}
    assert got == want and 0 < len(got) < batch.count()


def test_semantic_decontamination_is_stateless_on_streams(spark, sf_dir):
    """Semantic decontamination (cosine screen vs a BROADCAST benchmark
    embedding set) is a stateless stream-static join + filter: a
    streamed embeddings source flags exactly the ids the batch operator
    flags — paraphrase-leakage screening drops in at ingest with no
    streaming state."""
    from colnade_spark.operators.decontaminate import semantic_contaminated_ids
    from colnade_spark.streaming import scan_stream_parquet
    from colnade_spark.tpch import Embeddings
    from pyspark.sql import functions as F

    batch = spark.read.parquet(table_path(sf_dir, "embeddings"))
    bench = batch.filter(F.col("vec_id") % 50 == 0)

    def gate(d):
        return semantic_contaminated_ids(
            d.filter(F.col("vec_id") % 50 != 0), bench, threshold=0.4
        )

    sf = scan_stream_parquet(table_path(sf_dir, "embeddings"), Embeddings, spark=spark)
    name = f"t_{uuid.uuid4().hex[:8]}"
    _await(sf.with_raw(gate).to_memory_sink(name, output_mode="append"))
    got = {r.vec_id for r in spark.table(name).collect()}
    want = {r.vec_id for r in gate(batch).collect()}
    assert got == want and 0 < len(got) < batch.count()


def test_scan_stream_parquet_accepts_empty_source_dir(spark, tmp_path):
    """THE streaming setup: the source directory exists but no files have
    landed yet — the declared schema must carry the stream (the batch
    schema probe used for the nanos fixup must not abort it)."""
    from colnade_spark.streaming import scan_stream_parquet
    from colnade_spark.tpch import Documents

    empty = tmp_path / "landing"
    empty.mkdir()
    sf = scan_stream_parquet(str(empty), Documents, spark=spark)
    name = f"t_{uuid.uuid4().hex[:8]}"
    _await(sf.to_memory_sink(name, output_mode="append"))
    assert spark.table(name).count() == 0


def test_scan_stream_parquet_propagates_corrupt_footer(spark, tmp_path):
    """A real read failure (corrupt parquet footer) must PROPAGATE from
    the schema probe, not be silently treated as an empty source dir
    (ADVICE round 3: the bare except masked corrupt/permission faults)."""
    import pytest

    from colnade_spark.streaming import scan_stream_parquet
    from colnade_spark.tpch import Documents

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "part-000.parquet").write_bytes(b"PAR1 this is not parquet")
    with pytest.raises(Exception) as ei:
        scan_stream_parquet(str(landing), Documents, spark=spark)
    assert "parquet" in str(ei.value).lower() or "footer" in str(ei.value).lower()


def test_pq_screen_gate_is_stateless_on_streams(spark, sf_dir):
    """Semantic screening over PQ codes is a pure scan-side projection
    (Arrow-batched encode + literal-LUT ADC max + filter): a streamed
    embeddings source keeps exactly the ids the batch gate keeps — the
    compact-code analog of the frozen-DSIR gate, for decontaminating an
    ingest against a frozen benchmark set without carrying raw vectors."""
    from colnade_spark.operators.pq import pq_screen_gate, train_pq_codebooks
    from colnade_spark.streaming import scan_stream_parquet
    from colnade_spark.tpch import Embeddings
    from pyspark.sql import functions as F

    batch = spark.read.parquet(table_path(sf_dir, "embeddings"))
    books = train_pq_codebooks(batch, m=16, ksub=32)
    bench = [
        r.embedding
        for r in batch.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
    ]

    def gate(d):
        return pq_screen_gate(
            d.select("vec_id", "embedding"), bench, books, threshold=0.55
        ).select("vec_id")

    sf = scan_stream_parquet(table_path(sf_dir, "embeddings"), Embeddings, spark=spark)
    name = f"t_{uuid.uuid4().hex[:8]}"
    _await(sf.with_raw(gate).to_memory_sink(name, output_mode="append"))
    got = {r.vec_id for r in spark.table(name).collect()}
    want = {r.vec_id for r in gate(batch).collect()}
    assert got == want and 0 < len(got) < batch.count()
    assert {0, 1, 2, 3}.isdisjoint(got)


def test_pq_contamination_report_streams_as_aggregation(spark, sf_dir):
    """The graded PQ contamination report runs on a stream unchanged:
    the scan side (encode + literal-LUT ADCs) is stateless and the one
    wide ungrouped aggregate (hit-count/max per query in a single
    buffer row, exploded to per-query rows after) is a standard
    streaming aggregation (complete mode, one row of state) — a
    streamed embeddings source reports exactly what the batch report
    says."""
    from pyspark.sql import functions as F

    from colnade_spark.operators.pq import (
        pq_contamination_report,
        pq_encode,
        train_pq_codebooks,
    )
    from colnade_spark.streaming import scan_stream_parquet
    from colnade_spark.tpch import Embeddings

    batch = spark.read.parquet(table_path(sf_dir, "embeddings"))
    books = train_pq_codebooks(batch, m=16, ksub=32)
    bench = [
        r.embedding
        for r in batch.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
    ]

    def rep(d):
        codes = pq_encode(d.select("vec_id", "embedding"), books)
        return pq_contamination_report(codes, bench, books, threshold=0.55)

    sf = scan_stream_parquet(
        table_path(sf_dir, "embeddings"), Embeddings, spark=spark
    )
    name = f"t_{uuid.uuid4().hex[:8]}"
    _await(sf.with_raw(rep).to_memory_sink(name, output_mode="complete"))
    got = {
        r.query_id: (r.n_rows, r.n_hits, r.frac_hits, r.max_adc)
        for r in spark.table(name).collect()
    }
    want = {
        r.query_id: (r.n_rows, r.n_hits, r.frac_hits, r.max_adc)
        for r in rep(batch).collect()
    }
    assert got == want and len(got) == 4
    # every benchmark member itself screens, so each query has hits
    assert all(v[1] > 0 for v in got.values())


def test_fingerprint_bloom_cross_batch_dedup(spark, sf_dir, tmp_path):
    """Bounded-state streaming dedup: maintain a fingerprint Bloom over a
    first corpus slice, then gate a second slice that shares some texts —
    every true duplicate of history is dropped (no false negatives, by
    construction), survivors are (almost) exactly the fresh texts, and
    the n=0 manifest prevents cross-probing a gram Bloom."""
    import pytest
    from pyspark.sql import functions as F

    from colnade_spark.operators import decontaminate as dc
    from colnade_spark.streaming import scan_stream_parquet
    from colnade_spark.tpch import Documents, table_path

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    hist_src = str(tmp_path / "hist")
    docs.filter("doc_id % 2 = 0").write.parquet(hist_src)

    dest = str(tmp_path / "fp_bloom")
    sf = scan_stream_parquet(hist_src, Documents, spark=spark)
    q = dc.maintain_fingerprint_bloom(
        sf.native, dest, str(tmp_path / "ck"), m_bits=1 << 18, n_hashes=4
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert dc.read_bloom_manifest(spark, dest)["n"] == 0
    words = dc.load_bloom(spark, dest, 1 << 18, n=0, n_hashes=4)
    # a gram-Bloom loader pinned to n=13 must refuse this table
    with pytest.raises(ValueError, match="false negatives"):
        dc.load_bloom(spark, dest, 1 << 18, n=13)

    # incoming batch: half replays history texts, half is fresh
    incoming = docs.filter("doc_id % 2 = 0").limit(50).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    ).unionByName(
        docs.filter("doc_id % 2 = 1").limit(50).select("doc_id", "text")
    )
    kept = dc.bloom_duplicate_gate(incoming, words, m_bits=1 << 18, n_hashes=4)
    ids = {r.doc_id for r in kept.collect()}
    # NO false negatives: every replayed history text is gone
    assert not any(i >= 1_000_000 for i in ids)
    # fresh texts survive modulo Bloom false positives (small at this fill)
    fresh = {r.doc_id for r in incoming.filter("doc_id < 1000000").collect()}
    assert len(ids) >= 0.9 * len(fresh)
    assert ids <= fresh
    # scan shape: over a plain source the gate is a pure filter — no
    # exchange, no join (the union/limits above are test scaffolding)
    plain = dc.bloom_duplicate_gate(
        docs.select("doc_id", "text"), words, m_bits=1 << 18, n_hashes=4
    )
    plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_fingerprint_bloom_survives_null_text(spark, sf_dir, tmp_path):
    """A NULL-text row in the maintained stream must not poison the
    Bloom table: fingerprint(NULL) is NULL, and before the null-gram
    filter it wrote a (_w=NULL, _bits=NULL) row that made every
    subsequent load_bloom crash at words[r._w] — permanently breaking
    the dedup pipeline. NULL rows contribute no bits (they can't
    duplicate anything) and the history still gates true duplicates."""
    from pyspark.sql import functions as F

    from colnade_spark.operators import decontaminate as dc
    from colnade_spark.streaming import scan_stream_parquet
    from colnade_spark.tpch import Documents, table_path

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    hist = docs.limit(20).select("doc_id", "text").unionByName(
        spark.createDataFrame(
            [(999_999,)], ["doc_id"]
        ).select("doc_id", F.lit(None).cast("string").alias("text"))
    )
    src = str(tmp_path / "hist")
    hist.write.parquet(src)

    dest = str(tmp_path / "fp_bloom")
    sf = scan_stream_parquet(src, Documents, spark=spark)
    q = dc.maintain_fingerprint_bloom(
        sf.native, dest, str(tmp_path / "ck"), m_bits=1 << 18, n_hashes=4
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    words = dc.load_bloom(spark, dest, 1 << 18, n=0, n_hashes=4)  # no crash
    replay = docs.limit(20).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    kept = dc.bloom_duplicate_gate(replay, words, m_bits=1 << 18, n_hashes=4)
    assert kept.count() == 0  # every history text still probes positive


def test_scan_stream_json_matches_batch(spark, tmp_path):
    """JSON-lines streaming source: a landing directory of jsonl files
    streams through a transformation and matches the batch read."""
    import json as _json

    from colnade_spark.streaming import scan_stream_json
    from colnade_spark.tpch import Documents

    landing = tmp_path / "landing"
    landing.mkdir()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = [r.asDict() for r in docs.limit(40).collect()]
    (landing / "a.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in rows[:25])
    )
    (landing / "b.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in rows[25:])
    )
    sf = scan_stream_json(str(landing), Documents, spark=spark)
    name = f"t_{uuid.uuid4().hex[:8]}"
    _await(
        sf.filter(Documents.n_chars > 0).to_memory_sink(
            name, output_mode="append"
        )
    )
    got = {r.doc_id for r in spark.table(name).collect()}
    want = {r["doc_id"] for r in rows if r["n_chars"] > 0}
    assert got == want and len(got) > 0


def test_changed_rows_gate_is_append_legal_on_streams(spark, sf_dir, tmp_path):
    """Incremental-ingest gate on a stream: each micro-batch stream-
    static left-joins the frozen snapshot's (id, fingerprint) side in
    append mode (no streaming state) and keeps exactly the rows the
    batch gate keeps."""
    from pyspark.sql import functions as F

    from colnade_spark.operators import report
    from colnade_spark.streaming import scan_stream_parquet
    from colnade_spark.tpch import Documents, table_path

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    old = docs.filter("doc_id % 3 != 0")  # every 3rd doc is "new"
    incoming = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    src = str(tmp_path / "incoming")
    incoming.write.parquet(src)

    sf = scan_stream_parquet(src, Documents, spark=spark)
    name = f"t_{uuid.uuid4().hex[:8]}"
    _await(
        sf.with_raw(lambda d: report.changed_rows_gate(d, old=old)).to_memory_sink(
            name, output_mode="append"
        )
    )
    got = {(r.doc_id, r.status) for r in spark.table(name).collect()}
    want = {
        (r.doc_id, r.status)
        for r in report.changed_rows_gate(incoming, old=old).collect()
    }
    assert got == want and len(got) > 0
    # every 3rd doc is added; every 5th (and not 3rd) is changed
    assert all(
        (d % 3 == 0) == (s == "added") for d, s in got
    )


def _write_ingest(df, src: str, order: int) -> None:
    """Append one ingest file with an EXPLICIT, strictly-increasing
    mtime: FileStreamSource orders new files by modification time, and
    two back-to-back writes can land in the same mtime tick on coarse-
    granularity filesystems — which would flip the batch order randomly
    (path tiebreak) and flake the batch-indexed assertions below."""
    import os

    before: set = set()
    if os.path.exists(src):
        for root, _dirs, files in os.walk(src):
            before.update(os.path.join(root, f) for f in files)
    df.coalesce(1).write.mode("append").parquet(src)
    t = 1_600_000_000 + order * 100
    for root, _dirs, files in os.walk(src):
        for f in files:
            p = os.path.join(root, f)
            if p not in before:
                os.utime(p, (t, t))


def test_maintain_corpus_churn_matches_batch_and_replays(spark, tmp_path):
    """STREAMING corpus diff against a maintained fingerprint table:
    batch 0 is all 'added'; batch 1's churn equals the BATCH
    changed_rows_gate of ingest-2 vs ingest-1 (the equivalence pin); the
    fingerprint table resolves to the latest fp per id; and a full
    re-run from a fresh checkpoint (redelivery of every batch) leaves
    both artifacts byte-identical because each batch overwrites its own
    partition and gates against strictly-earlier state."""
    from pyspark.sql import functions as F

    from colnade_spark.operators import report

    first = spark.createDataFrame(
        [(1, "alpha doc"), (2, "beta doc"), (3, "gamma doc")],
        ["doc_id", "text"],
    )
    second = spark.createDataFrame(
        [(2, "beta doc"), (3, "gamma doc v2"), (4, "delta doc")],
        ["doc_id", "text"],
    )
    src = str(tmp_path / "src")
    _write_ingest(first, src, 0)
    _write_ingest(second, src, 1)

    table = str(tmp_path / "fps")
    churn = str(tmp_path / "churn")

    def run(ck: str):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = report.maintain_corpus_churn(stream, table, churn, ck)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(str(tmp_path / "ck1"))

    got0 = {
        (r.doc_id, r.status)
        for r in spark.read.parquet(f"{churn}/batch_id=0").collect()
    }
    got1 = {
        (r.doc_id, r.status)
        for r in spark.read.parquet(f"{churn}/batch_id=1").collect()
    }
    # file order pinned by _write_ingest mtimes: batch 0 = first ingest
    assert got0 == {(1, "added"), (2, "added"), (3, "added")}
    want1 = {
        (r.doc_id, r.status)
        for r in report.changed_rows_gate(second, old=first).collect()
    }
    assert got1 == want1 == {(3, "changed"), (4, "added")}

    latest = {
        r.doc_id: r._mcc_fp
        for r in spark.read.parquet(table)
        .groupBy("doc_id")
        .agg(F.max_by("_mcc_fp", "batch_id").alias("_mcc_fp"))
        .collect()
    }
    assert set(latest) == {1, 2, 3, 4}

    # redelivery: replay the whole source from a fresh checkpoint — the
    # same batches overwrite their own partitions against the same
    # strictly-earlier state, so nothing changes
    before_churn = {
        (r.doc_id, r.status) for r in spark.read.parquet(churn).collect()
    }
    before_fps = {
        (r.doc_id, r._mcc_fp) for r in spark.read.parquet(table).collect()
    }
    run(str(tmp_path / "ck2"))
    assert {
        (r.doc_id, r.status) for r in spark.read.parquet(churn).collect()
    } == before_churn
    assert {
        (r.doc_id, r._mcc_fp) for r in spark.read.parquet(table).collect()
    } == before_fps


def test_maintain_minhash_dedup_matches_batch_and_replays(spark, tmp_path):
    """STREAMING near-dedup against a maintained signature store: batch 0
    keeps its unique docs, batch 1 drops near-dups of the STORE (cross)
    and of smaller ids within the batch; batch 1's survivors equal the
    BATCH dedup_minhash_incremental (equivalence pin); a full re-run from
    a fresh checkpoint leaves store and survivor artifacts identical
    (strictly-earlier-state gating + overwrite-own-partition)."""
    from colnade_spark.operators import dedup

    base = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through the quiet green field toward the distant river bank "
        "every single morning"
    )
    other = (
        "completely different content describing spark execution engines "
        "shuffles partitions and adaptive query planning internals in "
        "great detail for testing"
    )
    fresh = (
        "a third unrelated document about tokenizer vocabularies merge "
        "rules and byte pair encodings used by language model pipelines "
        "everywhere today"
    )
    first = spark.createDataFrame(
        [(1, base), (2, other)], ["doc_id", "text"]
    )
    second = spark.createDataFrame(
        [
            (3, base.replace("quiet", "silent")),  # near-dup of stored 1
            (4, fresh),  # unique -> survives
            (5, fresh.replace("today", "now")),  # within-batch dup of 4
        ],
        ["doc_id", "text"],
    )
    src = str(tmp_path / "src")
    _write_ingest(first, src, 0)
    _write_ingest(second, src, 1)

    sigs = str(tmp_path / "sigs")
    surv = str(tmp_path / "surv")
    params = dict(threshold=0.5, num_hashes=32, bands=8)

    def run(ck: str, **over):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = dedup.maintain_minhash_dedup(
            stream, sigs, surv, ck, **{**params, **over}
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(str(tmp_path / "ck1"))

    got0 = {
        r.doc_id for r in spark.read.parquet(f"{surv}/batch_id=0").collect()
    }
    got1 = {
        r.doc_id for r in spark.read.parquet(f"{surv}/batch_id=1").collect()
    }
    assert got0 == {1, 2}
    # equivalence pin vs the batch operator on the same store state
    corpus_sigs = dedup.minhash_signatures(
        first, num_hashes=32
    )
    want1 = {
        r.doc_id
        for r in dedup.dedup_minhash_incremental(
            second, corpus_sigs, threshold=0.5, num_hashes=32, bands=8
        ).collect()
    }
    assert got1 == want1 == {4}
    stored = {r.doc_id for r in spark.read.parquet(sigs).collect()}
    assert stored == {1, 2, 4}

    # redelivery: replay everything from a fresh checkpoint — same
    # batches, same strictly-earlier state, identical artifacts
    before = {
        (r.doc_id, tuple(r._sig)) for r in spark.read.parquet(sigs).collect()
    }
    run(str(tmp_path / "ck2"))
    assert {
        (r.doc_id, tuple(r._sig)) for r in spark.read.parquet(sigs).collect()
    } == before
    assert {
        r.doc_id for r in spark.read.parquet(surv).collect()
    } == {1, 2, 4}

    # drifted SKETCH params refuse at maintainer construction (manifest)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="refusing to continue"):
        run(str(tmp_path / "ck3"), num_hashes=16)

    # threshold is gate POLICY, not sketch identity — a resumed run may
    # tune it without invalidating the store (full redelivery at the new
    # threshold yields the same survivors on this fixture)
    run(str(tmp_path / "ck4"), threshold=0.6)
    assert {
        r.doc_id for r in spark.read.parquet(surv).collect()
    } == {1, 2, 4}


def test_maintain_minhash_dedup_duplicate_ids_in_batch(spark, tmp_path):
    """An id appearing twice WITHIN a batch: identical texts collapse to
    one store row (and the survivors artifact keeps both payload rows —
    per-row independence, the churn-artifact policy); texts that sketch
    DIFFERENTLY raise instead of nondeterministically picking one, and
    the failing batch publishes no partitions."""
    import os

    import pytest

    from colnade_spark.operators import dedup

    base = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through the quiet green field toward the distant river bank"
    )
    other = (
        "completely different content describing spark execution engines "
        "shuffles partitions and adaptive planning internals in detail"
    )

    def run(rows, tag):
        src = str(tmp_path / f"src_{tag}")
        sigs = str(tmp_path / f"sigs_{tag}")
        surv = str(tmp_path / f"surv_{tag}")
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).coalesce(1).write.parquet(src)
        stream = (
            spark.readStream.schema("doc_id long, text string").parquet(src)
        )
        q = dedup.maintain_minhash_dedup(
            stream, sigs, surv, str(tmp_path / f"ck_{tag}"),
            threshold=0.5, num_hashes=32, bands=8,
        )
        return q, sigs, surv

    # identical repeats collapse in the store, fan out in survivors
    q, sigs, surv = run([(1, base), (1, base), (2, other)], "dup_ok")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    stored = [r.doc_id for r in spark.read.parquet(sigs).collect()]
    assert sorted(stored) == [1, 2]
    survived = [r.doc_id for r in spark.read.parquet(surv).collect()]
    assert sorted(survived) == [1, 1, 2]

    # conflicting texts for one id raise; nothing is published
    q, sigs, surv = run([(1, base), (1, other)], "dup_conflict")
    try:
        with pytest.raises(Exception, match="conflicting"):
            q.processAllAvailable()
            q.awaitTermination()
    finally:
        q.stop()
    assert not os.path.exists(f"{sigs}/batch_id=0")
    assert not os.path.exists(f"{surv}/batch_id=0")


def test_compact_corpus_fingerprints_preserves_gating(spark, tmp_path):
    """Compaction collapses the batch history to one pre-resolved epoch
    partition labeled with the max compacted batch id; after the caller
    swaps directories (quiesced), the SAME checkpoint keeps streaming and
    the next batch gates exactly as it would have against the
    uncompacted history."""
    import shutil

    from pyspark.sql import functions as F

    from colnade_spark.operators import report

    src = str(tmp_path / "src")
    table = str(tmp_path / "fps")
    churn = str(tmp_path / "churn")
    ck = str(tmp_path / "ck")
    first = spark.createDataFrame([(1, "one"), (2, "two")], ["doc_id", "text"])
    second = spark.createDataFrame(
        [(2, "two v2"), (3, "three")], ["doc_id", "text"]
    )
    _write_ingest(first, src, 0)
    _write_ingest(second, src, 1)

    def run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = report.maintain_corpus_churn(stream, table, churn, ck)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run()
    want_resolved = {
        (r.doc_id, r._mcc_fp)
        for r in spark.read.parquet(table)
        .groupBy("doc_id")
        .agg(F.max_by("_mcc_fp", "batch_id").alias("_mcc_fp"))
        .collect()
    }
    dest = str(tmp_path / "fps_compacted")
    out = report.compact_corpus_fingerprints(spark, table, dest)
    # batch 1 is the trailing partition: NEVER folded (it could be an
    # uncommitted batch after a crash) — carried verbatim; epoch = 0
    assert out == {"rows": 2, "epoch": 0, "carried_batch": 1, "source_batches": 1}
    got_resolved = {
        (r.doc_id, r._mcc_fp)
        for r in spark.read.parquet(dest)
        .groupBy("doc_id")
        .agg(F.max_by("_mcc_fp", "batch_id").alias("_mcc_fp"))
        .collect()
    }
    assert got_resolved == want_resolved
    # a reused dest directory is refused (stale epoch partitions would
    # ride into the swap)
    import pytest

    with pytest.raises(ValueError, match="already exists"):
        report.compact_corpus_fingerprints(spark, table, dest)

    # quiesced swap, then a third ingest continues on the SAME checkpoint
    shutil.rmtree(table)
    shutil.move(dest, table)
    third = spark.createDataFrame(
        [(3, "three v2"), (1, "one"), (4, "four")], ["doc_id", "text"]
    )
    _write_ingest(third, src, 2)
    run()
    got2 = {
        (r.doc_id, r.status)
        for r in spark.read.parquet(f"{churn}/batch_id=2").collect()
    }
    # 3 changed, 4 added; 1 unchanged (its fp survived compaction)
    assert got2 == {(3, "changed"), (4, "added")}

    # a non-churn table is refused
    with pytest.raises(ValueError, match="manifest"):
        report.compact_corpus_fingerprints(
            spark, str(tmp_path / "src"), str(tmp_path / "fresh2")
        )


def test_compact_minhash_sigs_preserves_gating(spark, tmp_path):
    """Signature-store compaction folds all-but-trailing batch partitions
    verbatim (append-only store — union preserved, no resolution); after
    the quiesced swap the SAME checkpoint keeps deduping and a third
    batch gates exactly as against the uncompacted store."""
    import shutil

    import pytest

    from colnade_spark.operators import dedup

    base = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through the quiet green field toward the distant river bank "
        "every single morning"
    )
    other = (
        "completely different content describing spark execution engines "
        "shuffles partitions and adaptive query planning internals in "
        "great detail for testing"
    )
    first = spark.createDataFrame([(1, base)], ["doc_id", "text"])
    second = spark.createDataFrame([(2, other)], ["doc_id", "text"])
    src = str(tmp_path / "src")
    _write_ingest(first, src, 0)
    _write_ingest(second, src, 1)
    sigs = str(tmp_path / "sigs")
    surv = str(tmp_path / "surv")
    ck = str(tmp_path / "ck")

    def run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = dedup.maintain_minhash_dedup(
            stream, sigs, surv, ck, threshold=0.5, num_hashes=32, bands=8
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run()
    want_rows = {
        (r.doc_id, tuple(r._sig)) for r in spark.read.parquet(sigs).collect()
    }
    dest = str(tmp_path / "sigs_compacted")
    out = dedup.compact_minhash_sigs(spark, sigs, dest)
    assert out == {
        "rows": 1, "epoch": 0, "carried_batch": 1, "source_batches": 1
    }
    # verbatim fold: the union of rows is unchanged
    assert {
        (r.doc_id, tuple(r._sig)) for r in spark.read.parquet(dest).collect()
    } == want_rows

    # quiesced swap, then a third ingest continues on the SAME checkpoint:
    # a near-dup of stored doc 1 must still be dropped, a fresh doc kept
    shutil.rmtree(sigs)
    shutil.move(dest, sigs)
    third = spark.createDataFrame(
        [
            (3, base.replace("quiet", "silent")),
            (4, "a wholly new document about tokenizer vocabularies and "
                "merge rules in language model training pipelines today"),
        ],
        ["doc_id", "text"],
    )
    _write_ingest(third, src, 2)
    run()
    got2 = {
        r.doc_id for r in spark.read.parquet(f"{surv}/batch_id=2").collect()
    }
    assert got2 == {4}

    # a single-partition store has nothing to compact (trailing partition
    # is never folded)
    single = str(tmp_path / "single")
    ck2 = str(tmp_path / "ck_single")
    src2 = str(tmp_path / "src2")
    _write_ingest(first, src2, 0)
    stream2 = (
        spark.readStream.schema("doc_id long, text string").parquet(src2)
    )
    q2 = dedup.maintain_minhash_dedup(
        stream2, single, str(tmp_path / "surv2"), ck2,
        threshold=0.5, num_hashes=32, bands=8,
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    with pytest.raises(ValueError, match="nothing to compact"):
        dedup.compact_minhash_sigs(
            spark, single, str(tmp_path / "fresh_dest")
        )


def test_maintain_corpus_churn_rejects_conflicting_batch_fps(spark, tmp_path):
    """An id with two DISTINCT fingerprints inside one micro-batch has no
    well-defined 'current' state — the maintainer raises instead of
    picking one, INCLUDING when one of the two is NULL (count_distinct
    alone would skip NULLs and silently bless max(fp)); and the failing
    batch publishes NO churn partition (fps are written/validated first).
    Identical repeats collapse fine."""
    import os

    import pytest

    from colnade_spark.operators import report

    cases = [
        ("plain", [(1, "one"), (1, "uno"), (2, "two")]),
        ("null_vs_value", [(1, None), (1, "uno"), (2, "two")]),
    ]
    for name, rows in cases:
        src = str(tmp_path / f"src_{name}")
        churn = str(tmp_path / f"churn_{name}")
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).coalesce(1).write.parquet(src)
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        q = report.maintain_corpus_churn(
            stream,
            str(tmp_path / f"fps_{name}"),
            churn,
            str(tmp_path / f"ck_{name}"),
        )
        try:
            with pytest.raises(Exception, match="conflicting"):
                q.processAllAvailable()
                q.awaitTermination()
        finally:
            q.stop()
        assert not os.path.exists(
            f"{churn}/batch_id=0"
        ), f"{name}: a never-committing batch published churn rows"

    # an id whose fp is ONLY NULL (e.g. NULL text everywhere) is not a
    # conflict — it flows through and gates null-safely
    src = str(tmp_path / "src_nullonly")
    spark.createDataFrame(
        [(1, None), (1, None), (2, "two")], "doc_id long, text string"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = report.maintain_corpus_churn(
        stream,
        str(tmp_path / "fps_nullonly"),
        str(tmp_path / "churn_nullonly"),
        str(tmp_path / "ck_nullonly"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    by_id = {
        r.doc_id: r._mcc_fp
        for r in spark.read.parquet(str(tmp_path / "fps_nullonly")).collect()
    }
    assert set(by_id) == {1, 2} and by_id[1] is None and by_id[2] is not None


def test_maintain_corpus_churn_rejects_payload_name_clashes_at_start(
    spark, tmp_path
):
    """A payload column named like the churn status (or any staging name
    the per-batch paths write) fails AT CALL TIME — not on batch 1 after
    batch 0 already committed a clobbered churn partition (the first
    batch bypasses changed_rows_gate and with it the gate's own guard)."""
    import pytest

    from colnade_spark.operators import report

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "one", "keep")], ["doc_id", "text", "status"]
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, text string, status string"
    ).parquet(src)
    with pytest.raises(ValueError, match="status"):
        report.maintain_corpus_churn(
            stream,
            str(tmp_path / "fps"),
            str(tmp_path / "churn"),
            str(tmp_path / "ck"),
        )
    # a different status_col name unblocks the same stream
    q = report.maintain_corpus_churn(
        stream,
        str(tmp_path / "fps"),
        str(tmp_path / "churn"),
        str(tmp_path / "ck"),
        status_col="churn_status",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(str(tmp_path / "churn"))
    assert set(got.columns) == {"doc_id", "text", "status", "churn_status", "batch_id"}
    row = got.collect()[0]
    assert row.status == "keep" and row.churn_status == "added"


def test_pq_residual_screen_gate_is_stateless_on_streams(spark, sf_dir):
    """The residual-index screen is the same stateless scan shape as
    the raw-code screen (encode UDF + literal q·c array + literal LUT
    gets + filter): a streamed embeddings source keeps exactly the ids
    the batch gate keeps."""
    from pyspark.sql import functions as F

    from colnade_spark.operators.pq import (
        pq_residual_screen_gate,
        train_residual_codebooks,
    )
    from colnade_spark.streaming import scan_stream_parquet
    from colnade_spark.tpch import Embeddings

    batch = spark.read.parquet(table_path(sf_dir, "embeddings"))
    cents = [
        [((((j * 31) + (d * 17)) % 7) - 3) / 4.0 for d in range(64)]
        for j in range(4)
    ]
    books = train_residual_codebooks(
        batch, cents, m=16, ksub=32, sample_n=512, seed=11
    )
    bench = [
        r.embedding
        for r in batch.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
    ]

    def gate(d):
        return pq_residual_screen_gate(
            d.select("vec_id", "embedding"), bench, books, cents,
            threshold=0.55,
        ).select("vec_id")

    sf = scan_stream_parquet(
        table_path(sf_dir, "embeddings"), Embeddings, spark=spark
    )
    name = f"t_{uuid.uuid4().hex[:8]}"
    _await(sf.with_raw(gate).to_memory_sink(name, output_mode="append"))
    got = {r.vec_id for r in spark.table(name).collect()}
    want = {r.vec_id for r in gate(batch).collect()}
    assert got == want and 0 < len(got) < batch.count()


def test_prototypicality_is_stateless_on_streams(spark, sf_dir):
    """Prototypicality scoring against frozen centroids is a pure
    scan-side projection (literal centroids, integer-scaled IEEE fold):
    a streamed embeddings source scores every row exactly as the batch
    path does in append mode with NO streaming state — the pruning
    decision can ride an ingest (with a precomputed distance threshold)
    the same way the frozen-DSIR and PQ-screen gates do."""
    from colnade_spark.operators.clustering import kmeans, prototypicality
    from colnade_spark.streaming import scan_stream_parquet
    from colnade_spark.tpch import Embeddings

    batch = spark.read.parquet(table_path(sf_dir, "embeddings"))
    _, cents = kmeans(batch, k=4, iters=1, return_centroids=True)

    def score(d):
        return prototypicality(
            d.select("vec_id", "embedding"), cents
        ).select("vec_id", "cluster", "proto_dist")

    sf = scan_stream_parquet(
        table_path(sf_dir, "embeddings"), Embeddings, spark=spark
    )
    name = f"t_{uuid.uuid4().hex[:8]}"
    _await(sf.with_raw(score).to_memory_sink(name, output_mode="append"))
    got = {r.vec_id: (r.cluster, r.proto_dist) for r in spark.table(name).collect()}
    want = {r.vec_id: (r.cluster, r.proto_dist) for r in score(batch).collect()}
    assert got == want and len(got) == batch.count()


def test_code_quality_signals_are_stateless_on_streams(spark, sf_dir):
    """The Stack/StarCoder file filters are a pure scan-side projection
    (line splits + regex counts): a streamed corpus scores exactly as
    the batch path in append mode with no streaming state — the code
    ingest gate shape."""
    from colnade_spark.operators.quality import code_quality_signals
    from colnade_spark.streaming import scan_stream_parquet
    from colnade_spark.tpch import Documents

    batch = spark.read.parquet(table_path(sf_dir, "documents"))

    def score(d):
        return code_quality_signals(d.select("doc_id", "text"))

    sf = scan_stream_parquet(
        table_path(sf_dir, "documents"), Documents, spark=spark
    )
    name = f"t_{uuid.uuid4().hex[:8]}"
    _await(sf.with_raw(score).to_memory_sink(name, output_mode="append"))
    got = {r.doc_id: (r.keep, r.n_lines, r.flag_long_lines)
           for r in spark.table(name).collect()}
    want = {r.doc_id: (r.keep, r.n_lines, r.flag_long_lines)
            for r in score(batch).collect()}
    assert got == want and len(got) == batch.count()


def test_read_batched_history_first_batch_vs_corrupt_store(spark, tmp_path):
    """The maintainer history probe (ADVICE r6): a store directory that
    is absent, or holds only the params manifest, reads as first-batch
    (None); a store WITH batch partitions reads normally; and a store
    whose batch partition is unreadable RAISES instead of silently
    degrading to an empty history (which would admit near-duplicates /
    mislabel churn)."""
    import pytest as _pytest

    from colnade_spark.streaming.stream import (
        read_batched_history,
        write_table_manifest,
    )

    store = str(tmp_path / "store")
    # absent directory -> first batch
    assert read_batched_history(spark, store) is None

    # manifest-only directory (the maintainer writes it at setup,
    # before any batch) -> still first batch
    write_table_manifest(spark, store, {"kind": "t"})
    assert read_batched_history(spark, store) is None

    # a real batch partition -> rows come back
    spark.createDataFrame([(1, 10)], ["doc_id", "v"]).write.parquet(
        f"{store}/batch_id=0"
    )
    hist = read_batched_history(spark, store)
    assert hist is not None and hist.count() == 1

    # corrupt the partition's parquet files: the probe sees batch
    # partitions, so the read failure must PROPAGATE, not read as None
    import pathlib

    part = pathlib.Path(store) / "batch_id=0"
    for f in part.glob("*.parquet"):
        f.write_bytes(b"not a parquet file at all")
    with _pytest.raises(Exception):
        df = read_batched_history(spark, store)
        # schema inference may survive on the footer-less bytes only if
        # lazily deferred — force evaluation so either stage may raise
        if df is not None:
            df.collect()


def test_maintain_fertility_table_matches_batch_and_replays(
    spark, sf_dir, tmp_path
):
    """Maintained per-language fertility datasheet: per micro-batch the
    maintainer persists the mergeable sums; merging the whole history
    equals ONE fertility_stats pass over everything ever streamed
    (bit-exact, ratios included); a full re-run from a fresh checkpoint
    leaves the table identical (overwrite-own-partition idempotence);
    a resumed run whose text column drifted refuses at the manifest."""
    import pytest as _pytest

    from colnade_spark.operators.text import (
        fertility_stats,
        maintain_fertility_table,
        merge_fertility_table,
    )
    from colnade_spark.tpch import table_path as _tp

    docs = spark.read.parquet(_tp(sf_dir, "documents"))
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "src")
    _write_ingest(first, src, 0)
    _write_ingest(second, src, 1)

    table = str(tmp_path / "fert")

    def run(ck: str, **over):
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = maintain_fertility_table(stream, table, ck, **over)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(str(tmp_path / "ck1"))

    def snap():
        return {
            tuple(r)
            for r in merge_fertility_table(
                spark.read.parquet(table)
            ).collect()
        }

    got = snap()
    want = {tuple(r) for r in fertility_stats(docs).collect()}
    assert got == want and len(got) == 5  # 5 langs, ratios bit-equal

    # idempotent replay from a fresh checkpoint
    raw_before = {
        tuple(r) for r in spark.read.parquet(table).collect()
    }
    run(str(tmp_path / "ck2"))
    assert {
        tuple(r) for r in spark.read.parquet(table).collect()
    } == raw_before
    assert snap() == want

    # drifted column config refuses at the manifest
    with _pytest.raises(ValueError, match="refusing to continue"):
        run(str(tmp_path / "ck3"), text_col="lang")


def test_compact_fertility_table_preserves_datasheet(spark, sf_dir, tmp_path):
    """Compaction folds all-but-trailing batch partitions into one
    RE-SUMMED epoch partition: the merged datasheet is unchanged, the
    epoch body is |languages| rows, and the maintainer can continue
    appending to the compacted table (manifest carried over)."""
    from colnade_spark.operators.text import (
        compact_fertility_table,
        fertility_stats,
        maintain_fertility_table,
        merge_fertility_table,
    )
    from colnade_spark.tpch import table_path as _tp

    docs = spark.read.parquet(_tp(sf_dir, "documents"))
    src = str(tmp_path / "src")
    for i, m in enumerate((0, 1, 2)):
        _write_ingest(docs.filter(F.col("doc_id") % 3 == m), src, i)

    table = str(tmp_path / "fert")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = maintain_fertility_table(stream, table, str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    want = {tuple(r) for r in fertility_stats(docs).collect()}
    dest = str(tmp_path / "fert2")
    out = compact_fertility_table(spark, table, dest)
    assert out["epoch"] == 1 and out["carried_batch"] == 2
    assert out["rows"] == 5  # re-summed to one row per language
    assert {
        tuple(r) for r in merge_fertility_table(spark.read.parquet(dest)).collect()
    } == want


def test_blend_frozen_gate_is_stateless_on_streams(spark, sf_dir):
    """Frozen-quantile blending is a stream-static broadcast join plus a
    scan-side fold — no window, no state: a streamed documents source
    scores identically to batch. The exact percent_rank blend is NOT
    stream-legal (global rank over the whole partition); this is its
    documented streaming stand-in (SCALE.md)."""
    from colnade_spark.operators.quality import (
        blend_quality_frozen,
        fit_blend_quantiles,
    )
    from colnade_spark.streaming import scan_stream_parquet
    from colnade_spark.tpch import Documents

    batch = spark.read.parquet(table_path(sf_dir, "documents"))
    weights = {"n_chars": 1.0}
    model = fit_blend_quantiles(batch, ["n_chars"], "lang", n_quantiles=20)

    def gate(d):
        return blend_quality_frozen(
            d.select("doc_id", "lang", "n_chars"), weights, model, "lang"
        ).filter(F.col("blended_score") >= 0.5)

    sf = scan_stream_parquet(table_path(sf_dir, "documents"), Documents, spark=spark)
    name = f"t_{uuid.uuid4().hex[:8]}"
    _await(sf.with_raw(gate).to_memory_sink(name, output_mode="append"))
    got = {(r.doc_id, r.blended_score) for r in spark.table(name).collect()}
    want = {(r.doc_id, r.blended_score) for r in gate(batch).collect()}
    assert got == want and 0 < len(got) < batch.count()


def test_curation_attribution_is_stateless_on_streams(spark, sf_dir):
    """First-fired funnel attribution against STATIC gate frames is
    stateless (ids-only stream-static joins + a scan-side CASE): a
    streamed documents source attributes exactly as batch. Only the
    funnel's count/window tail needs the maintainer."""
    from colnade_spark.operators.report import curation_attribution
    from colnade_spark.streaming import scan_stream_parquet
    from colnade_spark.tpch import Documents

    batch = spark.read.parquet(table_path(sf_dir, "documents"))
    gates = {
        "short": batch.filter(F.col("n_chars") < 150).select("doc_id"),
        "mod7": batch.filter(F.col("doc_id") % 7 == 0).select("doc_id"),
    }

    def attr(d):
        return curation_attribution(d, gates)

    sf = scan_stream_parquet(table_path(sf_dir, "documents"), Documents, spark=spark)
    name = f"t_{uuid.uuid4().hex[:8]}"
    _await(sf.with_raw(attr).to_memory_sink(name, output_mode="append"))
    got = {(r.doc_id, r.stage_idx) for r in spark.table(name).collect()}
    want = {(r.doc_id, r.stage_idx) for r in attr(batch).collect()}
    assert got == want and len(got) == batch.count()
    assert {s for _, s in got} == {0, 1, 2}  # both gates fire; survivors exist


def test_maintain_funnel_counts_matches_batch_and_replays(
    spark, sf_dir, tmp_path
):
    """Maintained funnel counts: merging the per-batch attribution count
    partitions equals ONE batch curation_funnel over everything ever
    streamed (associative sums); replay from a fresh checkpoint is
    idempotent; a resumed run whose stage CHAIN drifted refuses at the
    manifest."""
    import pytest as _pytest

    from colnade_spark.operators.report import (
        curation_funnel,
        maintain_funnel_counts,
        merge_funnel_counts,
    )
    from colnade_spark.tpch import table_path as _tp

    docs = spark.read.parquet(_tp(sf_dir, "documents"))
    gates = {
        "short": docs.filter(F.col("n_chars") < 150).select("doc_id"),
        "mod7": docs.filter(F.col("doc_id") % 7 == 0).select("doc_id"),
    }
    src = str(tmp_path / "src")
    _write_ingest(docs.filter(F.col("doc_id") % 2 == 0), src, 0)
    _write_ingest(docs.filter(F.col("doc_id") % 2 == 1), src, 1)

    table = str(tmp_path / "funnel")

    def run(ck: str, stages=gates):
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = maintain_funnel_counts(stream, stages, table, ck)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(str(tmp_path / "ck1"))

    got = {tuple(r) for r in merge_funnel_counts(spark, table).collect()}
    want = {tuple(r) for r in curation_funnel(docs, gates).collect()}
    assert got == want and len(got) == 2

    # idempotent replay
    run(str(tmp_path / "ck2"))
    assert {
        tuple(r) for r in merge_funnel_counts(spark, table).collect()
    } == want

    # drifted stage chain (reordered names) refuses at the manifest
    with _pytest.raises(ValueError, match="refusing to continue"):
        run(
            str(tmp_path / "ck3"),
            stages={"mod7": gates["mod7"], "short": gates["short"]},
        )


def test_merge_funnel_counts_before_first_batch_is_all_zero(spark, tmp_path):
    """A registered maintainer whose stream has not committed a batch
    yet merges to a valid all-zero datasheet (the manifest is there,
    the history is not) — not a cryptic parquet read error."""
    from colnade_spark.operators.report import merge_funnel_counts
    from colnade_spark.streaming.stream import write_table_manifest

    table = str(tmp_path / "funnel")
    write_table_manifest(
        spark, table, {"kind": "funnel_counts", "stages": ["a", "b"], "id_col": "doc_id"}
    )
    rows = {r.stage: (r.n_in, r.n_dropped, r.n_out) for r in merge_funnel_counts(spark, table).collect()}
    assert rows == {"a": (0, 0, 0), "b": (0, 0, 0)}


def test_maintain_drift_reports_per_batch(spark, sf_dir, tmp_path):
    """Streaming drift monitoring vs a FROZEN baseline: each batch's
    partition equals psi_against_baseline over exactly that batch
    (per-batch reports, nothing merged — PSI is not associative);
    replay from a fresh checkpoint is idempotent; a resumed run with
    drifted bin edges refuses at the manifest."""
    import pytest as _pytest

    from colnade_spark.operators.report import (
        fit_psi_baseline,
        maintain_drift_reports,
        psi_against_baseline,
    )
    from colnade_spark.tpch import table_path as _tp

    docs = spark.read.parquet(_tp(sf_dir, "documents"))
    base = fit_psi_baseline(
        docs, "n_chars", (100, 200, 300), group_col="lang"
    )
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "src")
    _write_ingest(b0, src, 0)
    _write_ingest(b1, src, 1)

    table = str(tmp_path / "drift")

    def run(ck: str, edges=(100, 200, 300)):
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = maintain_drift_reports(
            stream, base, table, ck, "n_chars", edges, "lang"
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(str(tmp_path / "ck1"))
    for bid, batch in ((0, b0), (1, b1)):
        got = {
            tuple(r)
            for r in spark.read.parquet(f"{table}/batch_id={bid}").collect()
        }
        want = {
            tuple(r)
            for r in psi_against_baseline(
                batch, base, "n_chars", (100, 200, 300), "lang"
            ).collect()
        }
        assert got == want and len(got) > 0

    raw = {tuple(r) for r in spark.read.parquet(table).collect()}
    run(str(tmp_path / "ck2"))  # idempotent replay
    assert {tuple(r) for r in spark.read.parquet(table).collect()} == raw

    with _pytest.raises(ValueError, match="refusing to continue"):
        run(str(tmp_path / "ck3"), edges=(100, 250, 300))


def test_maintain_drift_reports_refuses_drifted_baseline(
    spark, sf_dir, tmp_path
):
    """The maintainer manifest fingerprints the BASELINE COUNTS, not
    just the binning params: a resumed run whose baseline was refit on a
    different reference snapshot (identical edges/value_col/group_col —
    the subtle mix the param pins alone would miss) refuses at the
    manifest; resuming with the same baseline object proceeds."""
    import os

    import pytest as _pytest

    from colnade_spark.operators.report import (
        fit_psi_baseline,
        maintain_drift_reports,
    )
    from colnade_spark.tpch import table_path as _tp

    docs = spark.read.parquet(_tp(sf_dir, "documents"))
    base = fit_psi_baseline(docs, "n_chars", (100, 200), group_col="lang")
    drifted = fit_psi_baseline(
        docs.filter(F.col("doc_id") % 3 == 0),
        "n_chars",
        (100, 200),
        group_col="lang",
    )
    assert drifted["edges"] == base["edges"]
    assert drifted["counts"] != base["counts"]
    src = str(tmp_path / "src")
    _write_ingest(docs.filter(F.col("doc_id") % 2 == 0), src, 0)
    table = str(tmp_path / "drift")

    def run(ck: str, baseline: dict):
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = maintain_drift_reports(
            stream, baseline, table, ck, "n_chars", (100, 200), "lang"
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(str(tmp_path / "ck1"), base)
    # same baseline resumes and appends the next batch's report
    _write_ingest(docs.filter(F.col("doc_id") % 2 == 1), src, 1)
    run(str(tmp_path / "ck1"), base)
    parts = {d for d in os.listdir(table) if d.startswith("batch_id=")}
    assert parts == {"batch_id=0", "batch_id=1"}
    # a drifted baseline refuses BEFORE any batch is scored against it
    with _pytest.raises(ValueError, match="refusing to continue"):
        run(str(tmp_path / "ck2"), drifted)


def test_maintain_blend_drift_per_batch(spark, sf_dir, tmp_path):
    """Streaming blend-drift monitoring vs TWO frozen artifacts (the
    quantile blend model + the PSI baseline): each batch's partition
    equals blend_drift_frozen over exactly that batch (per-batch
    reports, nothing merged — PSI is not associative); replay from a
    fresh checkpoint is idempotent; a resumed run whose blend model was
    REFIT on a different snapshot (same shape parameters, different
    edge values — the subtle mix the shape pins alone would miss)
    refuses at the manifest."""
    import pytest as _pytest

    from colnade_spark.operators.quality import (
        blend_drift_frozen,
        blend_quality_frozen,
        fit_blend_quantiles,
        maintain_blend_drift,
    )
    from colnade_spark.operators.report import fit_psi_baseline
    from colnade_spark.tpch import table_path as _tp

    docs = spark.read.parquet(_tp(sf_dir, "documents")).select(
        "doc_id", "lang", F.col("n_chars").cast("double").alias("s1")
    )
    weights = {"s1": 1.0}
    model = fit_blend_quantiles(docs, ["s1"], "lang", n_quantiles=10)
    base = fit_psi_baseline(
        blend_quality_frozen(docs, weights, model, "lang"),
        "blended_score",
        (0.2, 0.4, 0.6, 0.8),
        group_col="lang",
    )
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "src")
    _write_ingest(b0, src, 0)
    _write_ingest(b1, src, 1)

    table = str(tmp_path / "blend_drift")

    def run(ck: str, m: list[dict] | None = None):
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = maintain_blend_drift(
            stream,
            weights,
            m if m is not None else model,
            base,
            table,
            ck,
            domain_col="lang",
            edges=(0.2, 0.4, 0.6, 0.8),
            group_col="lang",
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(str(tmp_path / "ck1"), model)
    for bid, batch in ((0, b0), (1, b1)):
        got = {
            tuple(r)
            for r in spark.read.parquet(f"{table}/batch_id={bid}").collect()
        }
        want = {
            tuple(r)
            for r in blend_drift_frozen(
                batch,
                weights,
                model,
                base,
                "lang",
                (0.2, 0.4, 0.6, 0.8),
                "lang",
            ).collect()
        }
        assert got == want and len(got) > 0

    raw = {tuple(r) for r in spark.read.parquet(table).collect()}
    run(str(tmp_path / "ck2"))  # idempotent replay
    assert {tuple(r) for r in spark.read.parquet(table).collect()} == raw

    refit = fit_blend_quantiles(
        docs.filter(F.col("doc_id") % 3 == 0), ["s1"], "lang", n_quantiles=10
    )
    assert refit != model
    with _pytest.raises(ValueError, match="refusing to continue"):
        run(str(tmp_path / "ck3"), refit)


def test_maintain_source_overlap_merges_to_batch_matrix(
    spark, sf_dir, tmp_path
):
    """Maintained cross-source overlap: per micro-batch the maintainer
    persists the batch's distinct (source, fingerprint) pairs; the
    merged store equals ONE source_overlap_matrix pass over everything
    ever streamed (bit-exact, jaccard included — set union of distinct
    pairs is associative and idempotent); replay from a fresh
    checkpoint is idempotent; a resumed run whose key column drifted
    refuses at the manifest; a registered-but-no-batch store merges to
    a valid EMPTY matrix."""
    import pytest as _pytest

    from colnade_spark.operators.report import (
        maintain_source_overlap,
        merge_overlap_store,
        overlap_fingerprints,
        source_overlap_matrix,
    )
    from colnade_spark.streaming.stream import write_table_manifest
    from colnade_spark.tpch import table_path as _tp

    d = spark.read.parquet(_tp(sf_dir, "documents"))
    # the fixture has no exact cross-source duplicates at small SFs:
    # build the source_overlap_docs three-source corpus (mirror sources
    # whose mangled texts normalize to identical fingerprints)
    base = d.select("doc_id", "text", F.lit("full").alias("source"))
    mirror = d.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.upper("text"), F.lit("!!!")).alias("text"),
        F.lit("mirror_even").alias("source"),
    )
    third = d.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.lit("   "), F.col("text")).alias("text"),
        F.lit("mirror_third").alias("source"),
    )
    docs = base.unionByName(mirror).unionByName(third)
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "src")
    _write_ingest(first, src, 0)
    _write_ingest(second, src, 1)

    table = str(tmp_path / "overlap")

    def run(ck: str, **over):
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = maintain_source_overlap(stream, table, ck, **over)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(str(tmp_path / "ck1"))

    # per-batch partition = that batch's own distinct pairs
    got0 = {
        tuple(r)
        for r in spark.read.parquet(f"{table}/batch_id=0").collect()
    }
    want0 = {tuple(r) for r in overlap_fingerprints(first).collect()}
    assert got0 == want0 and len(got0) > 0

    # merged store = one-pass matrix over the whole corpus
    want = {tuple(r) for r in source_overlap_matrix(docs).collect()}
    got = {tuple(r) for r in merge_overlap_store(spark, table).collect()}
    assert got == want and len(got) > 0

    # idempotent replay
    raw = {tuple(r) for r in spark.read.parquet(table).collect()}
    run(str(tmp_path / "ck2"))
    assert {tuple(r) for r in spark.read.parquet(table).collect()} == raw

    # drifted key config refuses at the manifest
    with _pytest.raises(ValueError, match="refusing to continue"):
        run(str(tmp_path / "ck3"), key_col="lang")

    # manifest-only store -> empty matrix, not a read error
    empty = str(tmp_path / "empty")
    write_table_manifest(
        spark,
        empty,
        {"kind": "overlap_fps", "group_col": "source", "text_col": "text",
         "key_col": None},
    )
    assert merge_overlap_store(spark, empty).count() == 0
    # and a non-overlap store refuses by kind
    with _pytest.raises(ValueError, match="overlap_fps manifest"):
        merge_overlap_store(spark, str(tmp_path / "nowhere"))


def test_compact_overlap_table_preserves_matrix(spark, sf_dir, tmp_path):
    """Compaction folds all-but-trailing batch partitions into one
    DISTINCT-ed epoch partition: the merged matrix is unchanged, and
    pairs re-streamed across the folded batches collapse to one row
    (the store stops growing with |batches| for recurring content)."""
    from colnade_spark.operators.report import (
        compact_overlap_table,
        maintain_source_overlap,
        merge_overlap_store,
        source_overlap_matrix,
    )
    from colnade_spark.tpch import table_path as _tp

    d = spark.read.parquet(_tp(sf_dir, "documents"))
    docs = d.select("doc_id", "text", F.lit("full").alias("source")).unionByName(
        d.filter(F.col("doc_id") % 2 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.upper("text"), F.lit("!!!")).alias("text"),
            F.lit("mirror_even").alias("source"),
        )
    )
    src = str(tmp_path / "src")
    # batches 0 and 1 share the mod-0 slice: cross-batch duplicate pairs
    # that only the distinct-fold can collapse
    _write_ingest(docs.filter(F.col("doc_id") % 3 <= 1), src, 0)
    _write_ingest(docs.filter(F.col("doc_id") % 3 != 1), src, 1)
    _write_ingest(docs.filter(F.col("doc_id") % 3 == 2), src, 2)

    table = str(tmp_path / "overlap")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = maintain_source_overlap(stream, table, str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    want = {tuple(r) for r in source_overlap_matrix(docs).collect()}
    dest = str(tmp_path / "overlap2")
    out = compact_overlap_table(spark, table, dest)
    assert out["epoch"] == 1 and out["carried_batch"] == 2
    # the epoch body is the DISTINCT pair set of batches 0+1 — smaller
    # than their concatenation (they overlap on the mod-0 slice)
    raw01 = (
        spark.read.parquet(table)
        .filter(F.col("batch_id") <= 1)
        .count()
    )
    assert out["rows"] < raw01
    assert {
        tuple(r) for r in merge_overlap_store(spark, dest).collect()
    } == want


def test_maintain_corpus_card_matches_batch_and_replays(
    spark, sf_dir, tmp_path
):
    """Maintained corpus card: per micro-batch the maintainer persists
    the mergeable size histogram; the merged card equals ONE
    corpus_card_binned pass over everything ever streamed (bit-exact —
    sums are associative and the quantile tail is shared code); the
    exact corpus_card's quantiles sit at-or-below the binned upper
    bounds; replay from a fresh checkpoint is idempotent; a resumed
    run with drifted edges refuses at the manifest; a manifest-only
    store merges to a valid EMPTY card."""
    import pytest as _pytest

    from colnade_spark.operators.report import (
        corpus_card,
        corpus_card_binned,
        maintain_corpus_card,
        merge_corpus_card,
    )
    from colnade_spark.streaming.stream import write_table_manifest
    from colnade_spark.tpch import table_path as _tp

    docs = spark.read.parquet(_tp(sf_dir, "documents"))
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "src")
    _write_ingest(first, src, 0)
    _write_ingest(second, src, 1)

    table = str(tmp_path / "card")
    edges = (100, 200, 300, 400, 500)

    def run(ck: str, e=edges):
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = maintain_corpus_card(
            stream, table, ck, "lang", "n_chars", e
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(str(tmp_path / "ck1"))

    got = {tuple(r) for r in merge_corpus_card(spark, table).collect()}
    want = {
        tuple(r)
        for r in corpus_card_binned(
            docs, "lang", "n_chars", edges
        ).collect()
    }
    assert got == want and len(got) == 5

    # exact quantiles are contained by the binned upper bounds
    exact = {
        r.lang: (r.n_docs, r.total_size, r.q_50, r.q_90)
        for r in corpus_card(docs, "lang", "n_chars").collect()
    }
    for r in merge_corpus_card(spark, table).collect():
        n, t, q50, q90 = exact[r[0]]
        assert (r.n_docs, r.total_size) == (n, t)
        assert r.q_50_le is None or q50 <= r.q_50_le
        assert r.q_90_le is None or q90 <= r.q_90_le

    raw = {tuple(r) for r in spark.read.parquet(table).collect()}
    run(str(tmp_path / "ck2"))  # idempotent replay
    assert {tuple(r) for r in spark.read.parquet(table).collect()} == raw

    with _pytest.raises(ValueError, match="refusing to continue"):
        run(str(tmp_path / "ck3"), e=(100, 250, 500))

    empty = str(tmp_path / "empty")
    write_table_manifest(
        spark,
        empty,
        {"kind": "size_histogram", "group_col": "lang",
         "size_col": "n_chars", "edges": [100, 200]},
    )
    assert merge_corpus_card(spark, empty).count() == 0
    with _pytest.raises(ValueError, match="size_histogram manifest"):
        merge_corpus_card(spark, str(tmp_path / "nowhere"))


def test_maintain_corpus_card_pins_autofit_edges(spark, sf_dir, tmp_path):
    """Auto-fit edges are a FROZEN artifact: fit once (fit_size_edges,
    bounded content-addressed sample), pin via the maintain_corpus_card
    manifest, and a resumed run whose edges were REFIT on a different
    snapshot refuses at the manifest — the fit composes with the
    existing edge pinning, no new manifest machinery."""
    import pytest as _pytest

    from colnade_spark.operators.report import (
        corpus_card_binned,
        fit_size_edges,
        maintain_corpus_card,
        merge_corpus_card,
    )
    from colnade_spark.tpch import table_path as _tp

    docs = spark.read.parquet(_tp(sf_dir, "documents"))
    edges = fit_size_edges(docs, size_col="n_chars", id_col="doc_id")
    assert len(edges) == 6 and list(edges) == sorted(set(edges))

    src = str(tmp_path / "src")
    _write_ingest(docs.filter(F.col("doc_id") % 2 == 0), src, 0)
    table = str(tmp_path / "card")

    def run(ck: str, e):
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = maintain_corpus_card(stream, table, ck, "lang", "n_chars", e)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(str(tmp_path / "ck1"), edges)
    got = {tuple(r) for r in merge_corpus_card(spark, table).collect()}
    want = {
        tuple(r)
        for r in corpus_card_binned(
            docs.filter(F.col("doc_id") % 2 == 0), "lang", "n_chars", edges
        ).collect()
    }
    assert got == want and len(got) > 0

    # refit on a different snapshot -> different edges -> refusal
    refit = fit_size_edges(
        docs.filter(F.col("doc_id") % 7 == 0), size_col="n_chars"
    )
    if refit == edges:  # make the drift explicit if the fixture ties
        refit = tuple(e * 2 for e in edges)
    with _pytest.raises(ValueError, match="refusing to continue"):
        run(str(tmp_path / "ck2"), refit)


def test_maintain_source_overlap_near_merges_and_pins_sketch(
    spark, sf_dir, tmp_path
):
    """Maintained NEAR-dup overlap: the merged store equals ONE
    source_overlap_near pass over everything ever streamed (bit-exact
    — distinct band-key pairs merge by set union, the matrix tail is
    shared code); a resumed run with a drifted sketch (different
    shingle_k) refuses at the manifest; the reader refuses a store the
    maintainer never wrote."""
    import pytest as _pytest

    from colnade_spark.operators.report import (
        maintain_source_overlap_near,
        merge_overlap_near_store,
        source_overlap_near,
    )
    from colnade_spark.streaming.stream import write_table_manifest
    from colnade_spark.tpch import table_path as _tp

    d = spark.read.parquet(_tp(sf_dir, "documents")).select(
        "doc_id", "text"
    )
    base = d.select("doc_id", "text", F.lit("full").alias("source"))
    near = d.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" near duplicate tail")).alias("text"),
        F.lit("near_even").alias("source"),
    )
    allv = base.unionByName(near)
    src = str(tmp_path / "src")
    _write_ingest(base, src, 0)
    _write_ingest(near, src, 1)
    table = str(tmp_path / "overlap")
    kw = dict(num_hashes=64, bands=16, shingle_k=13)

    def run(ck: str, **over):
        stream = (
            spark.readStream.schema(base.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = maintain_source_overlap_near(
            stream, table, ck, "source", "text", **{**kw, **over}
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(str(tmp_path / "ck1"))
    got = {tuple(r) for r in merge_overlap_near_store(spark, table).collect()}
    want = {
        tuple(r)
        for r in source_overlap_near(allv, "source", "text", **kw).collect()
    }
    assert got == want and len(got) == 1  # the (full, near_even) row
    row = next(iter(got))
    assert row[4] > 0  # n_shared: the near copies DO pair

    with _pytest.raises(ValueError, match="refusing to continue"):
        run(str(tmp_path / "ck2"), shingle_k=5)

    alien = str(tmp_path / "alien")
    write_table_manifest(spark, alien, {"kind": "something_else"})
    with _pytest.raises(ValueError, match="overlap_band_keys"):
        merge_overlap_near_store(spark, alien)
