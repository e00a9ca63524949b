"""Typed operator facades: pipeline ops stay on the typed surface —
schema-preserving ops keep the schema (and revalidate), schema-changing
ops produce typed Chunks/PackedChunks frames with typed rows."""

from __future__ import annotations

import pytest

from colnade_spark import read_parquet
from colnade_spark.operators import typed
from colnade_spark.tpch import Documents, table_path


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return read_parquet(table_path(sf_dir, "documents"), Documents, spark=spark)


def test_schema_preserving_ops_keep_schema(docs):
    kept = typed.gopher_filter(docs, min_words=10, min_stopword_hits=1)
    assert kept.schema is Documents and 0 < kept.height <= docs.height
    s = typed.hash_sample(docs, 0.25, salt="s1")
    assert s.schema is Documents
    st = typed.stratified_sample(docs, "lang", k=5)
    assert st.schema is Documents
    # typed column refs still guard after the op
    assert kept.filter(Documents.n_chars > 0).height <= kept.height


def test_dedup_facades_keep_full_rows(docs):
    d1 = typed.dedup_exact(docs)
    d2 = typed.dedup_minhash(docs, threshold=0.8)
    assert d1.schema is Documents and d2.schema is Documents
    assert 0 < d2.height <= d1.height <= docs.height
    # full payload survived the join-back
    r = d2.rows()[0]
    assert isinstance(r.text, str) and r.text


def test_chunk_and_pack_typed_outputs(docs):
    chunks = typed.chunk_by_tokens(docs, chunk_size=32, overlap=8)
    assert chunks.schema is typed.Chunks
    row = chunks.sort(typed.Chunks.doc_id, typed.Chunks.chunk_id).rows()[0]
    assert row.chunk_id == 0 and row.chunk_tokens > 0
    packed = typed.pack_chunks(chunks, budget=256, n_shards=4)
    assert packed.schema is typed.PackedChunks
    assert packed.height == chunks.height
    p = packed.rows()[0]
    assert 0 <= p.shard < 4 and p.pack_offset >= 0


def test_near_dup_audit_typed_chain(docs):
    """edit_distance_pairs → duplicate_clusters stays typed end to end."""
    pairs = typed.edit_distance_pairs(docs, max_dist=16)
    assert pairs.schema is typed.DupPairs
    clusters = typed.duplicate_clusters(pairs, nodes=docs)
    assert clusters.schema is typed.Clusters
    assert clusters.height == docs.height
    r = clusters.rows()[0]
    assert isinstance(r.node, int) and isinstance(r.component, int)


def test_kmeans_typed_facade(spark, sf_dir):
    from colnade_spark import read_parquet
    from colnade_spark.tpch import Embeddings, table_path

    emb = read_parquet(table_path(sf_dir, "embeddings"), Embeddings, spark=spark)
    out = typed.kmeans(emb, k=3, iters=1)
    assert out.schema is typed.ClusterAssignments
    assert out.height == emb.height
    clusters = {r.cluster for r in out.rows()}
    assert clusters <= {0, 1, 2}


def test_span_facades(docs):
    sp = typed.duplicate_spans(docs, k=8)
    assert sp.schema is typed.SpanRows and sp.height > 0
    r = sp.rows()[0]
    assert 0 <= r.span_start <= r.span_end
    cleaned = typed.remove_duplicate_spans(docs, k=8)
    assert cleaned.schema is Documents and cleaned.height == docs.height
    # text column was replaced with the cleaned (normalized) text
    assert all(isinstance(x.text, str) for x in cleaned.rows()[:3])


def test_classifier_gate_and_upsample(docs):
    gated = typed.classifier_gate(docs, threshold=0.5, dim=4096, seed=7)
    assert gated.schema is Documents and 0 < gated.height < docs.height
    up = typed.upsample_epochs(docs, {"en": 2.0}, domain_col="lang")
    assert up.schema is Documents and up.height > docs.height


def test_bigram_pmi_typed(docs):
    pm = typed.bigram_pmi(docs, min_count=20)
    assert pm.schema is typed.PmiRows and pm.height > 0
    r = pm.rows()[0]
    assert isinstance(r.tok_a, str) and isinstance(r.pmi, float)


def test_semdedup_facades(spark, sf_dir):
    from colnade_spark import read_parquet
    from colnade_spark.tpch import Embeddings, table_path

    emb = read_parquet(table_path(sf_dir, "embeddings"), Embeddings, spark=spark)
    cents = [
        [((((j * 29) + (d * 13)) % 9) - 4) / 4.0 for d in range(64)]
        for j in range(8)
    ]
    pairs = typed.semantic_dup_pairs(emb, cents, threshold=0.3)
    assert pairs.schema is typed.SemDupPairs and pairs.height > 0
    r = pairs.rows()[0]
    assert r.id_a < r.id_b and isinstance(r.cos_sim, float)
    kept = typed.semantic_dedup(emb, cents, threshold=0.99)
    assert kept.schema is Embeddings and 0 < kept.height <= emb.height


def test_embedding_near_dups_typed_production_defaults(spark, sf_dir):
    """The production facade: occupancy-stable sizing (sized_lsh from
    one corpus count), multiprobe=2 per table, max_bucket=32 — planted
    exact copies are recovered exactly (they collide at every cell
    sizing; the fixture's max non-identical cosine is ~0.6, so at 0.95
    precision is exact too), output typed as NearDupPairs."""
    from colnade_spark import read_parquet
    from colnade_spark.dataframe import concat
    from colnade_spark.tpch import Embeddings, table_path

    emb = read_parquet(table_path(sf_dir, "embeddings"), Embeddings, spark=spark)
    copies = emb.filter(Embeddings.vec_id % 50 == 0).with_columns(
        (Embeddings.vec_id + 1_000_000).alias(Embeddings.vec_id)
    )
    allv = concat([emb, copies])
    pairs = typed.embedding_near_dups(allv, dim=64)
    assert pairs.schema is typed.NearDupPairs
    got = {(r.id_a, r.id_b) for r in pairs.rows()}
    want = {
        (r.vec_id, r.vec_id + 1_000_000)
        for r in emb.filter(Embeddings.vec_id % 50 == 0).rows()
    }
    assert got == want
    # explicit bits= skips the sizing count (fixture tier)
    fixed = typed.embedding_near_dups(allv, dim=64, bits=8, multiprobe=0)
    assert {(r.id_a, r.id_b) for r in fixed.rows()} == want
    # refine_frac without bits would silently de-target the sizing
    import pytest

    with pytest.raises(ValueError, match="refine_frac without bits"):
        typed.embedding_near_dups(allv, dim=64, refine_frac=0.5)


def test_dsir_facades(docs):
    target = docs.filter(Documents.lang == "en")
    w = typed.dsir_weights(docs, target, buckets=128)
    assert w.schema is typed.DsirWeights and w.height == docs.height
    picked = typed.dsir_sample(docs, target, k=25, buckets=128)
    assert picked.schema is Documents and picked.height == 25
    # full payload survived the join-back
    assert isinstance(picked.rows()[0].text, str)


def test_canonical_map_facade(spark, docs):
    import pyspark.sql.functions as F

    d = docs.native
    pairs = (
        d.filter(F.col("doc_id") % 2 == 0)
        .select(
            F.col("doc_id").alias("id_a"),
            (F.col("doc_id") + 1).alias("id_b"),
        )
    )
    scored = docs.with_raw(lambda x: x)  # Documents has n_chars as score
    cmap = typed.canonical_map(scored, pairs, score_col="n_chars")
    assert cmap.schema is typed.CanonicalMap
    rows = {r.doc_id: r.canonical_id for r in cmap.rows()}
    assert rows  # every paired doc mapped
    # canonical is always a member of the same pair (doc, doc+1)
    for doc, canon in rows.items():
        assert canon in (doc, doc - 1, doc + 1)


def test_blocklist_gate_facade(spark, docs):
    import pyspark.sql.functions as F

    injected = docs.with_raw(
        lambda d: d.withColumn(
            "text",
            F.concat(
                "text",
                F.lit(" via http://ads.spam"),
                (F.col("doc_id") % 2).cast("string"),
                F.lit(".example/x"),
            ),
        )
    )
    kept = typed.domain_blocklist_gate(injected, ["spam0.example"])
    assert kept.schema is Documents
    assert kept.height == docs.height - (docs.height + 1) // 2


def test_recall_and_pq_screen_facades(spark, sf_dir):
    import pyspark.sql.functions as F

    from colnade_spark.tpch import Embeddings, table_path

    emb = read_parquet(table_path(sf_dir, "embeddings"), Embeddings, spark=spark)
    from colnade_spark.operators.pq import train_pq_codebooks
    from colnade_spark.operators.similarity import brute_force_topk

    books = train_pq_codebooks(emb.native, m=16, ksub=32)
    bench = [
        r.embedding
        for r in emb.native.filter(F.col("vec_id") < 4).collect()
    ]
    kept = typed.pq_screen_gate(emb, bench, books, threshold=0.55)
    assert kept.schema is Embeddings
    assert 0 < kept.height <= emb.height - 4  # benchmark members dropped

    q = emb.native.filter(F.col("vec_id") < 4)
    exact = brute_force_topk(emb.native, q, k=3)
    audit = typed.recall_at_k(exact, exact)
    assert audit.schema is typed.RecallRows
    rows = audit.rows()
    assert len(rows) == 4 and all(r.recall == 1.0 for r in rows)
    # typed refs guard downstream
    assert audit.filter(typed.RecallRows.recall >= 0.5).height == 4

    # graded report facade: pinned schema, query_id widened to Int64,
    # every benchmark member self-hits
    from colnade_spark.operators.pq import pq_encode

    codes = pq_encode(emb.native.select("vec_id", "embedding"), books)
    rep = typed.pq_contamination_report(codes, bench, books, threshold=0.55)
    assert rep.schema is typed.PqContaminationRows
    rrows = rep.rows()
    assert len(rrows) == 4 and all(r.n_hits >= 1 for r in rrows)
    assert rep.filter(typed.PqContaminationRows.frac_hits > 0.0).height == 4


def test_group_split_select_facade(spark, docs):
    import pyspark.sql.functions as F

    groups = docs.native.select(
        "doc_id", (F.col("doc_id") % 11).alias("component")
    )
    parts = {
        k: typed.group_split_select(
            docs, groups, {"train": 0.8, "val": 0.1, "test": 0.1}, keep=k
        )
        for k in ("train", "val", "test")
    }
    assert all(p.schema is Documents for p in parts.values())
    assert sum(p.height for p in parts.values()) == docs.height
    # leakage safety: a group's docs are all in the same part
    for k, p in parts.items():
        comp = {r.doc_id % 11 for r in p.rows()}
        for k2, p2 in parts.items():
            if k2 != k and p2.height and p.height:
                assert comp.isdisjoint({r.doc_id % 11 for r in p2.rows()})
    import pytest as _pytest

    with _pytest.raises(ValueError):
        typed.group_split_select(docs, groups, {"a": 1.0}, keep="b")


def test_round5_report_facades(spark, docs):
    import pyspark.sql.functions as F

    # corpus diff: pinned CorpusDiffRows
    new = docs.native.filter("doc_id % 10 != 0")
    diff = typed.corpus_diff(docs.native, new=new)
    assert diff.schema is typed.CorpusDiffRows
    assert {r.status for r in diff.rows()} == {"removed"}
    assert diff.filter(typed.CorpusDiffRows.status == "removed").height > 0

    # corpus card: pinned default shape; custom shapes rejected
    card = typed.corpus_card(docs.native)
    assert card.schema is typed.CorpusCardRows
    assert all(r.q_50 <= r.q_90 for r in card.rows())
    import pytest

    with pytest.raises(ValueError):
        typed.corpus_card(docs.native, quantiles=(25, 75))

    # approx card: same pinned shape, agrees with the exact card at
    # fixture scale (GK is rank-exact below accuracy), same pins
    acard = typed.corpus_card_approx(docs.native)
    assert acard.schema is typed.CorpusCardRows
    exact = {r.lang: (r.n_docs, r.total_size) for r in card.rows()}
    assert {r.lang: (r.n_docs, r.total_size) for r in acard.rows()} == exact
    with pytest.raises(ValueError):
        typed.corpus_card_approx(docs.native, group_col="domain")

    # pii counts: pinned PiiCountRows over injected text
    injected = docs.native.withColumn(
        "text", F.concat(F.col("text"), F.lit(" a@b.com"))
    )
    pii = typed.pii_counts(injected)
    assert pii.schema is typed.PiiCountRows
    assert all(r.n_emails >= 1 for r in pii.rows())

    # perplexity bucket select: schema-preserving, keeps one bucket
    scored = docs.native.withColumn("s", F.col("n_chars").cast("double"))
    from colnade_spark.tpch import Documents

    class Scored(Documents):
        s: typed.Column[typed.Float64]

    import colnade_spark as cs

    frame = cs.DataFrame(scored, Scored)
    mid = typed.perplexity_bucket_select(frame, "s", keep="middle", domain_col="lang")
    assert mid.schema is Scored
    assert 0 < mid.height < frame.height
    with pytest.raises(ValueError):
        typed.perplexity_bucket_select(frame, "s", keep="bogus")


def test_round5_gate_facades(spark, docs, sf_dir):
    import pyspark.sql.functions as F

    # incremental-ingest gate: schema-preserving, keeps only churn
    changed = docs.with_raw(
        lambda d: d.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 4 == 0, F.concat("text", F.lit(" v2"))
            ).otherwise(F.col("text")),
        )
    )
    gated = typed.changed_rows_gate(changed, old=docs.native)
    assert gated.schema is Documents
    assert gated.height == changed.filter(Documents.doc_id % 4 == 0).height

    # residual screen facade: schema-preserving, drops bench members
    from colnade_spark import read_parquet
    from colnade_spark.operators.pq import train_residual_codebooks
    from colnade_spark.tpch import Embeddings, table_path

    emb = read_parquet(table_path(sf_dir, "embeddings"), Embeddings, spark=spark)
    cents = [
        [((((j * 31) + (d * 17)) % 7) - 3) / 4.0 for d in range(64)]
        for j in range(4)
    ]
    books = train_residual_codebooks(
        emb.native, cents, m=16, ksub=32, sample_n=512, seed=11
    )
    bench = [
        r.embedding
        for r in emb.native.filter(F.col("vec_id") < 4).collect()
    ]
    kept = typed.pq_residual_screen_gate(emb, bench, books, cents, threshold=0.55)
    assert kept.schema is Embeddings
    # plumbing check: the gate fired on a nonempty subset (the exact
    # self-match separation property is pinned with measured thresholds
    # in test_pq.py::test_residual_screen_trained_separation_and_shapes)
    assert 0 < kept.height < emb.height


def test_minhash_estimate_audit_facade(spark, docs):
    out = typed.minhash_estimate_audit(docs, threshold=0.8)
    assert out.schema is typed.MinhashAuditRows
    rows = out.rows()
    assert len(rows) > 0
    assert all(0.0 <= r.est_jaccard <= 1.0 for r in rows)
    assert all(0.0 <= r.exact_jaccard <= 1.0 for r in rows)
    assert all(isinstance(r.agree_at_threshold, bool) for r in rows)


def test_prt_audit_facades(spark, docs):
    pairs = typed.charshingle_jaccard_pairs(docs, threshold=0.8)
    assert pairs.schema is typed.JaccardPairs
    assert all(r.jaccard >= 0.8 for r in pairs.rows())
    audit = typed.minhash_prt_audit(docs, threshold=0.8)
    assert audit.schema is typed.PrtAuditRow
    rows = audit.rows()
    assert len(rows) == 1
    r = rows[0]
    assert 0.0 <= r.candidate_recall <= 1.0
    assert r.n_true_positive <= r.n_true_pairs


def test_prototype_facades(spark, sf_dir):
    from colnade_spark.operators.clustering import kmeans
    from colnade_spark.tpch import Embeddings

    embs = read_parquet(table_path(sf_dir, "embeddings"), Embeddings, spark=spark)
    _, cents = kmeans(embs.native, k=4, iters=1, return_centroids=True)

    scores = typed.prototypicality(embs, cents)
    assert scores.schema is typed.PrototypeScores
    rows = scores.rows()
    assert len(rows) == embs.height
    assert all(r.proto_dist >= 0.0 and 0 <= r.cluster < 4 for r in rows)

    kept = typed.prototype_prune_select(embs, cents, 0.5, mode="keep_hard")
    assert kept.schema is Embeddings
    assert 0 < kept.height <= embs.height
    # scoring columns dropped, payload intact
    r = kept.rows()[0]
    assert isinstance(r.embedding, list) and len(r.embedding) == 64


def test_soft_dedup_weight_facades(docs):
    cw = typed.commonness_weights(docs, n=3)
    assert cw.schema is typed.SoftDedupWeights
    assert cw.height == docs.height
    assert all(0.0 < r.weight <= 1.0 for r in cw.rows())

    dw = typed.duplication_weights(docs)
    assert dw.schema is typed.DupWeights
    assert dw.height == docs.height
    assert all(r.dup_weight * r.cluster_size == 1.0 or r.cluster_size >= 1
               for r in dw.rows())


def test_fertility_facade(docs):
    out = typed.fertility_stats(docs)
    assert out.schema is typed.FertilityRows
    rows = out.rows()
    assert {r.lang for r in rows} == {"en", "de", "es", "fr", "zh"}
    assert all(r.sum_bpe >= 0 and r.n_docs > 0 for r in rows)


def test_diagnostics_facades(docs):
    mat = typed.source_overlap_matrix(docs, group_col="lang")
    assert mat.schema is typed.SourceOverlapRows  # may be empty: no x-lang dups
    nearm = typed.source_overlap_near(
        docs, group_col="lang", num_hashes=32, bands=8, shingle_k=13
    )
    assert nearm.schema is typed.SourceOverlapRows  # shared row shape
    psi = typed.length_drift_psi(
        docs, new=docs, value_col="n_chars", edges=(100, 300)
    )
    assert psi.schema is typed.DriftPsiRows
    assert {r.psi_term for r in psi.rows()} == {0.0}  # identical snapshots
    import pytest as _pytest

    with _pytest.raises(ValueError):
        typed.length_drift_psi(docs, new=docs, group_col="lang")


def test_stratified_split_and_code_quality_facades(docs):
    val = typed.stratified_split_select(
        docs, {"train": 0.8, "val": 0.2}, "lang", keep="val"
    )
    assert val.schema is Documents
    assert 0 < val.height < docs.height
    import pytest as _pytest

    with _pytest.raises(ValueError):
        typed.stratified_split_select(docs, {"a": 1.0}, "lang", keep="b")

    cq = typed.code_quality_signals(docs)
    assert cq.schema is typed.CodeQualityRows
    assert cq.height == docs.height
    r = cq.rows()[0]
    assert isinstance(r.keep, bool)


def test_blend_quality_facade(docs):
    scored = docs.with_raw(
        lambda d: d.selectExpr("doc_id", "lang", "n_chars as s1", "n_chars + doc_id as s2")
    )
    out = typed.blend_quality_scores(
        scored, {"s1": 1.0, "s2": 1.0}, domain_col="lang"
    )
    assert out.schema is typed.BlendedQualityRows
    rows = out.rows()
    assert len(rows) == docs.height
    assert all(0.0 <= r.blended_score <= 1.0 for r in rows)


def test_surgical_decontamination_facade(docs):
    from pyspark.sql import functions as F

    bench = docs.with_raw(lambda d: d.filter(F.col("doc_id") % 100 == 0))
    out = typed.remove_contaminated_spans(docs, bench, n=13)
    assert out.schema is Documents and out.height == docs.height
    # benchmark members are fully excised (their text IS benchmark text)
    emptied = out.filter(Documents.n_chars > 0).native.filter(
        (F.col("doc_id") % 100 == 0) & (F.length("text") > 0)
    )
    assert emptied.count() == 0


def test_curation_funnel_facade(docs):
    from pyspark.sql import functions as F

    stages = {
        "short": docs.with_raw(lambda d: d.filter(F.col("n_chars") < 120)),
        "tail": docs.with_raw(lambda d: d.filter(F.col("doc_id") % 7 == 0)),
    }
    out = typed.curation_funnel(docs, stages)
    assert out.schema is typed.FunnelRows
    rows = sorted(out.rows(), key=lambda r: r.stage_idx)
    assert rows[0].n_in == docs.height
    assert rows[1].n_in == rows[0].n_out


def test_round7_frozen_facades(docs):
    from pyspark.sql import functions as F

    from colnade_spark.operators.importance import fit_gram_counts
    from colnade_spark.operators.quality import fit_blend_quantiles

    ct = fit_gram_counts(docs.native, n=3, buckets=2048)
    out = typed.commonness_score_frozen(docs, ct, n=3)
    assert out.schema is typed.SoftDedupWeights
    rows = out.rows()
    assert len(rows) == docs.height
    assert all(0.0 < r.weight <= 1.0 for r in rows)

    scored = docs.with_raw(
        lambda d: d.select("doc_id", "lang", F.col("n_chars").cast("double").alias("s1"))
    )
    q = fit_blend_quantiles(scored.native, ["s1"], "lang", n_quantiles=20)
    bl = typed.blend_quality_frozen(scored, {"s1": 1.0}, q, domain_col="lang")
    assert bl.schema is typed.BlendedQualityRows
    assert all(0.0 <= r.blended_score <= 1.0 for r in bl.rows())


def test_round7_attribution_and_readers_facades(docs, tmp_path, spark):
    from pyspark.sql import functions as F

    from colnade_spark.operators.report import maintain_funnel_counts
    from colnade_spark.operators.text import maintain_fertility_table

    stages = {
        "short": docs.with_raw(lambda d: d.filter(F.col("n_chars") < 120)),
        "tail": docs.with_raw(lambda d: d.filter(F.col("doc_id") % 7 == 0)),
    }
    attr = typed.curation_attribution(docs, stages)
    assert attr.schema is typed.AttributionRows
    assert len(attr.rows()) == docs.height

    native = docs.native
    src = str(tmp_path / "src")
    native.write.parquet(src)
    stream = spark.readStream.schema(native.schema).parquet(src)
    q1 = maintain_fertility_table(stream, str(tmp_path / "fert"), str(tmp_path / "ck1"))
    q1.processAllAvailable(); q1.stop()
    fert = typed.merge_fertility_table(spark, str(tmp_path / "fert"))
    assert fert.schema is typed.FertilityRows and len(fert.rows()) == 5

    stream2 = spark.readStream.schema(native.schema).parquet(src)
    gates = {k: v.native for k, v in stages.items()}
    q2 = maintain_funnel_counts(stream2, gates, str(tmp_path / "fun"), str(tmp_path / "ck2"))
    q2.processAllAvailable(); q2.stop()
    fun = typed.merge_funnel_counts(spark, str(tmp_path / "fun"))
    assert fun.schema is typed.FunnelRows
    rows = sorted(fun.rows(), key=lambda r: r.stage_idx)
    assert rows[0].n_in == docs.height and rows[1].n_in == rows[0].n_out


def test_merge_fertility_store_manifest_and_empty(docs, tmp_path, spark):
    """merge_fertility_store mirrors merge_funnel_counts: kind-validated
    manifest, lang_col recovered FROM THE MANIFEST (a store built with a
    non-default language column reads correctly instead of failing on a
    missing 'lang'), manifest-only store -> valid EMPTY datasheet, and
    the typed facade renames the custom lang_col to the schema's
    ``lang``."""
    import pytest
    from colnade_spark.operators.text import (
        maintain_fertility_table,
        merge_fertility_store,
    )
    from colnade_spark.streaming.stream import write_table_manifest

    native = docs.native.withColumnRenamed("lang", "language")
    src = str(tmp_path / "src")
    native.write.parquet(src)
    stream = spark.readStream.schema(native.schema).parquet(src)
    store = str(tmp_path / "fert")
    q = maintain_fertility_table(
        stream, store, str(tmp_path / "ck"), lang_col="language"
    )
    q.processAllAvailable(); q.stop()

    out = merge_fertility_store(spark, store)
    assert "language" in out.columns and out.count() == 5

    fert = typed.merge_fertility_table(spark, store)
    assert fert.schema is typed.FertilityRows and len(fert.rows()) == 5

    # registered but no batch committed: an empty datasheet, not a read error
    empty_store = str(tmp_path / "fert_empty")
    write_table_manifest(
        spark,
        empty_store,
        {"kind": "fertility_sums", "lang_col": "language", "text_col": "text"},
    )
    assert merge_fertility_store(spark, empty_store).count() == 0
    assert typed.merge_fertility_table(spark, empty_store).rows() == []

    # absent or wrong-kind manifest fails loudly
    with pytest.raises(ValueError, match="fertility_sums manifest"):
        merge_fertility_store(spark, str(tmp_path / "nothing"))
    bad = str(tmp_path / "bad")
    write_table_manifest(
        spark, bad, {"kind": "funnel_counts", "stages": [], "id_col": "doc_id"}
    )
    with pytest.raises(ValueError, match="fertility_sums manifest"):
        merge_fertility_store(spark, bad)


def test_round8_facades(docs, tmp_path, spark):
    """Typed merge_overlap_store (manifest-validated, empty-store
    matrix) and typed blend_drift_frozen (ungrouped DriftPsiRows;
    grouped raises — the length_drift_psi facade rule)."""
    from pyspark.sql import functions as F

    from colnade_spark.operators.quality import fit_blend_quantiles
    from colnade_spark.operators.report import (
        fit_psi_baseline,
        maintain_source_overlap,
    )
    from colnade_spark.operators.quality import blend_quality_frozen
    from colnade_spark.streaming.stream import write_table_manifest

    d = docs.native
    multi = d.select("doc_id", "text", F.lit("full").alias("source")).unionByName(
        d.filter(F.col("doc_id") % 2 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.upper("text").alias("text"),
            F.lit("mirror").alias("source"),
        )
    )
    src = str(tmp_path / "src")
    multi.write.parquet(src)
    stream = spark.readStream.schema(multi.schema).parquet(src)
    store = str(tmp_path / "ovl")
    q = maintain_source_overlap(stream, store, str(tmp_path / "ck"))
    q.processAllAvailable(); q.stop()
    m = typed.merge_overlap_store(spark, store)
    assert m.schema is typed.SourceOverlapRows
    rows = m.rows()
    assert len(rows) == 1 and rows[0].source_a == "full"
    assert 0.0 < rows[0].jaccard <= 1.0

    empty_store = str(tmp_path / "ovl_empty")
    write_table_manifest(
        spark, empty_store,
        {"kind": "overlap_fps", "group_col": "source", "text_col": "text",
         "key_col": None},
    )
    assert typed.merge_overlap_store(spark, empty_store).rows() == []

    scored = d.select(
        "doc_id", F.col("n_chars").cast("double").alias("s1")
    )
    w = {"s1": 1.0}
    model = fit_blend_quantiles(scored, ["s1"], n_quantiles=10)
    base = fit_psi_baseline(
        blend_quality_frozen(scored, w, model),
        "blended_score", (0.2, 0.4, 0.6, 0.8),
    )
    rep = typed.blend_drift_frozen(
        scored, w, model, base, edges=(0.2, 0.4, 0.6, 0.8)
    )
    assert rep.schema is typed.DriftPsiRows
    rows = rep.rows()
    assert len(rows) > 0 and all(r.n_old == r.n_new for r in rows)

    with pytest.raises(ValueError, match="ungrouped"):
        typed.blend_drift_frozen(scored, w, model, base, group_col="lang")


def test_merge_corpus_card_facade(docs, tmp_path, spark):
    """Typed maintained-card reader: CorpusCardBinnedRows with nullable
    quantile-bound columns; group pin refusal for non-lang stores."""
    from pyspark.sql import functions as F

    from colnade_spark.operators.report import maintain_corpus_card

    native = docs.native
    src = str(tmp_path / "src")
    native.write.parquet(src)
    stream = spark.readStream.schema(native.schema).parquet(src)
    store = str(tmp_path / "card")
    q = maintain_corpus_card(
        stream, store, str(tmp_path / "ck"), "lang", "n_chars",
        (100, 200, 300, 400, 500),
    )
    q.processAllAvailable(); q.stop()
    card = typed.merge_corpus_card(spark, store)
    assert card.schema is typed.CorpusCardBinnedRows
    rows = card.rows()
    assert len(rows) == 5 and all(r.n_docs > 0 for r in rows)

    other = str(tmp_path / "card2")
    stream2 = spark.readStream.schema(native.schema).parquet(src)
    q2 = maintain_corpus_card(
        stream2, other, str(tmp_path / "ck2"), "source", "n_chars"
    )
    q2.processAllAvailable(); q2.stop()
    with pytest.raises(ValueError, match="pins group_col"):
        typed.merge_corpus_card(spark, other)
