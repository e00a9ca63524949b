"""End-to-end training-corpus pipeline: the operators chained the way a
real data-prep job chains them —

  read docs → quality filter → exact+near dedup → deterministic split →
  chunk → pack → write parquet → read back

with invariants asserted on the read-back output (the write/read
round-trip is part of the test, not an afterthought)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from colnade_spark.operators import chunking, dedup, packing, quality, sampling


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


def test_full_corpus_pipeline(spark, docs, tmp_path):
    n0 = docs.count()

    # 1. quality gate
    kept = quality.gopher_filter(docs, min_words=10, min_stopword_hits=1)
    n1 = kept.count()
    assert 0 < n1 <= n0

    # 2. dedup: exact first (cheap), then minhash near-dup on survivors
    survivors = dedup.dedup_minhash(
        kept.join(dedup.dedup_exact(kept), "doc_id"), threshold=0.8
    )
    surviving = kept.join(survivors, "doc_id")
    n2 = surviving.count()
    assert 0 < n2 <= n1

    # 3. deterministic split — labels exhaust the corpus
    split = sampling.hash_split(surviving, {"train": 0.9, "val": 0.1})
    assert split.filter(F.col("split").isNull()).count() == 0

    # 4. chunk + pack the train shard
    train = split.filter("split = 'train'")
    chunks = chunking.chunk_by_tokens(train, chunk_size=32, overlap=8)
    packed = packing.pack_chunks(chunks, budget=256, n_shards=4)

    # 5. write → read back
    out = str(tmp_path / "train_chunks")
    packed.write.partitionBy("shard").mode("overwrite").parquet(out)
    back = spark.read.parquet(out)

    # invariants on the materialized output
    assert back.count() == chunks.count()
    # every chunk belongs to a surviving train doc
    bad = back.join(train.select("doc_id"), "doc_id", "left_anti")
    assert bad.count() == 0
    # chunk coverage: token totals match the chunk inventory
    a = back.agg(F.sum("chunk_tokens")).first()[0]
    b = chunks.agg(F.sum("chunk_tokens")).first()[0]
    assert a == b
    # packing determinism across the round-trip: recomputing pack ids on
    # the read-back chunks reproduces the written assignment
    recomputed = packing.pack_chunks(
        back.select("doc_id", "chunk_id", "chunk_tokens"),
        budget=256,
        n_shards=4,
    )
    x = {(r.doc_id, r.chunk_id): (r.shard, r.pack_id) for r in recomputed.collect()}
    y = {(r.doc_id, r.chunk_id): (r.shard, r.pack_id) for r in back.collect()}
    assert x == y


def test_dedup_audit_pipeline(spark, docs, tmp_path):
    """The dedup AUDIT chain: LSH candidates → exact edit-distance verify
    → connected components → cluster-size report, with the corpus-level
    distinct sketch table persisted alongside. This is the reporting half
    of the near-dedup pipeline (what actually got merged, and how big are
    the clusters?)."""
    from colnade_spark.operators import graph, sketches
    from colnade_spark.operators.dedup import (
        edit_distance_pairs,
        minhash_candidate_pairs,
        minhash_signatures,
    )

    # 1. approximate candidates (LSH banding), exact verification
    sigs = minhash_signatures(docs, num_hashes=32)
    cand = minhash_candidate_pairs(sigs, num_hashes=32).select("id_a", "id_b")
    verified = edit_distance_pairs(
        docs, max_dist=64, candidates=cand
    ).cache()
    # verified pairs are a subset of the candidates
    assert verified.join(cand, ["id_a", "id_b"], "left_anti").count() == 0

    # 2. pair → cluster resolution
    cc = graph.connected_components(
        verified, src="id_a", dst="id_b", nodes=docs.select("doc_id")
    )
    assert cc.count() == docs.count()  # every doc labeled
    sizes = graph.largest_component_sizes(cc, top=5).collect()
    if verified.count() > 0:
        assert sizes[0].size >= 2  # at least one real cluster

    # 3. per-language distinct-doc sketch table, persisted and merged
    table = sketches.build_sketch_table(docs, ["lang"], "doc_id")
    dest = str(tmp_path / "lang_sketches")
    table.write.parquet(dest)
    est = sketches.estimate(
        sketches.merge_sketch_table(spark.read.parquet(dest), [])
    ).first().n_distinct_est
    exact = docs.select("doc_id").distinct().count()
    assert abs(est - exact) <= max(2, 0.05 * exact)


def test_round3_curation_pipeline(spark, docs, sf_dir, tmp_path):
    """The full modern curation chain added this round, end to end:

      blocklist gate → span dedup → canonical resolution of minhash
      clusters → semantic dedup (embeddings) → benchmark decontamination
      → DSIR importance resample → write → read back

    Each stage only ever shrinks (or for spans, rewrites) the corpus;
    invariants assert the composition, not just the stages."""
    from colnade_spark.operators import decontaminate, importance, redact, spans
    from colnade_spark.operators.canonical import resolve_canonical
    from colnade_spark.operators.dedup import (
        minhash_candidate_pairs,
        minhash_signatures,
    )
    from colnade_spark.operators.semdedup import semantic_dedup

    n0 = docs.count()

    # 0. URL blocklist (inject a known-bad link into every 10th doc)
    injected = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat("text", F.lit(" via http://tracker.banned.example/x")),
        ).otherwise(F.col("text")),
    )
    gated = redact.domain_blocklist_gate(injected, ["banned.example"])
    n1 = gated.count()
    assert n1 == n0 - (n0 + 9) // 10

    # 1. sub-document span dedup rewrites text in place
    cleaned = spans.remove_duplicate_spans(gated, k=8, min_count=2)
    clean = cleaned.select(
        "doc_id", F.col("text_dedup").alias("text"), "lang", "source", "n_chars"
    )
    assert clean.count() == n1

    # 2. minhash pairs → canonical resolution (keep longest per cluster)
    sigs = minhash_signatures(clean)
    pairs = minhash_candidate_pairs(sigs, "doc_id").filter(
        F.col("est_jaccard") >= 0.8
    )
    quality_tbl = clean.select("doc_id", F.length("text").alias("score"))
    resolved = resolve_canonical(clean, pairs, quality_tbl)
    # materialization barrier: downstream stages consume this output many
    # times (the anti-join shapes evaluate their input twice); a real job
    # writes each stage to parquet — localCheckpoint is the in-test twin
    canon = (
        resolved.filter(F.col("canonical_id") == F.col("doc_id"))
        .drop("canonical_id")
        .localCheckpoint()
    )
    n2 = canon.count()
    assert 0 < n2 <= n1

    # 3. semantic dedup over the survivors' embeddings (fixture vec_id
    #    aligns with doc_id); docs whose vector is pruned drop out
    sem_centroids = [
        [((((j * 29) + (d * 13)) % 9) - 4) / 4.0 for d in range(64)]
        for j in range(8)
    ]
    vecs = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .withColumnRenamed("vec_id", "doc_id")
        .join(canon.select("doc_id"), "doc_id")
    )
    sem_kept = semantic_dedup(
        vecs, sem_centroids, threshold=0.99, id_col="doc_id"
    ).select("doc_id")
    semed = canon.join(sem_kept, "doc_id").localCheckpoint()
    n2b = semed.count()
    assert 0 < n2b <= n2

    # 4. benchmark decontamination (13-gram rule vs every-100th doc)
    bench = clean.filter(F.col("doc_id") % 100 == 0)
    decon = decontaminate.decontaminate(semed, bench).localCheckpoint()
    n3 = decon.count()
    assert 0 < n3 <= n2b
    # every benchmark doc that survived canonicalization is gone
    leaked = decon.join(bench.select("doc_id"), "doc_id", "left_semi")
    assert leaked.count() == 0

    # 5. DSIR importance resample toward the English subset
    target = decon.filter(F.col("lang") == "en")
    w = importance.dsir_weights(decon, target, buckets=256)
    k = max(10, n3 // 2)
    picked = importance.gumbel_topk(w, k=k).select("doc_id")
    final = decon.join(picked, "doc_id")
    n4 = final.count()
    assert n4 == k

    # 6. write → read back, every final doc traceable to the source
    out = str(tmp_path / "curated")
    final.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == n4
    assert back.join(docs.select("doc_id"), "doc_id", "left_semi").count() == n4


def test_round4_budget_split_shard_pipeline(spark, docs, tmp_path):
    """The round-4 tail of the curation chain, end to end:

      per-domain quality prune → token budget → near-dup components →
      leakage-safe split → deterministic training order → sharded write

    Invariants assert the COMPOSITION: budgets hold after pruning, no
    near-dup cluster straddles splits, and the written shards replay
    the same deterministic permutation of exactly the train split."""
    import math
    import os

    from colnade_spark.operators.graph import connected_components
    from colnade_spark.operators.quality import quality_prune, token_budget_prune
    from colnade_spark.operators.sampling import group_split
    from colnade_spark.operators.shards import training_order, write_training_shards
    from pyspark.sql.window import Window

    n0 = docs.count()

    # 1. keep the top 60% by length within each lang, then a 30k
    #    char-budget per lang on what's left
    pruned = quality_prune(docs, 0.6, "n_chars", domain_col="lang")
    budgeted = token_budget_prune(
        pruned, 30_000, "n_chars", domain_col="lang", score_col="n_chars"
    ).localCheckpoint()
    per_lang = {
        r.lang: r.t
        for r in budgeted.groupBy("lang").agg(F.sum("n_chars").alias("t")).collect()
    }
    assert per_lang and all(t <= 30_000 for t in per_lang.values())

    # 2. near-dup components (length-chain fixture graph) -> leakage-safe split
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    s = budgeted.select(
        "doc_id",
        F.lag("doc_id").over(w).alias("p"),
        (F.col("n_chars") - F.lag("n_chars").over(w)).alias("gap"),
    )
    edges = s.filter(F.col("gap") <= 2).select(
        F.col("p").alias("src"), F.col("doc_id").alias("dst")
    )
    cc = connected_components(edges, nodes=budgeted.select("doc_id"))
    groups = cc.select(F.col("node").alias("doc_id"), "component")
    labeled = group_split(
        budgeted, groups, {"train": 0.8, "val": 0.1, "test": 0.1}, salt="e2e"
    ).localCheckpoint()
    assert labeled.count() == budgeted.count()
    purity = (
        labeled.join(groups, "doc_id")
        .groupBy("component")
        .agg(F.countDistinct("split").alias("k"))
        .agg(F.max("k").alias("m"))
        .head()
        .m
    )
    assert purity == 1

    # 3. train split -> deterministic training order -> sharded write
    train = labeled.filter(F.col("split") == "train").drop("split")
    dest = str(tmp_path / "train_shards")
    write_training_shards(train.select("doc_id", "text"), dest, n_shards=4, salt="e2e")
    back = spark.read.parquet(dest)
    assert back.count() == train.count()
    want = {
        (r.doc_id, r.shard, r.pos)
        for r in training_order(
            train.select("doc_id", "text"), 4, salt="e2e"
        ).collect()
    }
    assert {(r.doc_id, r.shard, r.pos) for r in back.collect()} == want
    # shards on disk: one pos-ordered file each
    for i in range(4):
        files = [
            f for f in os.listdir(f"{dest}/shard={i}") if f.endswith(".parquet")
        ]
        assert len(files) == 1


def test_round5_observe_bucket_balance_pipeline(spark, docs, tmp_path):
    """The round-5 observability + balance tail, end to end:

      ingest new snapshot → corpus_diff audit → PII audit → CCNet
      perplexity buckets (keep the middle) → token-BALANCED shards →
      sharded write → corpus_card datasheet of what shipped

    Invariants assert the COMPOSITION: the diff explains exactly the
    synthetic churn, the kept slice is the per-lang middle band, the
    written shards are weight-balanced within one max-document, and
    the datasheet totals equal what was written."""
    import os

    from colnade_spark.operators import report
    from colnade_spark.operators.cooccur import bigram_logprob
    from colnade_spark.operators.quality import perplexity_buckets
    from colnade_spark.operators.redact import pii_counts
    from colnade_spark.operators.shards import write_training_shards

    # 1. a new snapshot: every 10th doc dropped, every 7th edited
    new = docs.filter(F.col("doc_id") % 10 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    ).localCheckpoint()
    diff = {r.status: r.n for r in report.corpus_diff(docs, new=new)
            .groupBy("status").agg(F.count("*").alias("n")).collect()}
    n_removed = docs.filter("doc_id % 10 = 0").count()
    n_changed = new.filter("doc_id % 7 = 0").count()
    assert diff.get("removed", 0) == n_removed
    assert diff.get("changed", 0) == n_changed
    assert "added" not in diff

    # 2. PII audit on the surviving snapshot: synthetic corpus is clean
    pii = pii_counts(new).agg(
        F.sum("n_emails").alias("e"), F.sum("n_ips").alias("i")
    ).head()
    assert (pii.e, pii.i) == (0, 0)

    # 3. CCNet buckets per lang over the bigram LM; train on the middle
    nll = bigram_logprob(new).filter("n_bigrams > 0")
    scored = new.join(nll.select("doc_id", "nll"), "doc_id")
    mid = perplexity_buckets(scored, "nll", domain_col="lang").filter(
        "ppl_bucket = 'middle'"
    ).drop("ppl_bucket").localCheckpoint()
    assert 0 < mid.count() < new.count()

    # 4. token-balanced shards (weight = n_chars), written and read back
    dest = str(tmp_path / "balanced_shards")
    write_training_shards(
        mid.select("doc_id", "text", "lang", "n_chars"), dest, n_shards=4,
        salt="r5", balance_col="n_chars",
    )
    back = spark.read.parquet(dest)
    assert back.count() == mid.count()
    per = {r.shard: r.t for r in back.groupBy("shard")
           .agg(F.sum("n_chars").alias("t")).collect()}
    total = sum(per.values())
    mx = mid.agg(F.max("n_chars")).head()[0]
    assert set(per) == {0, 1, 2, 3}
    for t in per.values():
        assert abs(t - total / 4) <= mx + 1
    for i in range(4):
        files = [f for f in os.listdir(f"{dest}/shard={i}")
                 if f.endswith(".parquet")]
        assert len(files) == 1

    # 5. the shipped datasheet equals what was written
    card = {r.lang: r for r in report.corpus_card(back).collect()}
    for lang, r in card.items():
        want = back.filter(F.col("lang") == lang).agg(
            F.count("*").alias("n"), F.sum("n_chars").alias("t")
        ).head()
        assert (r.n_docs, r.total_size) == (want.n, want.t)


def test_round6_incremental_ingest_dedup_pipeline(spark, docs, tmp_path):
    """The round-6 incremental-ingest tail, end to end:

      established corpus → new snapshot with churn → changed_rows_gate
      (unchanged re-deliveries gated out) → incremental minhash dedup vs
      the corpus signature store (lightly-edited re-ingests dropped as
      near-dups, genuinely new docs survive) → approx datasheet of the
      merged corpus equals exact counts

    Invariants assert the COMPOSITION: the gate passes exactly the
    churn, the near-dedup separates edits from novelty, and the
    datasheet reflects corpus + survivors."""
    from colnade_spark.operators import report
    from colnade_spark.operators.report import corpus_card_approx

    corpus = docs.localCheckpoint()
    max_id = corpus.agg(F.max("doc_id")).head()[0]
    edited = corpus.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 9 == 0, F.concat(F.col("text"), F.lit(" updated"))
        ).otherwise(F.col("text")),
    )
    fresh = (
        corpus.orderBy("doc_id").limit(5)
        .withColumn("doc_id", F.col("doc_id") + F.lit(max_id + 1))
        .withColumn(
            "text",
            # five genuinely different topics — fresh docs must be novel
            # vs the corpus AND each other (a shared template with only
            # the id differing shares ~80% of its shingles, which is
            # above the dedup threshold; measured)
            F.element_at(
                F.array(
                    F.lit("byte pair encoding merges frequent symbol pairs "
                          "into subword vocabulary units for tokenization"),
                    F.lit("adaptive query execution replans shuffle stages "
                          "at runtime using observed partition statistics"),
                    F.lit("watermark thresholds bound late event arrival so "
                          "streaming state stores can evict old windows"),
                    F.lit("columnar parquet layouts prune row groups with "
                          "min max statistics during predicate pushdown"),
                    F.lit("gradient checkpointing trades recomputation for "
                          "activation memory in deep transformer training"),
                ),
                (F.col("doc_id") % 5 + 1).cast("int"),
            ),
        )
    ).withColumn("n_chars", F.length("text"))
    new = edited.unionByName(fresh).localCheckpoint()
    new_ids = {r.doc_id for r in fresh.select("doc_id").collect()}
    edited_ids = {
        r.doc_id for r in corpus.filter("doc_id % 9 = 0").select("doc_id").collect()
    }

    # 1. the gate passes exactly the churn: new docs added, edits changed
    gated = report.changed_rows_gate(new, old=corpus).localCheckpoint()
    statuses = {
        (r.doc_id, r.status) for r in gated.select("doc_id", "status").collect()
    }
    assert {d for d, s in statuses if s == "added"} == new_ids
    assert {d for d, s in statuses if s == "changed"} == edited_ids

    # 2. incremental near-dedup vs the corpus signature store: edited
    # re-ingests are near-dups of their originals (tiny suffix edit) and
    # drop; the wholly-new docs survive
    corpus_sigs = dedup.minhash_signatures(corpus, num_hashes=96)
    surv = dedup.dedup_minhash_incremental(
        gated.drop("status"), corpus_sigs, threshold=0.8
    )
    surv_ids = {r.doc_id for r in surv.collect()}
    assert surv_ids == new_ids

    # 3. merged corpus datasheet: approx card (scan-side tier) totals
    # equal exact per-lang counts of corpus + survivors
    merged = corpus.unionByName(
        new.join(surv.select("doc_id"), "doc_id", "left_semi")
    )
    card = {r.lang: r for r in corpus_card_approx(merged).collect()}
    want = {
        r.lang: (r.n, r.t)
        for r in merged.groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("t"))
        .collect()
    }
    assert {k: (v.n_docs, v.total_size) for k, v in card.items()} == want


def test_round6_weighting_prune_pipeline(spark, docs, sf_dir, tmp_path):
    """Round-6 chain: the reweight-instead-of-drop curation path —

      soft-dedup weights (commonness + cluster size) → combined training
      weight → prototype-prune the embedding space (keep_hard) →
      restrict the weighted corpus to prototype survivors → per-language
      fertility datasheet + PSI drift report (survivors vs full corpus)
      → write the weighted manifest → read back

    with mass/ordering invariants on the read-back output."""
    from colnade_spark.operators.clustering import kmeans, prototype_prune
    from colnade_spark.operators.importance import (
        commonness_weights,
        duplication_weights,
    )
    from colnade_spark.operators.report import length_drift_psi
    from colnade_spark.operators.text import fertility_stats

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_docs = docs.count()

    # 1) weights: commonness x cluster-size, combined multiplicatively
    cw = commonness_weights(docs, n=3)
    dw = duplication_weights(docs)
    weighted = cw.join(dw, "doc_id").select(
        "doc_id", (F.col("weight") * F.col("dup_weight")).alias("train_weight")
    )
    assert weighted.count() == n_docs

    # 2) prototype-prune the embedding space; survivors gate the corpus
    _, cents = kmeans(embs, k=4, iters=1, return_centroids=True)
    kept_vecs = prototype_prune(embs, cents, 0.5, mode="keep_hard").select(
        F.col("vec_id").alias("doc_id")
    )
    survivors = weighted.join(kept_vecs, "doc_id")
    n_kept = survivors.count()
    assert 0 < n_kept < n_docs

    # 3) datasheets over the surviving slice
    kept_docs = docs.join(kept_vecs, "doc_id")
    fert = {r.lang: r.fertility for r in fertility_stats(kept_docs).collect()}
    assert fert and all(v is None or v > 0 for v in fert.values())
    psi = length_drift_psi(
        docs, new=kept_docs, value_col="n_chars",
        edges=(100, 200, 300, 400, 500), group_col="lang",
    )
    total_psi = psi.agg(F.sum(F.abs(F.col("psi_term")))).collect()[0][0]
    assert total_psi is not None and total_psi >= 0.0

    # 4) manifest round-trip: weights survive the write intact
    out = str(tmp_path / "weighted_manifest")
    survivors.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == n_kept
    got_mass = back.agg(F.sum("train_weight")).collect()[0][0]
    want_mass = survivors.agg(F.sum("train_weight")).collect()[0][0]
    assert abs(got_mass - want_mass) < 1e-12
    # every weight in (0, 1]: both factors are <=1 by construction
    assert back.filter(
        (F.col("train_weight") <= 0) | (F.col("train_weight") > 1.0)
    ).count() == 0


def test_round6_surgical_curation_pipeline(spark, docs, tmp_path):
    """Round-6 chain, part two: the keep-the-document curation path —

      code-quality gate → surgical benchmark-span decontamination
      (excise, don't drop) → ensemble quality blend over the CLEANED
      text → exact stratified split → write → read back

    asserting the leak is gone but the documents survived, blend scores
    rank the cleaned corpus, and split proportions hold exactly."""
    import math

    from colnade_spark.operators.decontaminate import (
        contaminated_spans,
        remove_contaminated_spans,
    )
    from colnade_spark.operators.quality import (
        blend_quality_scores,
        code_quality_signals,
    )
    from colnade_spark.operators.sampling import stratified_exact_split
    from colnade_spark.operators.text import token_count

    n_docs = docs.count()

    # 1) code-quality gate (prose corpus: long-line flag fires a lot —
    #    gate only on low-alnum + autogen here)
    cq = code_quality_signals(docs)
    good_ids = cq.filter(
        ~F.col("flag_low_alnum") & ~F.col("flag_autogen")
    ).select("doc_id")
    gated = docs.join(good_ids, "doc_id")
    assert 0 < gated.count() <= n_docs

    # 2) surgical decontamination against an in-query benchmark
    bench = docs.filter(F.col("doc_id") % 101 == 0)
    spans_found = contaminated_spans(gated, bench, n=13).count()
    cleaned = remove_contaminated_spans(gated, bench, n=13)
    assert spans_found > 0  # benchmark text IS corpus text
    # no 13-gram of the cleaned text still hits the benchmark
    recheck = contaminated_spans(
        cleaned.select("doc_id", F.col("text_clean").alias("text")),
        bench, n=13,
    )
    assert recheck.count() == 0
    assert cleaned.count() == gated.count()  # docs survived

    # 3) blend quality over the CLEANED text
    scored = cleaned.select(
        "doc_id", "lang",
        F.length("text_clean").alias("s_chars"),
        token_count(F.col("text_clean")).alias("s_toks"),
    )
    blended = blend_quality_scores(
        scored, {"s_chars": 1.0, "s_toks": 1.0}, domain_col="lang"
    )
    assert blended.filter(
        (F.col("blended_score") < 0) | (F.col("blended_score") > 1)
    ).count() == 0

    # 4) exact split, proportions hold per language on the final corpus
    split = stratified_exact_split(
        blended, {"train": 0.9, "val": 0.1}, strata_col="lang"
    )
    out = str(tmp_path / "final_corpus")
    split.write.mode("overwrite").partitionBy("split").parquet(out)
    back = spark.read.parquet(out)
    counts = {
        (r.lang, r.split): r.n
        for r in back.groupBy("lang", "split").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    per_lang = {}
    for (lang, sp), n in counts.items():
        per_lang.setdefault(lang, {})[sp] = n
    for lang, by in per_lang.items():
        total = sum(by.values())
        want_train = math.floor(total * 0.9)
        assert by.get("train", 0) == want_train, (lang, by)
        assert by.get("val", 0) == total - want_train, (lang, by)
