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
