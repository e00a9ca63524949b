"""Canonical selection: quality-argmax per duplicate cluster with
deterministic ties, singleton self-mapping, and payload-free shuffles."""

from __future__ import annotations

from pyspark.sql import functions as F

from colnade_spark.operators.canonical import canonical_map, resolve_canonical


def _fixture(spark):
    # clusters: {1,2,3} (scores 5,9,9 -> canonical 2), {4,5} (scores
    # 7,7 -> canonical 4), singleton 6
    docs = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (4, 7), (5, 7), (6, 1)],
        ["doc_id", "score"],
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], ["id_a", "id_b"]
    )
    return docs, pairs


def test_canonical_map_argmax_and_ties(spark):
    docs, pairs = _fixture(spark)
    got = {
        r.doc_id: r.canonical_id
        for r in canonical_map(pairs, docs).collect()
    }
    # cluster {1,2,3}: max score 9 shared by 2 and 3 -> lowest id 2
    # cluster {4,5}: tie at 7 -> 4; singleton 6 not in the map
    assert got == {1: 2, 2: 2, 3: 2, 4: 4, 5: 4}


def test_resolve_canonical_full_corpus(spark):
    docs, pairs = _fixture(spark)
    out = resolve_canonical(docs, pairs)
    got = {r.doc_id: r.canonical_id for r in out.collect()}
    assert got == {1: 2, 2: 2, 3: 2, 4: 4, 5: 4, 6: 6}
    # dedup view: keep rows that are their own canonical
    kept = sorted(
        r.doc_id
        for r in out.filter(F.col("canonical_id") == F.col("doc_id")).collect()
    )
    assert kept == [2, 4, 6]


def test_missing_score_never_wins(spark):
    docs = spark.createDataFrame([(1, 3)], ["doc_id", "score"])
    pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    # doc 2 appears in pairs but has no quality row: null score sorts
    # last, so scored doc 1 is canonical
    got = {
        r.doc_id: r.canonical_id for r in canonical_map(pairs, docs).collect()
    }
    assert got == {1: 1, 2: 1}


def test_transitive_cluster_one_canonical(spark):
    # a chain 1-2-3-4-5: one cluster, one canonical
    docs = spark.createDataFrame(
        [(i, i * 10) for i in range(1, 6)], ["doc_id", "score"]
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 5)], ["id_a", "id_b"]
    )
    got = {
        r.doc_id: r.canonical_id for r in canonical_map(pairs, docs).collect()
    }
    assert set(got.values()) == {5}  # highest score wins across the chain


def test_duplicate_quality_rows_do_not_fan_out(spark):
    from colnade_spark.operators.canonical import resolve_canonical

    docs = spark.createDataFrame([(1,), (2,)], ["doc_id"])
    pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    # doubled score table: same id twice with different scores
    quality = spark.createDataFrame(
        [(1, 5), (1, 9), (2, 7)], ["doc_id", "score"]
    )
    out = resolve_canonical(docs, pairs, quality)
    rows = sorted((r.doc_id, r.canonical_id) for r in out.collect())
    # one row per doc; max score (9) makes doc 1 canonical
    assert rows == [(1, 1), (2, 1)]
