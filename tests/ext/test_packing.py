"""Chunk packing: hand-checked offset-bin semantics, shard cohesion,
determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from colnade_spark.operators import chunking, packing


@pytest.fixture(scope="module")
def chunks(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return chunking.chunk_by_tokens(docs, chunk_size=16, overlap=0).cache()


def test_pack_offsets_hand_checked(spark):
    rows = [(1, 0, 10), (1, 1, 10), (1, 2, 10), (1, 3, 10)]
    df = spark.createDataFrame(rows, ["doc_id", "chunk_id", "chunk_tokens"])
    out = {
        r.chunk_id: (r.pack_offset, r.pack_id)
        for r in packing.pack_chunks(df, budget=25, n_shards=1).collect()
    }
    # offsets 0,10,20,30 -> bins 0,0,0,1 (chunk at 20 starts inside bin 0)
    assert out == {0: (0, 0), 1: (10, 0), 2: (20, 0), 3: (30, 1)}


def test_pack_documents_stay_in_one_shard(chunks):
    out = packing.pack_chunks(chunks, budget=256, n_shards=8)
    n_violations = (
        out.groupBy("doc_id")
        .agg(F.countDistinct("shard").alias("s"))
        .filter("s > 1")
        .count()
    )
    assert n_violations == 0
    assert out.select("shard").distinct().count() > 1


def test_pack_stats_fill_bounded(chunks):
    stats = packing.pack_stats(chunks, budget=256, n_shards=8)
    max_chunk = chunks.agg(F.max("chunk_tokens")).first()[0]
    r = stats.agg(F.max("n_tokens").alias("m"), F.sum("n_chunks").alias("n")).first()
    assert r.m <= 256 + max_chunk - 1
    assert r.n == chunks.count()


def test_pack_deterministic(chunks):
    a = packing.pack_chunks(chunks, budget=128).select(
        "doc_id", "chunk_id", "shard", "pack_id"
    )
    b = packing.pack_chunks(chunks, budget=128).select(
        "doc_id", "chunk_id", "shard", "pack_id"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pack_validates():
    with pytest.raises(ValueError):
        packing.pack_chunks(None, budget=0)
    with pytest.raises(ValueError):
        packing.pack_chunks(None, budget=10, n_shards=0)
