"""Embedding operators: normalization invariants and hand-checked
cluster assignment."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from colnade_spark.operators import embeddings
from colnade_spark.operators.similarity import norm


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_normalize_unit_norm(embs):
    out = embeddings.normalize_embeddings(embs)
    r = out.select(norm(F.col("embedding")).alias("n")).agg(
        F.min("n"), F.max("n")
    ).first()
    assert r[0] == pytest.approx(1.0, abs=1e-9)
    assert r[1] == pytest.approx(1.0, abs=1e-9)


def test_normalize_zero_vector_survives(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0]), (2, [3.0, 4.0])], ["id", "embedding"])
    out = {r.id: r.embedding for r in embeddings.normalize_embeddings(df).collect()}
    assert out[1] == [0.0, 0.0]
    assert out[2] == pytest.approx([0.6, 0.8])


def test_cluster_assign_hand_checked(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.7, 0.7])],
        ["id", "embedding"],
    )
    cents = [[1.0, 0.0], [0.0, 1.0]]
    out = {
        r.id: (r.cluster_id, r.sim)
        for r in embeddings.cluster_assign(df, cents, sim_col="sim").collect()
    }
    assert out[1] == (0, 1.0)
    assert out[2] == (1, 1.0)
    # exact dot-product tie at 6dp -> highest cluster id wins
    assert out[3][0] == 1


def test_cluster_stats_partitions_everything(embs):
    cents = [[1.0] + [0.0] * 63, [0.0, 1.0] + [0.0] * 62, [-1.0] + [0.0] * 63]
    stats = embeddings.cluster_stats(embs, cents)
    rows = stats.collect()
    assert sum(r.n_members for r in rows) == embs.count()
    for r in rows:
        assert r.min_sim <= r.max_sim


def test_cluster_assign_single_centroid(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0])], ["id", "embedding"])
    out = embeddings.cluster_assign(df, [[0.5, 0.5]]).first()
    assert out.cluster_id == 0
    with pytest.raises(ValueError):
        embeddings.cluster_assign(df, [])
