"""Hashed-feature linear classifier: exact-integer scoring model checked
against a pure-python recomputation, hashed-path vs weight-table-path
equivalence, and edge cases (empty docs, collisions)."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from colnade_spark.operators import classifier


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_score(text: str, dim: int, seed: int) -> int:
    t = re.sub(r"[^a-z0-9 ]", " ", (text or "").lower())
    toks = [x for x in re.split(r"\s+", t.strip()) if x]
    return sum(
        (_h60(f"{_h60(tok) % dim}#{seed}") % 2001) - 1000 for tok in toks
    )


def test_matches_python_model(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = {
        r.doc_id: r.clf_int
        for r in classifier.hashed_linear_score(docs, dim=4096, seed=7)
        .select("doc_id", "clf_int")
        .collect()
    }
    for r in docs.select("doc_id", "text").collect():
        assert out[r.doc_id] == _py_score(r.text, 4096, 7), r.doc_id


def test_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "hello world")], ["doc_id", "text"]
    )
    out = {
        r.doc_id: (r.clf_int, r.clf_score)
        for r in classifier.hashed_linear_score(df, dim=64, seed=1).collect()
    }
    assert out[1] == (0, 0.0)
    assert out[2] == (0, 0.0)
    assert out[3][0] == _py_score("hello world", 64, 1)


def test_weight_table_path_equivalent(spark, sf_dir):
    """Explicit (bucket, weight) broadcast-join path reproduces the
    hashed path exactly when the table holds the seeded weights."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dim, seed = 512, 3
    w = spark.range(dim).select(
        F.col("id").alias("bucket"),
        classifier.seeded_bucket_weight(F.col("id"), seed).alias("weight"),
    )
    a = {
        r.doc_id: r.clf_int
        for r in classifier.hashed_linear_score(docs, dim=dim, seed=seed)
        .select("doc_id", "clf_int")
        .collect()
    }
    b = {
        r.doc_id: r.clf_int
        for r in classifier.linear_score_with_weights(docs, w, dim=dim).collect()
    }
    assert a == b


def test_score_prob_ranges(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = classifier.hashed_linear_score(docs, dim=4096, seed=7).select(
        "clf_score", "clf_prob"
    ).collect()
    assert all(-1.0 <= r.clf_score <= 1.0 for r in rows)
    assert all(0.0 < r.clf_prob < 1.0 for r in rows)
