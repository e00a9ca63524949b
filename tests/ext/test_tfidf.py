"""TF-IDF: hand-computed weights on a tiny corpus, determinism and
top-k total ordering."""

from __future__ import annotations

import math

import pytest

from colnade_spark.operators import tfidf


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry"),
        ],
        ["doc_id", "text"],
    )


def test_tfidf_hand_checked(corpus):
    out = {
        (r.doc_id, r.term): r
        for r in tfidf.tf_idf(corpus).collect()
    }
    # doc 1 "apple": n=2, len=3, df(apple)=1, N=3
    r = out[(1, "apple")]
    assert r.n == 2
    assert r.tf == pytest.approx(2 / 3)
    assert r.idf == pytest.approx(math.log(4 / 2) + 1)
    assert r.tfidf == pytest.approx((2 / 3) * (math.log(2) + 1))
    # "banana" appears in 2 docs
    assert out[(2, "banana")].idf == pytest.approx(math.log(4 / 3) + 1)
    # doc rows: one per distinct (doc, term)
    assert len(out) == 2 + 2 + 1


def test_tfidf_case_folding(spark):
    df = spark.createDataFrame([(1, "Apple APPLE apple")], ["doc_id", "text"])
    rows = tfidf.tf_idf(df).collect()
    assert len(rows) == 1 and rows[0].n == 3


def test_top_terms_deterministic_order(corpus):
    out = tfidf.top_terms(corpus, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.term))
    # doc 1: apple (rare, frequent) outranks banana
    assert sorted(by_doc[1]) == [(1, "apple"), (2, "banana")]
    assert all(len(v) <= 2 for v in by_doc.values())


def test_tfidf_empty_doc_contributes_nothing(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "")], ["doc_id", "text"])
    assert {r.doc_id for r in tfidf.tf_idf(df).collect()} == {1}
