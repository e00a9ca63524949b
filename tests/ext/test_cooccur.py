"""Bigram co-occurrence + PMI: hand-checked on a tiny corpus and
model-checked against a pure-python recomputation on real testdata."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from colnade_spark.operators import cooccur


def _py_model(texts, min_count):
    def toks(t):
        t = re.sub(r"[^a-z0-9 ]", " ", (t or "").lower())
        return [x for x in re.split(r"\s+", t.strip()) if x]

    uni: Counter = Counter()
    bi: Counter = Counter()
    t_toks = t_bi = 0
    for t in texts:
        tk = toks(t)
        uni.update(tk)
        bi.update(zip(tk, tk[1:]))
        t_toks += len(tk)
        t_bi += max(len(tk) - 1, 0)
    out = {}
    for (a, b), n in bi.items():
        if n >= min_count:
            out[(a, b)] = (
                n,
                math.log((n / t_bi) / ((uni[a] / t_toks) * (uni[b] / t_toks))),
            )
    return out


def test_bigram_counts_hand_checked(spark):
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, ""), (4, "solo")],
        ["doc_id", "text"],
    )
    got = {
        (r.tok_a, r.tok_b): r.n_ab
        for r in cooccur.bigram_counts(df).collect()
    }
    # "a b" appears twice in doc 1 and once in doc 2; "b a" once; "b c" once
    assert got == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}


def test_pmi_matches_python_model(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = [r.text for r in docs.select("text").collect()]
    want = _py_model(texts, min_count=20)
    got = {
        (r.tok_a, r.tok_b): (r.n_ab, r.pmi)
        for r in cooccur.bigram_pmi(docs, min_count=20).collect()
    }
    assert set(got) == set(want)
    for k, (n, pmi) in want.items():
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(pmi, abs=1e-9)


def test_pmi_min_count_filters_before_join(spark):
    df = spark.createDataFrame(
        [(1, "x y x y x y"), (2, "p q")], ["doc_id", "text"]
    )
    out = cooccur.bigram_pmi(df, min_count=3).collect()
    assert {(r.tok_a, r.tok_b) for r in out} == {("x", "y")}


def test_bigram_logprob_hand_checked(spark):
    """Hand-check the smoothed bigram LM on a tiny corpus: repeated
    bigrams score better (lower nll) than one-off bigrams; <2-token
    docs report 0 bigrams / NULL; determinism across partitionings."""
    import math

    from colnade_spark.operators.cooccur import bigram_logprob

    df = spark.createDataFrame(
        [
            (1, "a b a b"),
            (2, "a b a b"),
            (3, "x y"),
            (4, "a"),        # no bigrams
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: (r.n_bigrams, r.nll) for r in bigram_logprob(df).collect()}
    assert out[4] == (0, None)
    assert out[1][0] == 3 and out[2][0] == 3 and out[3][0] == 1
    # corpus counts: tokens a:5 b:4 x:1 y:1 (V=4)
    # c(ab)=4, c(ba)=2, c(xy)=1
    def lp(nab, na):
        return round(math.log((nab + 1.0) / (na + 4.0)) * 10_000)

    nll1 = round(-((lp(4, 5) + lp(2, 4) + lp(4, 5)) / 10_000.0) / 3, 6)
    nll3 = round(-(lp(1, 1) / 10_000.0) / 1, 6)
    assert out[1][1] == nll1 == out[2][1]
    assert out[3][1] == nll3
    # repeated bigrams are less surprising
    assert out[1][1] < out[3][1]
    # stable under a different partitioning (integer sums)
    again = {r.doc_id: (r.n_bigrams, r.nll) for r in bigram_logprob(df.repartition(7)).collect()}
    assert again == out
