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
