"""Decontamination: overlap detection through formatting differences,
n-length sensitivity, clean docs survive."""

from __future__ import annotations

import pytest

from colnade_spark.operators import decontaminate


@pytest.fixture(scope="module")
def corpus(spark):
    leak = (
        "What is the capital of France Paris is the capital and largest "
        "city of France located on the Seine river"
    )
    return spark.createDataFrame(
        [
            (1, "intro text. " + leak + " trailing words here"),
            # same leak, different case/punctuation — still contaminated
            (2, "prefix! " + leak.upper().replace(" ", ",  ") + " suffix"),
            (3, "a completely clean document about cooking pasta at home "
                "with fresh tomatoes basil and olive oil every single day"),
        ],
        ["doc_id", "text"],
    )


@pytest.fixture(scope="module")
def bench_set(spark):
    return spark.createDataFrame(
        [
            (100, "Q: What is the capital of France? A: Paris is the capital "
                  "and largest city of France, located on the Seine river."),
        ],
        ["doc_id", "text"],
    )


def test_contaminated_ids_found(corpus, bench_set):
    bad = {
        r.doc_id
        for r in decontaminate.contaminated_ids(corpus, bench_set, n=13).collect()
    }
    assert bad == {1, 2}


def test_decontaminate_keeps_clean_docs(corpus, bench_set):
    out = decontaminate.decontaminate(corpus, bench_set, n=13)
    assert [r.doc_id for r in out.collect()] == [3]
    assert out.columns == corpus.columns


def test_no_overlap_below_n(spark, bench_set):
    # only a 5-gram in common: n=13 finds nothing, n=5 flags it
    df = spark.createDataFrame(
        [(1, "question is the capital of france answer unknown obviously")],
        ["doc_id", "text"],
    )
    assert decontaminate.contaminated_ids(df, bench_set, n=13).count() == 0
    assert decontaminate.contaminated_ids(df, bench_set, n=5).count() == 1


def test_short_benchmark_rows_are_harmless(spark, corpus):
    tiny = spark.createDataFrame([(1, "too short")], ["doc_id", "text"])
    assert decontaminate.contaminated_ids(corpus, tiny, n=13).count() == 0
