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


# -- semantic (embedding) decontamination ------------------------------------


def test_semantic_contaminated_ids_finds_planted_dup(spark):
    from colnade_spark.operators.decontaminate import semantic_contaminated_ids

    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0])],
        ["vec_id", "embedding"],
    )
    corpus = spark.createDataFrame(
        [
            (1, [0.99, 0.01, 0.0]),   # ~ bench 100
            (2, [0.0, 0.0, 1.0]),     # orthogonal to both
            (3, [0.0, -1.0, 0.0]),    # anti-parallel: cos -1
            (4, [0.0, 0.0, 0.0]),     # zero vector: null cosine, never hits
        ],
        ["vec_id", "embedding"],
    )
    got = {
        r.vec_id
        for r in semantic_contaminated_ids(corpus, bench, threshold=0.9).collect()
    }
    assert got == {1}


def test_semantic_contamination_is_broadcast_no_shuffle(spark, sf_dir):
    """The benchmark side must broadcast: BroadcastNestedLoopJoin with no
    exchange of the corpus."""
    import io as _io
    from contextlib import redirect_stdout

    from colnade_spark.operators.decontaminate import semantic_contaminated_ids
    from colnade_spark.tpch import table_path

    emb = spark.read.parquet(table_path(sf_dir, "embeddings"))
    out = semantic_contaminated_ids(
        emb.filter("vec_id % 50 != 0"), emb.filter("vec_id % 50 = 0"), 0.4
    )
    buf = _io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" in plan, plan
    # the only exchange is the final distinct on the (tiny) id set
    pre_distinct = plan.split("HashAggregate")[0]
    assert "Exchange" not in pre_distinct.split("BroadcastExchange")[0], plan
