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


def test_bloom_contains_every_exact_contamination(spark, sf_dir):
    """Bloom screening can only ADD (deterministic false positives) —
    it must never miss a truly contaminated doc."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    words = decontaminate.build_bloom(bench, n=13, m_bits=1 << 16, n_hashes=4)
    bloom = {
        r.doc_id
        for r in decontaminate.bloom_contaminated_ids(
            docs, words, n=13, m_bits=1 << 16, n_hashes=4
        ).collect()
    }
    exact = {
        r.doc_id
        for r in decontaminate.contaminated_ids(docs, bench, n=13).collect()
    }
    assert exact and exact <= bloom


def test_bloom_tiny_filter_floods_deterministically(spark, sf_dir):
    """At m=64 bits the filter saturates: every doc with >=1 gram flags.
    Pins that false positives are a deterministic function of (m, k),
    not an artifact of partitioning."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    words = decontaminate.build_bloom(bench, n=13, m_bits=64, n_hashes=2)
    a = sorted(
        r.doc_id
        for r in decontaminate.bloom_contaminated_ids(
            docs, words, n=13, m_bits=64, n_hashes=2
        ).collect()
    )
    b = sorted(
        r.doc_id
        for r in decontaminate.bloom_contaminated_ids(
            docs.repartition(7), words, n=13, m_bits=64, n_hashes=2
        ).collect()
    )
    assert a == b and len(a) > 0


def test_bloom_validates_shapes(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        decontaminate.build_bloom(df, m_bits=100)
    with pytest.raises(ValueError):
        decontaminate.bloom_contaminated_ids(df, [0] * 10, m_bits=1 << 16)


def test_streaming_bloom_maintenance_matches_batch(spark, sf_dir, tmp_path):
    """Stream the benchmark docs through maintain_bloom_table; the merged
    persisted word table must equal the single-pass batch bitmap WORD FOR
    WORD (bit_or merge is lossless), so streamed and batch filters flag
    identical doc sets."""
    from pyspark.sql import functions as F

    from colnade_spark.streaming import scan_stream_parquet
    from colnade_spark.tpch import Documents, table_path

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench_pred = "doc_id % 50 = 0"
    dest = str(tmp_path / "bloom_table")
    ck = str(tmp_path / "ck")
    sf = scan_stream_parquet(table_path(sf_dir, "documents"), Documents, spark=spark)
    q = decontaminate.maintain_bloom_table(
        sf.native.filter(bench_pred), dest, ck, n=13, m_bits=1 << 16, n_hashes=4
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = decontaminate.load_bloom(spark, dest, 1 << 16)
    batch = decontaminate.build_bloom(
        docs.filter(bench_pred), n=13, m_bits=1 << 16, n_hashes=4
    )
    assert streamed == batch


def test_bloom_manifest_written_and_verified(spark, sf_dir, tmp_path):
    """maintain_bloom_table persists a (scheme, n, m_bits, n_hashes)
    manifest; load_bloom errors on mismatched parameters instead of
    silently probing old bits with a new layout (ADVICE round 3)."""
    from colnade_spark.streaming import scan_stream_parquet
    from colnade_spark.tpch import Documents, table_path

    dest = str(tmp_path / "bloom_table")
    sf = scan_stream_parquet(table_path(sf_dir, "documents"), Documents, spark=spark)
    q = decontaminate.maintain_bloom_table(
        sf.native.filter("doc_id % 50 = 0"),
        dest,
        str(tmp_path / "ck"),
        n=13,
        m_bits=1 << 16,
        n_hashes=4,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    mf = decontaminate.read_bloom_manifest(spark, dest)
    assert mf == {
        "scheme": decontaminate.BLOOM_SCHEME,
        "n": 13,
        "m_bits": 1 << 16,
        "n_hashes": 4,
    }
    # matching load passes (with and without the optional pins)
    assert len(decontaminate.load_bloom(spark, dest, 1 << 16, n=13, n_hashes=4)) == (1 << 16) // 64
    # wrong m_bits / n / n_hashes all refuse
    with pytest.raises(ValueError, match="false negatives"):
        decontaminate.load_bloom(spark, dest, 1 << 20)
    with pytest.raises(ValueError, match="false negatives"):
        decontaminate.load_bloom(spark, dest, 1 << 16, n=5)
    with pytest.raises(ValueError, match="false negatives"):
        decontaminate.load_bloom(spark, dest, 1 << 16, n_hashes=8)
    # a maintainer restarted with different params refuses before streaming
    sf2 = scan_stream_parquet(table_path(sf_dir, "documents"), Documents, spark=spark)
    with pytest.raises(ValueError, match="refusing"):
        decontaminate.maintain_bloom_table(
            sf2.native, dest, str(tmp_path / "ck2"), n=13, m_bits=1 << 18, n_hashes=4
        )
    # pre-manifest tables (no json next to the parquet) skip the check
    import shutil, os

    legacy = str(tmp_path / "legacy")
    shutil.copytree(dest, legacy)
    os.remove(f"{legacy}/_bloom_params.json")
    assert decontaminate.load_bloom(spark, legacy, 1 << 16) == decontaminate.load_bloom(
        spark, dest, 1 << 16
    )


def test_contamination_report_hand_checked(spark):
    """Graded overlap: a bench doc fully inside the corpus reports 1.0;
    a partially-shared doc reports the exact gram fraction; a disjoint
    doc 0.0; a doc shorter than n is omitted; overlap_frac>0 coincides
    with the boolean contaminated rule."""
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "one two three four five six"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [
            (100, "alpha beta gamma delta epsilon"),   # fully contained
            (101, "zero one two three nine eight"),    # partial overlap
            (102, "totally different words here now"), # disjoint
            (103, "too short"),                        # < n tokens: omitted
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: (r.n_grams, r.n_hit, r.overlap_frac)
        for r in decontaminate.contamination_report(corpus, bench, n=3).collect()
    }
    assert set(out) == {100, 101, 102}
    assert out[100] == (3, 3, 1.0)
    # 101's 3-grams: [zero one two][one two three][two three nine][three nine eight]
    # -> 4 grams, 1 hit ('one two three')
    assert out[101] == (4, 1, 0.25)
    assert out[102] == (3, 0, 0.0)
    # boolean rule equivalence
    bad = {
        r.doc_id
        for r in decontaminate.contaminated_ids(
            bench, corpus, n=3
        ).collect()
    }
    assert bad == {d for d, (_, h, _f) in out.items() if h > 0}


def test_semantic_contamination_report_hand_checked(spark):
    """max_cos is the nearest-benchmark cosine; self rows report 1.0;
    zero-norm corpus rows NULL; max_cos >= t coincides with the boolean
    semantic rule."""
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.0, 2.0]),
            (3, [-1.0, 0.0]),
            (4, [0.0, 0.0]),   # zero norm -> NULL
        ],
        ["vec_id", "embedding"],
    )
    bench = spark.createDataFrame(
        [(10, [2.0, 0.0]), (11, [1.0, 1.0])], ["vec_id", "embedding"]
    )
    out = {
        r.vec_id: r.max_cos
        for r in decontaminate.semantic_contamination_report(
            corpus, bench
        ).collect()
    }
    import math

    assert out[1] == 1.0
    assert abs(out[2] - round(1 / math.sqrt(2), 6)) < 1e-9
    # [-1,0]: cos vs [2,0] is -1, vs [1,1] is -1/sqrt(2) — the max
    assert abs(out[3] - round(-1 / math.sqrt(2), 6)) < 1e-9
    assert out[4] is None
    flagged = {
        r.vec_id
        for r in decontaminate.semantic_contaminated_ids(
            corpus, bench, threshold=0.9
        ).collect()
    }
    assert flagged == {v for v, c in out.items() if c is not None and c >= 0.9}


def test_bloom_duplicate_gate_null_text_passes(spark):
    """NULL-text rows have no fingerprint and must pass the gate, not be
    silently dropped by three-valued filter logic."""
    df = spark.createDataFrame(
        [(1, "some history text"), (2, None), (3, "fresh text")],
        ["doc_id", "text"],
    )
    words = decontaminate.build_bloom(
        spark.createDataFrame([(1, "some history text")], ["doc_id", "text"]),
        n=1,
        m_bits=1 << 10,
    )
    # fingerprint bloom over the history doc's fingerprint
    from colnade_spark.operators.text import fingerprint
    from pyspark.sql import functions as F

    hist = spark.createDataFrame([("some history text",)], ["text"])
    grams = hist.select(fingerprint(F.col("text")).alias("_g"))
    fp_words = [0] * ((1 << 10) // 64)
    for r in decontaminate._words_from_grams(grams, 1 << 10, 4).collect():
        fp_words[r._w] = r._bits
    kept = {
        r.doc_id
        for r in decontaminate.bloom_duplicate_gate(
            df, fp_words, m_bits=1 << 10, n_hashes=4
        ).collect()
    }
    assert kept == {2, 3}


def test_contaminated_spans_surgical_removal(spark):
    """Planted leak: a benchmark passage embedded mid-document is found
    as exactly one maximal span and only its tokens are removed."""
    from colnade_spark.operators.decontaminate import (
        contaminated_spans,
        remove_contaminated_spans,
    )

    leak = " ".join(f"bench{i}" for i in range(15))  # 15 tokens, n=13
    prefix = " ".join(f"pre{i}" for i in range(5))
    suffix = " ".join(f"post{i}" for i in range(5))
    rows = [
        (1, f"{prefix} {leak} {suffix}"),          # leak mid-doc
        (2, "totally unrelated clean document with enough words here"),
        (3, leak),                                  # the whole doc is a leak
        (4, None),                                  # NULL text survives
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    bench = spark.createDataFrame([(100, f"intro words {leak} outro")],
                                  ["bid", "text"])

    spans = {
        r.doc_id: (r.span_start, r.span_end)
        for r in contaminated_spans(df, bench, n=13).collect()
    }
    # doc 1: leak occupies tokens 5..19 -> windows 5..7 merge to [5, 19]
    assert spans[1] == (5, 19)
    assert spans[3] == (0, 14)
    assert 2 not in spans and 4 not in spans

    out = {
        r.doc_id: r.text_clean
        for r in remove_contaminated_spans(df, bench, n=13).collect()
    }
    assert out[1] == f"{prefix} {suffix}"
    assert out[2] == rows[1][1]  # untouched (already normalized form)
    assert out[3] == ""          # fully leaked doc empties
    assert out[4] == ""          # NULL text -> empty normalized stream

    # sub-n leaks do NOT fire (the GPT-3 rule's n floor)
    short_bench = spark.createDataFrame([(1, "pre0 pre1 pre2")], ["bid", "text"])
    assert contaminated_spans(df, short_bench, n=13).count() == 0


def test_contaminated_spans_broadcast_plan(spark, sf_dir):
    from pyspark.sql import functions as F

    from colnade_spark.operators.decontaminate import contaminated_spans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 100 == 0).select("doc_id", "text")
    plan = (
        contaminated_spans(docs, bench)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "Cartesian" not in plan, plan


def test_bloom_bitmap_literal_covers_64bit_edge_words(spark):
    """The bitmap rides the plan via lit_long_array (one SQL parse, not
    one py4j call per word): words with the sign bit set — including a
    word whose ONLY set bit is 63, i.e. INT64_MIN — must round-trip the
    SQL literal path exactly, and the probe must behave identically to
    the bit math: an all-ones bitmap flags every gram-bearing doc, an
    all-zeros bitmap flags none."""
    from pyspark.sql import functions as F

    from colnade_spark.operators.litutil import lit_long_array

    edge_words = [-(1 << 63), -1, 0, 1, (1 << 63) - 1, 1 << 62]
    got = spark.range(1).select(lit_long_array(edge_words).alias("w")).first().w
    assert list(got) == edge_words

    docs = spark.createDataFrame(
        [(1, " ".join(f"tok{i}" for i in range(20))), (2, "too short")],
        ["doc_id", "text"],
    )
    m_bits = 1 << 10
    all_ones = [-1] * (m_bits // 64)   # every probe positive
    all_zero = [0] * (m_bits // 64)    # every probe negative
    hit = decontaminate.bloom_contaminated_ids(
        docs, all_ones, n=13, m_bits=m_bits, n_hashes=4
    )
    assert {r.doc_id for r in hit.collect()} == {1}  # doc 2 has no 13-gram
    miss = decontaminate.bloom_contaminated_ids(
        docs, all_zero, n=13, m_bits=m_bits, n_hashes=4
    )
    assert miss.count() == 0
