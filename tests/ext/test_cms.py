"""Count-min sketch: python-model equality of the counter grid, the
estimate-dominates-truth invariant, lossless merge, and partitioning
invariance."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from colnade_spark.operators import cms
from colnade_spark.operators.spans import clean_tokens

D, W = 4, 1 << 10


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_cells(tokens: list[str]) -> Counter:
    cells: Counter = Counter()
    for t in tokens:
        for r in range(D):
            cells[(r, _h60(f"{t}#{r}") % W)] += 1
    return cells


@pytest.fixture(scope="module")
def toks(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(F.explode(clean_tokens(F.col("text"))).alias("tok")).cache()


def test_cells_match_python_model(toks):
    token_list = [r.tok for r in toks.collect()]
    want = _py_cells(token_list)
    got = {
        (r.row, r.bucket): r.cnt
        for r in cms.cms_build(toks, "tok", D, W).collect()
    }
    assert got == dict(want)


def test_estimate_dominates_truth_everywhere(toks):
    table = cms.cms_build(toks, "tok", D, W)
    exact = toks.groupBy("tok").agg(F.count("*").alias("n"))
    est = cms.cms_estimate(table, exact, "tok", D, W)
    rows = exact.join(est, "tok").collect()
    assert rows and all(r.n_est >= r.n for r in rows)
    # a deliberately tiny width FORCES full-depth collisions, making the
    # dominance invariant non-vacuous (over-counts appear, never unders)
    tiny = cms.cms_build(toks, "tok", D, 8)
    trows = exact.join(
        cms.cms_estimate(tiny, exact, "tok", D, 8), "tok"
    ).collect()
    assert all(r.n_est >= r.n for r in trows)
    assert any(r.n_est > r.n for r in trows)


def test_merge_equals_direct_build(spark, sf_dir, toks):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    parts = [
        docs.filter(f"doc_id % 3 = {i}").select(
            F.explode(clean_tokens(F.col("text"))).alias("tok")
        )
        for i in range(3)
    ]
    merged = cms.cms_merge(*[cms.cms_build(p, "tok", D, W) for p in parts])
    direct = cms.cms_build(toks, "tok", D, W)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_estimates_invariant_under_partitioning(toks):
    a = cms.cms_build(toks, "tok", D, W)
    b = cms.cms_build(toks.repartition(13), "tok", D, W)
    cand = toks.limit(50)
    ea = sorted(map(tuple, cms.cms_estimate(a, cand, "tok", D, W).collect()))
    eb = sorted(map(tuple, cms.cms_estimate(b, cand, "tok", D, W).collect()))
    assert ea == eb


def test_merge_requires_input():
    with pytest.raises(ValueError):
        cms.cms_merge()


def test_unseen_item_estimates_bounded(spark, toks):
    """An item never inserted estimates as the min of whatever collided
    into its cells — possibly 0 (empty cells), never negative."""
    table = cms.cms_build(toks, "tok", D, W)
    cand = spark.createDataFrame(
        [("zzz-never-seen-1",), ("zzz-never-seen-2",)], ["tok"]
    )
    rows = cms.cms_estimate(table, cand, "tok", D, W).collect()
    assert all(r.n_est >= 0 for r in rows)


def test_streaming_cms_maintenance_matches_batch(spark, sf_dir, toks, tmp_path):
    """Stream documents through maintain_cms_table; the cell-wise-summed
    history must equal the single-pass batch sketch exactly."""
    from colnade_spark.streaming import scan_stream_parquet
    from colnade_spark.tpch import Documents, table_path

    dest = str(tmp_path / "cms_table")
    ck = str(tmp_path / "ck")
    sf = scan_stream_parquet(table_path(sf_dir, "documents"), Documents, spark=spark)
    tok_stream = sf.native.select(
        F.explode(clean_tokens(F.col("text"))).alias("tok")
    )
    q = cms.maintain_cms_table(tok_stream, "tok", dest, ck, D, W)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = sorted(map(tuple, cms.load_cms(spark, dest).select("row", "bucket", "cnt").collect()))
    direct = sorted(map(tuple, cms.cms_build(toks, "tok", D, W).select("row", "bucket", F.col("cnt").cast("long")).collect()))
    assert streamed == direct


def test_cms_manifest_written_and_verified(spark, sf_dir, tmp_path):
    """maintain_cms_table persists a (scheme, depth, width) manifest;
    load_cms errors on mismatched probe parameters instead of silently
    mis-estimating; restarting the maintainer with a different layout
    refuses before streaming."""
    import pytest
    from pyspark.sql import functions as F

    from colnade_spark.operators import cms
    from colnade_spark.streaming import scan_stream_parquet
    from colnade_spark.streaming.stream import read_table_manifest
    from colnade_spark.tpch import Documents, table_path

    dest = str(tmp_path / "cms_table")
    sf = scan_stream_parquet(table_path(sf_dir, "documents"), Documents, spark=spark)
    items = sf.native.select(F.explode(F.split("text", " ")).alias("term"))
    q = cms.maintain_cms_table(
        items, "term", dest, str(tmp_path / "ck"), depth=4, width=1 << 10
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert read_table_manifest(spark, dest, "_cms_params.json") == {
        "scheme": cms.CMS_SCHEME,
        "depth": 4,
        "width": 1 << 10,
    }
    assert cms.load_cms(spark, dest, depth=4, width=1 << 10).count() > 0
    with pytest.raises(ValueError, match="wrong answers"):
        cms.load_cms(spark, dest, depth=8, width=1 << 10)
    with pytest.raises(ValueError, match="wrong answers"):
        cms.load_cms(spark, dest, width=1 << 14)
    sf2 = scan_stream_parquet(table_path(sf_dir, "documents"), Documents, spark=spark)
    items2 = sf2.native.select(F.explode(F.split("text", " ")).alias("term"))
    with pytest.raises(ValueError, match="refusing"):
        cms.maintain_cms_table(
            items2, "term", dest, str(tmp_path / "ck2"), depth=4, width=1 << 12
        )
