"""Typed-surface zero-overhead claim, made mechanical: every representative
pipeline in bench_overhead.py must compile to the SAME optimized logical
plan as its hand-written ``pyspark.sql`` twin (modulo auto-generated
expression/plan ids). Identical plans ⇒ identical cluster-side cost — the
typed layer can only add driver-side microseconds.

This is the executable form of BASELINE.md's target (the reference's
benchmarks/bench_overhead.py measures its typed layer vs raw Polars; here
the equivalence is asserted, not just measured)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(__file__))))


@pytest.fixture(scope="module")
def pipeline_pairs(spark, sf_dir, monkeypatch_module_sf):
    import bench_overhead

    return bench_overhead.pipelines(spark)


@pytest.fixture(scope="module")
def monkeypatch_module_sf(sf_dir):
    import bench_overhead

    old = bench_overhead.SF_DIR
    bench_overhead.SF_DIR = sf_dir
    yield
    bench_overhead.SF_DIR = old


def test_all_pipeline_plans_identical(pipeline_pairs):
    from bench_overhead import _norm_plan

    mismatches = {}
    for name, (typed, raw) in pipeline_pairs.items():
        t, r = _norm_plan(typed()), _norm_plan(raw())
        if t != r:
            mismatches[name] = (t, r)
    assert not mismatches, f"plans diverge for: {list(mismatches)}\n" + "\n\n".join(
        f"== {k} ==\nTYPED:\n{t}\nRAW:\n{r}" for k, (t, r) in mismatches.items()
    )


def test_pipeline_results_equal(pipeline_pairs):
    """Same plans must also mean same rows — belt and braces on a sample."""
    for name, (typed, raw) in pipeline_pairs.items():
        t = typed().limit(20).collect()
        r = raw().limit(20).collect()
        assert [tuple(x) for x in t] == [tuple(x) for x in r], name
