"""interval_join: bin-blocked point-in-interval join.

Cross-checked against a brute-force pairwise model, plus edge cases the
blocking must not break: empty intervals, boundary inclusivity, intervals
spanning many bins, equi-key scoping."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from colnade_spark.operators.intervals import interval_join

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [(i, _ts(m)) for i, m in enumerate([0, 5, 9.999, 10, 30, 59, 200])],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (100, _ts(0), _ts(10)),     # [0, 10): catches 0, 5, 9.999
            (101, _ts(10), _ts(10)),    # empty: catches nothing
            (102, _ts(25), _ts(60)),    # catches 30, 59 (end exclusive)
            (103, _ts(-500), _ts(500)), # spans many bins: catches all
            (104, _ts(59), _ts(59.5)),  # sub-bin: catches 59
        ],
        "iid long, s timestamp, e timestamp",
    )
    return points, intervals


def _expected(points, intervals):
    pts = [(r.pid, r.ts) for r in points.collect()]
    ivs = [(r.iid, r.s, r.e) for r in intervals.collect()]
    return sorted(
        (pid, iid) for pid, ts in pts for iid, s, e in ivs if s <= ts < e
    )


@pytest.mark.parametrize("bin_width_s", [60, 600, 7 * 3600])
def test_matches_brute_force_at_any_bin_width(frames, bin_width_s):
    points, intervals = frames
    got = interval_join(points, intervals, "ts", "s", "e", bin_width_s=bin_width_s)
    pairs = sorted((r.pid, r.iid) for r in got.collect())
    assert pairs == _expected(points, intervals)


def test_no_duplicate_pairs_when_interval_spans_bins(frames):
    points, intervals = frames
    got = interval_join(points, intervals, "ts", "s", "e", bin_width_s=60)
    pairs = [(r.pid, r.iid) for r in got.collect()]
    assert len(pairs) == len(set(pairs))


def test_keys_scope_the_match(spark):
    points = spark.createDataFrame(
        [(1, "u1", _ts(5)), (2, "u2", _ts(5))], "pid long, uid string, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [("u1", _ts(0), _ts(10))], "uid string, s timestamp, e timestamp"
    )
    got = interval_join(
        points, intervals, "ts", "s", "e", keys=["uid"], bin_width_s=600
    )
    assert [(r.pid, r.uid) for r in got.collect()] == [(1, "u1")]


def test_collision_columns_are_suffixed(spark):
    points = spark.createDataFrame([(1, _ts(5))], "pid long, ts timestamp")
    intervals = spark.createDataFrame(
        [(9, _ts(0), _ts(10))], "pid long, s timestamp, e timestamp"
    )
    got = interval_join(points, intervals, "ts", "s", "e", bin_width_s=600)
    row = got.collect()[0]
    assert row.pid == 1 and row.pid__iv == 9


def test_rejects_nonpositive_bin_width(frames):
    points, intervals = frames
    with pytest.raises(ValueError):
        interval_join(points, intervals, "ts", "s", "e", bin_width_s=0)


def test_plan_is_equi_join_not_nested_loop(frames):
    points, intervals = frames
    got = interval_join(points, intervals, "ts", "s", "e", bin_width_s=600)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
