"""Funnel operator: hand-checked ordered-sequence semantics (strict
ordering, broken funnels, repeat events) plus real-events smoke."""

from __future__ import annotations

from datetime import datetime

import pytest

from colnade_spark.operators import funnel


def _ts(h):
    return datetime(2024, 1, 1, h)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # user 1: full funnel in order
        (1, _ts(1), "view"), (1, _ts(2), "click"), (1, _ts(3), "purchase"),
        # user 2: purchase BEFORE click -> stops at view+click, purchase
        # doesn't count (nothing after click)
        (2, _ts(1), "view"), (2, _ts(2), "purchase"), (2, _ts(3), "click"),
        # user 3: view only
        (3, _ts(1), "view"),
        # user 4: click/purchase but never viewed -> stage 0
        (4, _ts(1), "click"), (4, _ts(2), "purchase"),
        # user 5: repeated views, late click; earliest view counts
        (5, _ts(1), "view"), (5, _ts(5), "view"), (5, _ts(6), "click"),
    ]
    return spark.createDataFrame(rows, ["user_id", "ts", "event_type"])


STEPS = ["view", "click", "purchase"]


def test_funnel_user_stages(ev):
    out = {r.user_id: r for r in funnel.funnel_user_stages(ev, STEPS).collect()}
    assert out[1].stage_reached == 3
    assert out[2].stage_reached == 2 and out[2].t_3 is None
    assert out[3].stage_reached == 1
    assert out[4].stage_reached == 0 and out[4].t_1 is None
    assert out[5].stage_reached == 2
    assert out[5].t_1 == _ts(1) and out[5].t_2 == _ts(6)


def test_funnel_same_timestamp_is_not_after(spark):
    # step 2 at the SAME instant as step 1 does not count (strict >)
    rows = [(1, _ts(1), "view"), (1, _ts(1), "click")]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    r = funnel.funnel_user_stages(ev, ["view", "click"]).first()
    assert r.stage_reached == 1


def test_funnel_counts_monotone(ev):
    out = {r.step: r.n_users for r in funnel.funnel_counts(ev, STEPS).collect()}
    assert out == {"view": 4, "click": 3, "purchase": 1}


def test_funnel_on_real_events(spark, sf_dir):
    from colnade_spark import read_parquet
    from colnade_spark.tpch import Events, table_path

    e = read_parquet(table_path(sf_dir, "events"), Events, spark=spark).native
    counts = funnel.funnel_counts(e, ["signup", "view", "purchase"]).collect()
    ns = [r.n_users for r in sorted(counts, key=lambda r: r.step_index)]
    assert ns[0] >= ns[1] >= ns[2] > 0


def test_funnel_empty_steps_raises(ev):
    with pytest.raises(ValueError):
        funnel.funnel_user_stages(ev, [])


def test_funnel_event_cap(spark):
    # user 1: click arrives only after 4 events; cap at 2 hides it
    rows = [(1, _ts(1), "view"), (1, _ts(2), "x"), (1, _ts(3), "x"), (1, _ts(4), "click")]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    full = funnel.funnel_user_stages(ev, ["view", "click"]).first()
    capped = funnel.funnel_user_stages(
        ev, ["view", "click"], max_events_per_user=2
    ).first()
    assert full.stage_reached == 2 and capped.stage_reached == 1
    with pytest.raises(ValueError):
        funnel.funnel_user_stages(ev, ["view"], max_events_per_user=0)
