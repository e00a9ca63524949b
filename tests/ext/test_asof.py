"""asof_join edge semantics: equal-ts inclusion, strict exclusion,
no-match nulls, per-key isolation."""

from __future__ import annotations

import datetime as dt

from colnade_spark.operators.asof import asof_join


def _t(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _t(5), "a"), (1, _t(10), "b"), (2, _t(3), "c"), (3, _t(1), "d")],
        "key long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _t(5), 100.0), (1, _t(7), 200.0), (2, _t(9), 300.0)],
        "key long, ts timestamp, val double",
    )
    return left, right


def test_asof_inclusive(spark):
    left, right = _frames(spark)
    out = {
        (r.key, r.tag): r.val_right
        for r in asof_join(left, right, key="key", ts="ts").collect()
    }
    assert out[(1, "a")] == 100.0  # equal ts matches
    assert out[(1, "b")] == 200.0  # latest prior
    assert out[(2, "c")] is None  # right row is in the future
    assert out[(3, "d")] is None  # key has no right rows


def test_asof_strict_excludes_equal_ts(spark):
    left, right = _frames(spark)
    out = {
        (r.key, r.tag): r.val_right
        for r in asof_join(left, right, key="key", ts="ts", strict=True).collect()
    }
    assert out[(1, "a")] is None  # equal ts excluded
    assert out[(1, "b")] == 200.0


def test_asof_single_shuffle_plan(spark):
    """The union+window implementation must not produce a join at all —
    one exchange on the key, no range-join row multiplication."""
    left, right = _frames(spark)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        asof_join(left, right, key="key", ts="ts").explain("formatted")
    text = buf.getvalue()
    assert "Join" not in text, text
    assert text.count("Exchange") <= 2, text  # union inputs share one shuffle spec
