"""Property-based differential testing: hypothesis-generated frames run
through the typed API and through DuckDB SQL on the SAME data; results must
agree. Catches translation bugs the example-based tests can't enumerate
(null interactions, boundary literals, empty frames, degenerate groups).

The reference has no property-based tests (SURVEY.md §5) — this layer is an
extension of its strategy, sized to stay fast (small max_examples; one
shared SparkSession; deadline disabled since Spark actions are seconds).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from colnade_spark.dataframe import DataFrame
from colnade_spark.dtypes import Float64, Int64, Utf8
from colnade_spark.schema import Column, Schema


class T(Schema):
    i: Column[Int64 | None]
    x: Column[Float64 | None]
    s: Column[Utf8]


ints = st.one_of(st.none(), st.integers(min_value=-(2**31), max_value=2**31))
floats = st.one_of(
    st.none(),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
)
strings = st.sampled_from(["", "a", "ab", "ba", "Aa", "zzz", "a b"])


@st.composite
def frames(draw):
    n = draw(st.integers(min_value=0, max_value=30))
    return {
        "i": [draw(ints) for _ in range(n)],
        "x": [draw(floats) for _ in range(n)],
        "s": [draw(strings) for _ in range(n)],
    }


def _duck(data):
    con = duckdb.connect()
    con.register(
        "t",
        pd.DataFrame(
            {
                "i": pd.array(data["i"], dtype="Int64"),
                "x": pd.array(data["x"], dtype="Float64"),
                "s": pd.array(data["s"], dtype="string"),
            }
        ),
    )
    return con


def _key(row):
    out = []
    for v in row:
        if v is None:
            out.append((0, ""))
        elif isinstance(v, bool):
            out.append((1, str(int(v))))
        elif isinstance(v, (int, float)):
            # + 0.0 normalizes signed zero: engines may disagree on -0.0
            # vs 0.0 (numerically equal) and the string key must not
            # misalign otherwise-matching rows
            out.append((2, f"{float(v) + 0.0:.9e}"))
        else:
            out.append((3, str(v)))
    return tuple(out)


def _rows(df):
    return sorted(
        (tuple(None if v is None else v for v in r) for r in df.native.collect()),
        key=_key,
    )


def _close(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def _assert_same(got, want, ctx):
    assert len(got) == len(want), (ctx, len(got), len(want), got[:3], want[:3])
    for g, w in zip(got, want):
        assert len(g) == len(w) and all(_close(x, y) for x, y in zip(g, w)), (
            ctx,
            g,
            w,
        )


common = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@pytest.mark.usefixtures("spark")
@common
@given(data=frames(), c=st.integers(min_value=-100, max_value=100))
def test_filter_differential(spark, data, c):
    f = DataFrame.from_dict(data, T)
    got = _rows(f.filter((T.i > c) | (T.s.str_contains("a") & T.x.is_not_null())))
    want = sorted(
        (
            tuple(None if pd.isna(v) else v for v in r)
            for r in _duck(data)
            .execute(
                f"SELECT i, x, s FROM t WHERE i > {c} OR (contains(s, 'a') AND x IS NOT NULL)"
            )
            .fetchall()
        ),
        key=_key,
    )
    _assert_same(got, want, f"filter c={c}")


@pytest.mark.usefixtures("spark")
@common
@given(data=frames())
def test_groupby_agg_differential(spark, data):
    f = DataFrame.from_dict(data, T)
    agged = f.group_by(T.s).agg(
        T.i.sum().alias("si"),
        T.i.count().alias("ci"),
        T.x.min().alias("mn"),
        T.x.max().alias("mx"),
    )
    got = _rows(agged.cast_schema(_AggOut))
    want = sorted(
        (
            tuple(None if pd.isna(v) else v for v in r)
            for r in _duck(data)
            .execute(
                "SELECT s, sum(i) AS si, count(i) AS ci, min(x) AS mn, max(x) AS mx"
                " FROM t GROUP BY s"
            )
            .fetchall()
        ),
        key=_key,
    )
    _assert_same(got, want, "groupby")


class _AggOut(Schema):
    s: Column[Utf8]
    si: Column[Int64 | None]
    ci: Column[Int64]
    mn: Column[Float64 | None]
    mx: Column[Float64 | None]


@pytest.mark.usefixtures("spark")
@common
@given(data=frames(), k=st.integers(min_value=1, max_value=7))
def test_arithmetic_differential(spark, data, k):
    f = DataFrame.from_dict(data, T)
    out = f.with_columns(
        (T.i % k).alias("m"),
        (T.x * 2 + 1).alias("y"),
        T.i.fill_null(0).alias("fi"),
    )
    got = sorted(
        (
            tuple(None if v is None else v for v in (r.m, r.y, r.fi))
            for r in out.native.collect()
        ),
        key=_key,
    )
    want = sorted(
        (
            tuple(None if pd.isna(v) else v for v in r)
            for r in _duck(data)
            .execute(f"SELECT i % {k} AS m, x * 2 + 1 AS y, coalesce(i, 0) AS fi FROM t")
            .fetchall()
        ),
        key=_key,
    )
    _assert_same(got, want, f"arith k={k}")


@pytest.mark.usefixtures("spark")
@common
@given(data=frames())
def test_math_functions_differential(spark, data):
    """abs/floor/ceil/sqrt/ln/pow vs DuckDB on hypothesis-generated data.
    ln is guarded in the SQL twin (DuckDB errors on ln(<=0), Spark yields
    null); round() is deliberately absent — half-up vs binary-tie behavior
    is pinned by example tests with decimal inputs instead."""
    f = DataFrame.from_dict(data, T)
    out = f.with_columns(
        T.i.abs().alias("ai"),
        T.x.floor().alias("fx"),
        T.x.ceil().alias("cx"),
        T.x.abs().sqrt().alias("sx"),
        T.x.ln().alias("lx"),
        T.x.pow(2).alias("px"),
    )
    got = sorted(
        (
            tuple(
                None if v is None else v
                for v in (r.ai, r.fx, r.cx, r.sx, r.lx, r.px)
            )
            for r in out.native.collect()
        ),
        key=_key,
    )
    want = sorted(
        (
            tuple(None if pd.isna(v) else v for v in r)
            for r in _duck(data)
            .execute(
                "SELECT abs(i) AS ai, floor(x) AS fx, ceil(x) AS cx, "
                "sqrt(abs(x)) AS sx, "
                "CASE WHEN x > 0 THEN ln(x) END AS lx, "
                "pow(x, 2) AS px FROM t"
            )
            .fetchall()
        ),
        key=_key,
    )
    _assert_same(got, want, "math")


@pytest.mark.usefixtures("spark")
@common
@given(data=frames())
def test_regex_functions_differential(spark, data):
    f = DataFrame.from_dict(data, T)
    out = f.with_columns(
        T.s.str_extract("(a+)", 1).alias("ex"),
        # '(a*)' can match with an EMPTY capture — both engines collapse ''
        # to NULL, so this previously-divergent class is now exercised
        T.s.str_extract("(a*)", 1).alias("exe"),
        T.s.str_matches("[ab]").alias("mt"),
        T.s.str_slice(1, 2).alias("sl"),
    )
    got = sorted(
        (
            tuple(None if v is None else v for v in (r.ex, r.exe, r.mt, r.sl))
            for r in out.native.collect()
        ),
        key=_key,
    )
    want = sorted(
        (
            tuple(None if pd.isna(v) else v for v in r)
            for r in _duck(data)
            .execute(
                "SELECT NULLIF(regexp_extract(s, '(a+)', 1), '') AS ex, "
                "NULLIF(regexp_extract(s, '(a*)', 1), '') AS exe, "
                "regexp_matches(s, '[ab]') AS mt, "
                "substring(s, 2, 2) AS sl FROM t"
            )
            .fetchall()
        ),
        key=_key,
    )
    _assert_same(got, want, "regex")


@pytest.mark.usefixtures("spark")
@common
@given(data=frames(), w=st.integers(min_value=0, max_value=5))
def test_window_frames_differential(spark, data, w):
    """cum_sum (ROWS unbounded) and rolling_sum (ROWS bounded) over a
    unique composite order key, on INTEGER data — sums are exact, so the
    comparison needs no float tolerance. Rows with null group keys and
    null values are exercised by construction."""
    from colnade_spark import cum_sum, rolling_sum

    # unique order key: (i is not unique) -> order by (i, x, s) would still
    # tie on duplicate full rows; add an explicit index instead
    data = dict(data)
    n = len(data["i"])
    data["idx"] = list(range(n))

    class _TI(Schema):
        i: Column[Int64 | None]
        x: Column[Float64 | None]
        s: Column[Utf8]
        idx: Column[Int64]

    f = DataFrame.from_dict(data, _TI)
    out = f.with_columns(
        cum_sum(_TI.i, partition_by=_TI.s, order_by=_TI.idx).alias("cs"),
        rolling_sum(
            _TI.i, partition_by=_TI.s, order_by=_TI.idx, preceding=w
        ).alias("rs"),
    )
    got = sorted(
        ((r.idx, r.cs, r.rs) for r in out.native.collect()), key=_key
    )
    want = sorted(
        (
            tuple(None if pd.isna(v) else int(v) if v is not None and j > 0 else v
                  for j, v in enumerate(r))
            for r in _duck_with_idx(data)
            .execute(
                f"""SELECT idx,
                  sum(i) OVER (PARTITION BY s ORDER BY idx
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
                  sum(i) OVER (PARTITION BY s ORDER BY idx
                    ROWS BETWEEN {w} PRECEDING AND CURRENT ROW) AS rs
                FROM t"""
            )
            .fetchall()
        ),
        key=_key,
    )
    _assert_same(got, want, f"window w={w}")


def _duck_with_idx(data):
    con = duckdb.connect()
    con.register(
        "t",
        pd.DataFrame(
            {
                "i": pd.array(data["i"], dtype="Int64"),
                "x": pd.array(data["x"], dtype="Float64"),
                "s": pd.array(data["s"], dtype="string"),
                "idx": pd.array(data["idx"], dtype="Int64"),
            }
        ),
    )
    return con
