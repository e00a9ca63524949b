"""Sessionization: gap-based session windows over an event stream.

Two implementations with identical semantics:

- ``sessionize_batch``: lag() + cumulative-sum session ids over a
  (user, ts) window — one shuffle on user_id, all built-ins, linear scan.
- ``sessionize_stream``: ``applyInPandasWithState`` — the custom stateful
  operator path for Structured Streaming. State per user is just the open
  session (start, last_ts, count) — O(users) state, evicted via timeout.

At 100 TB the batch variant is a single hash-partition by user_id; skewed
power-users are the known hazard (AQE skew handling applies since the
shuffle is a regular exchange).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), True),
        T.StructField("session_end", T.TimestampType(), True),
        T.StructField("n_events", T.LongType(), False),
    ]
)


def sessionize_batch(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(user, session_start, session_end, n_events), sessions split where
    the inter-event gap exceeds ``gap_minutes``."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    # integer microseconds, not seconds: cast-to-long truncation makes
    # gaps off by up to 1s at session boundaries
    ts = F.col(ts_col)
    if isinstance(events.schema[ts_col].dataType, T.TimestampNTZType):
        # unix_micros only accepts TIMESTAMP; with the session timezone
        # pinned to UTC the NTZ->TZ cast is an exact reinterpretation
        ts = ts.cast(T.TimestampType())
    us = F.unix_micros(ts)
    gap = us - F.lag(us).over(w)
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    with_ids = events.withColumn("_new", new_session).withColumn(
        "_sid", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_ids.groupBy(user_col, "_sid")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(user_col, "session_start", "session_end", "n_events")
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming sessionization via applyInPandasWithState.

    Per-user state = open session [start, last, count]. A batch's rows are
    sorted in Python (state functions see unordered micro-batch rows);
    closed sessions are emitted immediately, the open session stays in
    state and is flushed on event-time timeout (watermark-driven).

    ``events`` must already carry a watermark on ``ts_col``.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    state_schema = T.StructType(
        [
            T.StructField("start", T.LongType()),
            T.StructField("last", T.LongType()),
            T.StructField("count", T.LongType()),
        ]
    )
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        out: list[tuple[int, int, int]] = []  # (start_us, end_us, n)
        if state.hasTimedOut:
            if state.exists:
                s, last, n = state.get
                out.append((s, last, n))
                state.remove()
        else:
            ts_us: list[int] = []
            for pdf in pdfs:
                col = pd.to_datetime(pdf[ts_col])
                ts_us.extend(int(v.value // 1000) for v in col)
            ts_us.sort()
            if state.exists:
                s, last, n = state.get
            else:
                s = last = n = None
            for t in ts_us:
                if s is None:
                    s, last, n = t, t, 1
                elif t - last > gap_us:
                    out.append((s, last, n))
                    s, last, n = t, t, 1
                else:
                    last, n = max(last, t), n + 1
            if s is not None:
                state.update((s, last, n))
                # flush the open session once the watermark passes its gap
                state.setTimeoutTimestamp((last + gap_us) // 1000)
        yield pd.DataFrame(
            {
                "user_id": [user] * len(out),
                "session_start": [pd.Timestamp(s * 1000) for s, _, _ in out],
                "session_end": [pd.Timestamp(e * 1000) for _, e, _ in out],
                "n_events": [n for _, _, n in out],
            }
        )

    return events.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
