"""Ordered-funnel analysis over an events table: for each user, the
earliest time each funnel step completes, where step *i+1* must occur
STRICTLY AFTER the user's earliest completion of step *i*.

Reference parity: no counterpart in the reference repo — extension-layer
OLAP operator (product-analytics funnels over the `events` table).

Scale notes (100 TB): ONE shuffle, keyed by the user column: events
collapse to a per-user sorted struct array (`collect_list` under
partial aggregation), and every step time is then derived from that
array with HOFs — no self-joins (the naive formulation is k-1 chained
range joins), no window over the full stream. Per-user state is bounded
by that user's event count; pathological users (bots with millions of
events) should be capped upstream with `slice` if needed. Step columns
are staged sequentially so each HOF references plain columns (outer
expressions inside lambdas re-evaluate per element).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_user_stages", "funnel_counts"]


def _step_time(evs: Column, step: str, after: Column | None) -> Column:
    """Earliest ts of ``step`` events (strictly after ``after``)."""
    cond = (lambda e: e["et"] == step) if after is None else (
        lambda e: (e["et"] == step) & (e["ts"] > after)
    )
    return F.array_min(F.transform(F.filter(evs, cond), lambda e: e["ts"]))


def funnel_user_stages(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_events_per_user: int | None = None,
) -> DataFrame:
    """Per-user funnel progression: ``t_1..t_k`` (earliest completion
    time of each step, null once the funnel breaks) and
    ``stage_reached`` (number of completed steps, 0..k).

    ``max_events_per_user`` caps each user's sorted event array at the N
    EARLIEST events before step evaluation — bounds per-user state
    against bot-like users with millions of events (their funnel is then
    evaluated on the earliest window, which is where funnels complete)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    evs = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et")))
    )
    if max_events_per_user is not None:
        if max_events_per_user <= 0:
            raise ValueError("max_events_per_user must be positive")
        evs = F.slice(evs, 1, max_events_per_user)
    out = df.groupBy(user_col).agg(evs.alias("_evs"))
    prev: Column | None = None
    for i, step in enumerate(steps, start=1):
        out = out.withColumn(f"t_{i}", _step_time(F.col("_evs"), step, prev))
        prev = F.col(f"t_{i}")
    stage = F.lit(0)
    for i in range(1, len(steps) + 1):
        stage = F.when(F.col(f"t_{i}").isNotNull(), F.lit(i)).otherwise(stage)
    # t_i are monotonically "breakable": t_{i+1} is null whenever t_i is,
    # so the deepest non-null column IS the stage count
    return out.withColumn("stage_reached", stage.cast("long")).drop("_evs")


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Aggregate funnel: one row per step with the number of users whose
    funnel reached at least that step. Adds one tiny final aggregation
    (k counters) on top of the per-user pass."""
    users = funnel_user_stages(df, steps, user_col, ts_col, type_col)
    counters = [
        F.sum(F.col(f"t_{i}").isNotNull().cast("long")).alias(f"n_{i}")
        for i in range(1, len(steps) + 1)
    ]
    wide = users.agg(*counters)
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("step_index"),
                F.lit(step).alias("step"),
                F.col(f"n_{i}").alias("n_users"),
            )
            for i, step in enumerate(steps, start=1)
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select(
        "r.step_index", "r.step", "r.n_users"
    )
