"""As-of join: for each left row, the most recent right row with
right.ts <= left.ts within the same key — the standard event/state
alignment primitive (trades↔quotes, events↔model-version, …).

Spark has no ASOF JOIN. The naive range-join (t_r <= t_l, max per left row)
explodes quadratically per key. This implementation uses the union+window
trick instead:

    union both sides with a side marker
    → one window partitioned by key, ordered by (ts, side)
    → last_value(right_payload, ignoreNulls) carries the latest right row
      forward onto every subsequent left row
    → filter back to left rows

Cost: ONE shuffle on the key (same as any groupBy), a linear sort per
partition, zero row multiplication — survives 100 TB and skewed keys
exactly as well as a hash aggregation does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    strict: bool = False,
) -> DataFrame:
    """Left as-of join. ``right_cols`` are carried from the matched right
    row (default: all non-key/ts columns). ``strict=True`` matches only
    right.ts < left.ts (exclusive)."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (key, ts)]

    l_cols = left.columns
    lifted = [f"{c}{suffix}" for c in right_cols]

    l_part = left.select(
        F.col(key),
        F.col(ts),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in l_cols if c not in (key, ts)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    r_part = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in l_cols
            if c not in (key, ts)
        ],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    both = l_part.unionByName(r_part)
    # right rows sort BEFORE left rows at equal ts (side 0 < 1), so an
    # equal-timestamp right row is visible to the left row unless strict
    order = [F.col(ts).asc(), F.col("_side").asc()]
    if strict:
        order = [F.col(ts).asc(), F.col("_side").desc()]
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    )
    carried = both.select(
        "*",
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).select(
        key, ts, *[c for c in l_cols if c not in (key, ts)], *lifted
    )
