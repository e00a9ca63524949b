"""Point-in-interval (range) joins without a cartesian product.

A range join ``right.start <= left.ts < right.end`` has no equi-key, so a
naive plan is a broadcast-nested-loop over every (point, interval) pair —
O(n·m) and a guaranteed scale-killer. The standard fix (used by every
warehouse range-join optimizer) is BIN BLOCKING: quantize time into
fixed-width bins, explode each interval into the bins it covers, map each
point to its single bin, equi-join on the bin id (plus any real equi
keys), then apply the exact containment predicate. Work is
O(points + intervals · bins_per_interval + true_matches).

Scale notes (100 TB):
- Choose ``bin_width_s`` near the typical interval length: each interval
  then explodes into ~2 bins, and the join is an ordinary equi-join that
  shuffles (or broadcasts) ids + bounds only.
- Long-tail intervals degrade gracefully (more bin rows, still linear);
  empty intervals (end <= start) match nothing by construction.
- The bin array is built with the CSE-safe ``F.filter``-over-``sequence``
  guard (``F.when`` around a HOF is excluded from common-subexpression
  elimination and recomputes the whole pipeline — see operators/text.py).

Reference parity: no counterpart — the reference has no rolling/as-of/
range/interval joins at all (SURVEY.md §2.6); extension layer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def _epoch_us(c: Column) -> Column:
    # timestamp -> microseconds since epoch; NTZ timestamps read under the
    # session's pinned-UTC zone cast identically.
    return c.cast("timestamp").cast("double") * 1_000_000.0


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    keys: Sequence[str] = (),
    bin_width_s: int = 600,
) -> DataFrame:
    """Inner-join point rows to interval rows with
    ``start <= ts < end`` (half-open), plus optional equi ``keys``
    present in both inputs.

    Returns all point columns plus the interval columns (interval columns
    colliding with point names are suffixed ``__iv``). Each matching
    (point, interval) pair appears exactly once — a point lies in exactly
    one bin, so the bin join cannot duplicate matches.
    """
    if bin_width_s <= 0:
        raise ValueError(f"bin_width_s must be positive, got {bin_width_s}")
    w = float(bin_width_s) * 1_000_000.0

    collisions = (set(points.columns) & set(intervals.columns)) - set(keys)
    rename = {c: f"{c}__iv" for c in collisions}
    iv = intervals.withColumnsRenamed(rename)
    s_col = rename.get(start_col, start_col)
    e_col = rename.get(end_col, end_col)

    pt = points.withColumn("_bin", F.floor(_epoch_us(F.col(ts_col)) / w))
    b0 = F.floor(_epoch_us(F.col(s_col)) / w)
    # half-open end: the bin of (end - 1µs); empty intervals yield b1 < b0
    b1 = F.floor((_epoch_us(F.col(e_col)) - 1.0) / w)
    iv = (
        iv.withColumn("_b0", b0)
        .withColumn("_b1", b1)
        # ascending-sequence guard: greatest() keeps sequence() non-empty
        # and ascending, the filter drops the phantom bin of an empty
        # interval (F.filter, not F.when — CSE exclusion).
        .withColumn(
            "_bins",
            F.filter(
                F.sequence(F.col("_b0"), F.greatest(F.col("_b1"), F.col("_b0"))),
                lambda b: b <= F.col("_b1"),
            ),
        )
        .withColumn("_bin", F.explode("_bins"))
        .drop("_b0", "_b1", "_bins")
    )

    on = [pt["_bin"] == iv["_bin"]]
    for k in keys:
        on.append(pt[k] == iv[k])
    cond = on[0]
    for c in on[1:]:
        cond = cond & c
    joined = pt.join(iv, cond, "inner").filter(
        (F.col(s_col) <= pt[ts_col]) & (pt[ts_col] < F.col(e_col))
    )
    out_cols = [pt[c] for c in points.columns] + [
        iv[rename.get(c, c)] for c in intervals.columns if c not in keys
    ]
    return joined.select(*out_cols)
