"""Skew-handling join utilities.

First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`, on by
default in session.py): it splits oversized shuffle partitions at runtime.
``salted_join`` is the explicit fallback for the cases AQE can't fix —
a single hot key whose rows exceed one executor's memory, or a
non-broadcastable medium right side joined against a heavily skewed left.

Mechanics: left rows get a uniform random salt in [0, salt); the right side
is replicated ``salt``× with every salt value; the join key becomes
(key, salt), spreading each hot key over ``salt`` shuffle partitions.
Cost: right side shuffles ``salt``× its size — use only when right ≪ left.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def full_shuffle_width(df: DataFrame) -> int:
    """The session's configured shuffle width (spark.sql.shuffle.partitions).

    Used to pin exchanges that feed COMPUTE-dense stages — shingling,
    per-pair set intersection, bounded edit distance — at explicit width:
    AQE's partition coalescing sizes post-shuffle partitions by shuffle
    BYTES, but these stages cost orders of magnitude more CPU per byte
    than a scan, so byte-sized coalescing runs them on a handful of tasks
    while the rest of the cluster idles (measured at sf0.1: the
    minhash-audit exact-Jaccard stage coalesced to ONE task holding 3.5 s
    of CPU). Passing an explicit numPartitions marks the exchange
    REPARTITION_BY_NUM, which AQE never coalesces; the value is the
    cluster-sized conf knob (env-overridable via SPARK_GRAFT_SHUFFLE in
    session.py), never a literal."""
    try:
        return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return df.sparkSession.sparkContext.defaultParallelism


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
    seed: int | None = None,
) -> DataFrame:
    """Equi-join on ``on`` with ``salt``-way key spreading.

    Semantics identical to ``left.join(right, on, how)`` for how ∈
    {inner, left}; right/full would duplicate unmatched right rows and are
    rejected."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    l_salted = left.withColumn(
        "_salt", (F.rand(seed) * salt).cast("int")
    )
    r_salted = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l_salted.join(r_salted, [on, "_salt"], how)
    return out.drop("_salt")
