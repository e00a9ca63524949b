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
