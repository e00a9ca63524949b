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

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BYTE_SUFFIX = {
    "": 1,
    "b": 1,
    "k": 1 << 10,
    "kb": 1 << 10,
    "m": 1 << 20,
    "mb": 1 << 20,
    "g": 1 << 30,
    "gb": 1 << 30,
}


def _bytes_conf(spark, key: str, default: int) -> int:
    """A byte-size conf value ('134217728b', '128m', '1g') as an int."""
    try:
        raw = str(spark.conf.get(key)).strip().lower()
    except Exception:  # pragma: no cover - conf not set anywhere
        return default
    m = re.match(r"^(\d+)([a-z]*)$", raw)
    if not m or m.group(2) not in _BYTE_SUFFIX:
        return default
    return int(m.group(1)) * _BYTE_SUFFIX[m.group(2)]


def few_input_splits(df: DataFrame) -> bool:
    """Cheap test for "this frame's scan cannot feed every core": the
    ANALYZED plan's sizeInBytes estimate (leaf file sizes — milliseconds)
    against cores × maxPartitionBytes, the reader's own split arithmetic.

    The obvious probe — ``df.rdd.getNumPartitions()`` — runs the full
    optimizer + physical planner + codegen on a THROWAWAY plan just to
    read one number: measured ~1 s of driver time per query build at
    sf0.1 for a 3-branch union, paid again on every bench rep. The
    estimate answers the same question (splits ≈ size / maxPartitionBytes)
    for the price of an analysis pass that the query needs anyway.

    Streaming frames report False: ``.rdd`` is illegal there and a
    micro-batch is already distributed by its source. Used by the
    single-split spread guards (minhash_signatures, the semantic
    decontamination operators): at real scale inputs dwarf
    cores × 128 MB and the spread branch is dead, exactly like the old
    probe."""
    if df.isStreaming:
        return False
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    try:
        size = int(
            str(df._jdf.queryExecution().analyzed().stats().sizeInBytes())
        )
    except Exception:  # pragma: no cover - stats unavailable
        return df.rdd.getNumPartitions() < cores
    max_split = _bytes_conf(
        spark, "spark.sql.files.maxPartitionBytes", 128 << 20
    )
    return size < cores * max_split


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
