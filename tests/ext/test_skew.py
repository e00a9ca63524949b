"""salted_join equivalence with plain join under skew."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from colnade_spark.operators.skew import salted_join


@pytest.fixture()
def skewed(spark):
    # 10k rows, 90% on one hot key
    left = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("rv")
    )
    return left, right


def test_salted_inner_matches_plain(spark, skewed):
    left, right = skewed
    plain = left.join(right, "k").groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("lv").alias("sl"), F.sum("rv").alias("sr")
    ).first()
    salted = salted_join(left, right, "k", salt=8).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("lv").alias("sl"), F.sum("rv").alias("sr")
    ).first()
    assert (plain.n, plain.sl, plain.sr) == (salted.n, salted.sl, salted.sr)


def test_salted_left_keeps_unmatched(spark, skewed):
    left, right = skewed
    right_small = right.filter(F.col("k") < 5)
    plain = left.join(right_small, "k", "left")
    salted = salted_join(left, right_small, "k", how="left", salt=4)
    assert plain.count() == salted.count()
    assert (
        plain.filter(F.col("rv").isNull()).count()
        == salted.filter(F.col("rv").isNull()).count()
    )


def test_salted_rejects_right_join(spark, skewed):
    left, right = skewed
    with pytest.raises(ValueError):
        salted_join(left, right, "k", how="full")
