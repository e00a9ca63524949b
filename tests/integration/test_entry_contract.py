"""Driver-contract smoke: every queries() entry runs at sf0.001 and returns
a stable schema; oracle keys are a subset; entry() produces rows.

(The full value-level oracle comparison runs via scripts/check_oracle.py at
sf0.01 — too slow for the unit loop.)
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from __spark_entry__ import entry, oracle_sql, queries  # noqa: E402


def test_oracle_keys_subset_of_queries():
    assert set(oracle_sql()) <= set(queries())


def test_entry_returns_rows(spark):
    df = entry(spark)
    assert df.count() > 0


def _non_scalar_columns():
    import importlib.util
    import os

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    spec = importlib.util.spec_from_file_location(
        "check_oracle", os.path.join(repo, "scripts", "check_oracle.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.non_scalar_columns


@pytest.mark.parametrize("name", sorted(queries()))
def test_query_runs_and_has_columns(spark, sf_dir, name):
    df = queries()[name](spark, sf_dir)
    assert df.columns, name
    # registry outputs must be scalar-only: the driver's canonicalizer
    # (pandas sort_values -> factorize) crashes on list/dict-valued
    # columns BEFORE comparison, so an ARRAY/MAP/STRUCT output column
    # means the local oracle pass proves nothing (round-4's one red row)
    assert not _non_scalar_columns()(df.schema), name
    # forces execution of the whole plan without collecting to the driver
    df.write.format("noop").mode("overwrite").save()


def test_non_scalar_gate_fires_on_array_output(spark):
    from pyspark.sql import functions as F

    df = spark.range(3).select("id", F.array(F.lit("a")).alias("reasons"))
    bad = _non_scalar_columns()(df.schema)
    assert bad == ["reasons:array<string>"]
