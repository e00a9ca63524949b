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


@pytest.mark.parametrize("name", sorted(queries()))
def test_query_runs_and_has_columns(spark, sf_dir, name):
    df = queries()[name](spark, sf_dir)
    assert df.columns, name
    # forces execution of the whole plan without collecting to the driver
    df.write.format("noop").mode("overwrite").save()
