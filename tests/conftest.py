from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "4")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from colnade_spark.session import get_spark

    sp = get_spark("colnade-tests")
    yield sp


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(autouse=True)
def _validation_off():
    """Each test starts from the OFF default; tests opt in explicitly."""
    from colnade_spark.validation import ValidationLevel, set_validation

    set_validation(ValidationLevel.OFF)
    yield
    set_validation(ValidationLevel.OFF)
