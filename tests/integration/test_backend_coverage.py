"""Protocol coverage matrix: the Spark backend must implement every
BackendProtocol method (model: reference tests/integration/test_*_coverage.py)."""

from __future__ import annotations

import inspect

from colnade_spark._protocols import BackendProtocol
from colnade_spark.backend import SparkBackend


def test_backend_implements_full_protocol():
    proto_methods = {
        name
        for name, v in vars(BackendProtocol).items()
        if callable(v) and not name.startswith("_")
    }
    assert proto_methods, "protocol should declare methods"
    backend = SparkBackend()
    missing = [m for m in proto_methods if not callable(getattr(backend, m, None))]
    assert not missing, f"SparkBackend missing protocol methods: {missing}"
    assert isinstance(backend, BackendProtocol)


def test_backend_signatures_match():
    for name, proto_fn in vars(BackendProtocol).items():
        if not callable(proto_fn) or name.startswith("_"):
            continue
        impl = getattr(SparkBackend, name)
        proto_params = list(inspect.signature(proto_fn).parameters)
        impl_params = list(inspect.signature(impl).parameters)
        assert impl_params == proto_params, f"{name}: {impl_params} != {proto_params}"
