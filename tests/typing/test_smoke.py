"""Smoke file for type-checker CI integration (mypy --strict / ty).

Must produce zero type errors. No checker wheel is installable in this
container (documented in COVERAGE.md); the offline AST gate
(scripts/static_typecheck.py, wired via test_static_gate.py) carries
the misspelled-column guarantee statically in the meantime, the suite
stays checkable the moment a real checker is available, and
tests/typing/test_imports_runtime.py keeps every file import-clean
under pytest.
"""

import colnade_spark
import colnade_spark.operators.asof
import colnade_spark.operators.dedup
import colnade_spark.operators.multimodal
import colnade_spark.operators.sessions
import colnade_spark.operators.similarity
import colnade_spark.operators.skew
import colnade_spark.operators.text


def check_imports() -> None:
    _ = colnade_spark
    _ = colnade_spark.operators.dedup
    _ = colnade_spark.operators.similarity
    _ = colnade_spark.operators.text
    _ = colnade_spark.operators.asof
    _ = colnade_spark.operators.sessions
    _ = colnade_spark.operators.skew
    _ = colnade_spark.operators.multimodal
