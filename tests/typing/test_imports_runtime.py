"""Runtime harness for the static-typing suite.

No type checker ships in this container (mypy/pyright/ty absent —
COVERAGE.md), so this pytest module keeps the typing files honest in CI:
every module must import cleanly, every zero-argument check function must
execute, and the overload registrations that the checker would consume
must actually exist at runtime (``typing.get_overloads``).

When a checker is available, run instead/additionally:
    mypy --strict --warn-unused-ignores tests/typing/
    ty check tests/typing/
"""

from __future__ import annotations

import importlib
import inspect
import pkgutil
import typing

import tests.typing as typing_pkg

MODULES = sorted(
    m.name
    for m in pkgutil.iter_modules(typing_pkg.__path__, "tests.typing.")
    if m.name != "tests.typing.test_imports_runtime"
)


def test_all_typing_modules_import_and_zero_arg_checks_run():
    assert len(MODULES) >= 11, MODULES
    ran = 0
    for name in MODULES:
        mod = importlib.import_module(name)
        for fname, fn in inspect.getmembers(mod, inspect.isfunction):
            if fname.startswith("check_") and not inspect.signature(fn).parameters:
                fn()
                ran += 1
    assert ran >= 20, f"only {ran} zero-arg checks ran"


def test_item_overloads_registered():
    from colnade_spark import DataFrame

    overloads = typing.get_overloads(DataFrame.item)
    # 18 dtype-directed + Column[Any] + str + no-arg
    assert len(overloads) == 21, len(overloads)


def test_concat_overloads_registered():
    from colnade_spark.dataframe import concat

    assert len(typing.get_overloads(concat)) == 2


def test_matrix_mentions_every_row():
    """The coverage matrix documents all 29 reference rows."""
    import tests.typing.test_coverage_matrix as m

    doc = m.__doc__ or ""
    for row in range(1, 30):
        assert f"Row {row} " in doc, f"matrix missing Row {row}"
