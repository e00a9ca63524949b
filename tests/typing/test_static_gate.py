"""CI-style STATIC gate over the typing suite (VERDICT r8 #4).

The reference's CI runs a real static checker over its typing tests
(`ty check tests/typing/ --error-on-warning`,
/root/reference/.github/workflows/ci.yml:66-71) so misspelled columns
fail WITHOUT executing a query. No checker wheel is installable here
(pip DNS-blocked), so scripts/static_typecheck.py implements the
load-bearing slice by AST analysis — checked files are parsed, never
imported. This test wires it into pytest the way the reference wires
ty into CI: the suite must be finding-free, and the gate must actually
catch an introduced column typo (otherwise a silent checker would pass
vacuously).
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
SCRIPT = os.path.join(REPO, "scripts", "static_typecheck.py")


def _run(*paths: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, SCRIPT, *paths],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )


def test_typing_suite_is_statically_clean():
    res = _run()  # defaults to tests/typing/
    assert res.returncode == 0, res.stdout + res.stderr
    assert "0 findings" in res.stdout


def test_gate_catches_introduced_column_typos(tmp_path):
    bad = tmp_path / "bad_typing_case.py"
    bad.write_text(
        "from colnade_spark import Column, Int64, Schema\n"
        "from colnade_spark.tpch import Customer\n"
        "from colnade_spark.operators import typed\n"
        "class S(Schema):\n"
        "    doc_id: Column[Int64]\n"
        "def f() -> None:\n"
        "    _ = S.doc_idd\n"
        "    _ = Customer.c_custkeyy\n"
        "    _ = typed.gopher_fitler\n"
    )
    res = _run(str(bad))
    assert res.returncode == 1, res.stdout + res.stderr
    assert "doc_idd" in res.stdout
    assert "c_custkeyy" in res.stdout
    assert "gopher_fitler" in res.stdout


def test_gate_skips_shadowed_names(tmp_path):
    """Zero-false-positive contract: every binding form shadows —
    function parameters, for targets, with/except bindings, walrus,
    comprehension variables, and non-library imports must all stop the
    checker from resolving the name as the library import."""
    ok = tmp_path / "shadow_case.py"
    ok.write_text(
        "from colnade_spark.operators import typed\n"
        "from colnade_spark.tpch import Customer\n"
        "from collections import namedtuple as Customer  # shadows\n"
        "def f(typed):\n"
        "    return typed.not_a_facade\n"
        "def g(items):\n"
        "    for typed in items:\n"
        "        typed.whatever\n"
        "    with open('x') as typed:\n"
        "        typed.read\n"
        "    try:\n"
        "        pass\n"
        "    except ValueError as typed:\n"
        "        typed.args_whatever\n"
        "    return [typed.x for typed in items]\n"
        "def h(x):\n"
        "    if (typed := x):\n"
        "        return typed.anything\n"
        "    lam = lambda typed: typed.z\n"
        "    return Customer.not_a_column  # shadowed by namedtuple\n"
    )
    res = _run(str(ok))
    assert res.returncode == 0, res.stdout + res.stderr


def test_gate_skips_def_and_class_name_shadows(tmp_path):
    """A file-local ``def typed(...)`` / non-schema ``class typed``
    BINDS the name too (ADVICE r9): attribute access on the local
    object must be skipped, not resolved against the library import."""
    ok = tmp_path / "def_shadow_case.py"
    ok.write_text(
        "from colnade_spark.operators import typed\n"
        "from colnade_spark.tpch import Customer\n"
        "def typed():\n"
        "    return 1\n"
        "class Customer:\n"
        "    pass\n"
        "def use():\n"
        "    _ = typed.not_a_facade_attr\n"
        "    _ = Customer.not_a_column\n"
    )
    res = _run(str(ok))
    assert res.returncode == 0, res.stdout + res.stderr


def test_gate_catches_dtype_method_misuse(tmp_path):
    """Round 10 (VERDICT r9 #5): the dtype-method gate — `.sum()` on a
    Utf8 column, `.str_len()` on numeric, `.dt_year()` on non-temporal,
    `.is_nan()` on ints, `.list` on scalars — fails STATICALLY, on both
    imported-schema columns (live Column objects) and file-local schemas
    whose Column[DType] annotations resolve. Misspelled METHODS on a
    resolved column are findings too."""
    bad = tmp_path / "bad_dtype_case.py"
    bad.write_text(
        "from colnade_spark import Column, Datetime, Float64, Int64,"
        " Schema, Utf8\n"
        "from colnade_spark.tpch import Customer\n"
        "class S(Schema):\n"
        "    doc_id: Column[Int64]\n"
        "    text: Column[Utf8]\n"
        "    score: Column[Float64 | None]\n"
        "    ts: Column[Datetime]\n"
        "def f() -> None:\n"
        "    _ = S.text.sum()\n"
        "    _ = S.doc_id.str_len()\n"
        "    _ = S.doc_id.dt_year()\n"
        "    _ = S.doc_id.is_nan()\n"
        "    _ = S.text.list\n"
        "    _ = Customer.c_name.mean()\n"
        "    _ = Customer.c_acctbal.summ()\n"
    )
    res = _run(str(bad))
    assert res.returncode == 1, res.stdout + res.stderr
    out = res.stdout
    assert "'sum' is not supported on column 'text' of dtype Utf8" in out
    assert "'str_len' is not supported on column 'doc_id'" in out
    assert "'dt_year' is not supported on column 'doc_id'" in out
    assert "'is_nan' is not supported on column 'doc_id'" in out
    assert "'list' is not supported on column 'text'" in out
    assert "'mean' is not supported on column 'c_name'" in out
    assert "Column 'c_acctbal' has no method or attribute 'summ'" in out


def test_gate_accepts_correct_dtype_methods_and_static_ignore(tmp_path):
    """Correct dtype usage is finding-free (zero-false-positive), the
    nullable annotation form resolves, unresolvable dtypes are SKIPPED
    not guessed, and `# static: ignore` (the `# type: ignore` analog)
    suppresses a deliberate violation on its line."""
    ok = tmp_path / "ok_dtype_case.py"
    ok.write_text(
        "from colnade_spark import Column, Datetime, Float64, Int64,"
        " List, Schema, Utf8\n"
        "from colnade_spark.tpch import Customer\n"
        "class S(Schema):\n"
        "    doc_id: Column[Int64]\n"
        "    text: Column[Utf8]\n"
        "    score: Column[Float64 | None]\n"
        "    ts: Column[Datetime]\n"
        "    toks: Column[List[Utf8]]\n"
        "    mystery: Column['NotResolvable']\n"
        "def f() -> None:\n"
        "    _ = S.doc_id.sum()\n"
        "    _ = S.text.str_len()\n"
        "    _ = S.ts.dt_year()\n"
        "    _ = S.score.is_nan()\n"
        "    _ = S.score.fill_nan(0.0)\n"
        "    _ = S.toks.list\n"
        "    _ = S.mystery.sum()\n"          # unresolvable: skipped
        "    _ = Customer.c_acctbal.mean()\n"
        "    _ = Customer.c_name.str_len()\n"
        "    _ = S.text.alias(S.text)\n"
        "    _ = S.text.sum()  # static: ignore\n"
    )
    res = _run(str(ok))
    assert res.returncode == 0, res.stdout + res.stderr


def test_method_gates_table_matches_runtime():
    """Drift pin: every METHOD_GATES row must mirror a REAL runtime
    _require gate — a Column whose dtype fails the predicate raises
    TypeError when the method is invoked (or the property accessed).
    If schema.py ever relaxes a gate, this fails before the static
    checker can emit a false positive."""
    import importlib.util

    import pytest

    from colnade_spark import dtypes as dt
    from colnade_spark.schema import Column

    spec = importlib.util.spec_from_file_location(
        "static_typecheck", SCRIPT
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    bad_dtype = {
        "_is_numeric": dt.Utf8,
        "_is_str": dt.Int64,
        "_is_temporal": dt.Int64,
        "_is_float": dt.Int64,
        "_is_struct": dt.Int64,
        "_is_list": dt.Int64,
        "_is_map": dt.Int64,
    }
    args = {
        "pow": (2,),
        "str_contains": ("x",), "str_starts_with": ("x",),
        "str_ends_with": ("x",), "str_replace": ("a", "b"),
        "str_extract": ("(a)",), "str_matches": ("a",),
        "str_count_matches": ("a",), "json_extract": ("$.a",),
        "str_split": (",",), "str_slice": (0, 1),
        "dt_truncate": ("day",), "dt_add": ("day", 1),
        "dt_diff": ("day", 0), "fill_nan": (0.0,), "field": ("x",),
    }
    for method, pred in mod.METHOD_GATES.items():
        col = Column("c", bad_dtype[pred], nullable=False)
        assert not getattr(col, pred)
        with pytest.raises(TypeError):
            attr = getattr(col, method)  # properties raise at access
            attr(*args.get(method, ()))


def test_gate_resolves_inheritance_and_schema_api(tmp_path):
    ok = tmp_path / "ok_typing_case.py"
    ok.write_text(
        "from colnade_spark import Column, Int64, Schema, Utf8\n"
        "from colnade_spark.tpch import Customer\n"
        "class A(Schema):\n"
        "    x: Column[Int64]\n"
        "class B(Schema):\n"
        "    y: Column[Utf8]\n"
        "class C(A, B):\n"
        "    z: Column[Int64]\n"
        "def f() -> None:\n"
        "    _ = (C.x, C.y, C.z)\n"          # inherited + own columns
        "    _ = C.column_names()\n"          # Schema API
        "    _ = C.Row\n"                     # metaclass-generated
        "    _ = Customer.c_acctbal\n"
    )
    res = _run(str(ok))
    assert res.returncode == 0, res.stdout + res.stderr
