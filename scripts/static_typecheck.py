#!/usr/bin/env python3
"""Minimal OFFLINE static type gate for the typing test layer.

The reference runs a real static checker over its typing suite in CI
(`ty check tests/typing/ --error-on-warning`,
/root/reference/.github/workflows/ci.yml:66-71) so that a misspelled
column is caught WITHOUT executing any query — safety layer 1 of 3
(/root/reference/README.md:105-112). No mypy/ty/pyright wheel is
installable in this container (pip index DNS-blocked, rounds 6-9), so
this script implements the load-bearing slice of that guarantee by
static analysis of the CHECKED FILES' AST — the checked files are
parsed, never imported or executed, exactly like a real checker.

What it verifies, per file:

1. **Schema column access** — for every ``X.attr`` / ``mod.X.attr``
   where ``X`` resolves to a ``Schema`` subclass, ``attr`` must be a
   declared column (or inherited one, or part of the Schema class API).
   ``X`` may be defined in the file (its annotated class body is read
   from the AST, including bases defined earlier in the file) or
   imported from the library (the library side is imported by THIS
   script to enumerate real columns — the analog of a checker reading
   installed types; the test file itself still never runs).
2. **Module attribute access** — ``mod.attr`` for any imported library
   module must exist (catches a misspelled operator-facade name like
   ``typed.gopher_fitler`` statically).
3. **Dtype-method gating** (round 10, VERDICT r9 #5) — for every
   ``X.col.method`` where ``X.col`` resolves to a live ``Column`` (an
   imported schema's column, or a file-local schema column whose
   ``Column[DType]`` annotation resolves to a library dtype), ``method``
   must be admitted by the column's dtype category: ``.sum()`` on a
   Utf8 column or ``.str_len()`` on Int64 fails HERE, without running a
   query — the static witness for the reference's ``_NumericSelf``-style
   self-narrowing (reference ``src/colnade/schema.py:516-537``). The
   method → category table below mirrors the runtime ``_require`` sites
   in ``colnade_spark/schema.py`` and is drift-pinned by
   ``tests/typing/test_static_gate.py`` against the live Column class;
   the category PREDICATES themselves are evaluated on the live Column
   object, so category membership can never drift. Misspelled METHOD
   names on a resolved Column are findings too.
4. **Syntax** — files must parse.

Anything it cannot resolve statically (locals, call results, chains
through subscripts) is skipped, never guessed: the gate is
deliberately zero-false-positive so it can run `--error-on-warning`
style (any finding = nonzero exit).

Usage:
    python scripts/static_typecheck.py [paths...]   # default tests/typing/

Exit status: 0 = clean, 1 = findings (printed as file:line: message).
"""

from __future__ import annotations

import ast
import importlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _is_schema_class(obj) -> bool:
    try:
        from colnade_spark.schema import Schema

        return isinstance(obj, type) and issubclass(obj, Schema)
    except Exception:
        return False


def _column_class():
    try:
        from colnade_spark.schema import Column

        return Column
    except Exception:
        return None


def _dtype_base():
    try:
        from colnade_spark import dtypes as dt

        return dt.DType
    except Exception:
        return None


# method name -> Column predicate PROPERTY that must hold (the property
# is evaluated on the live Column, so the category definitions are the
# runtime's own). Mirrors the _require sites in colnade_spark/schema.py
# (sum/mean/std/var :206-230; _str_fn :241; _math_fn :276; _dt_fn :365;
# is_nan/fill_nan :417-430; field/.list/.map :452-465) — drift is pinned
# by tests/typing/test_static_gate.py.
METHOD_GATES: dict[str, str] = {
    **{m: "_is_numeric" for m in (
        "sum", "mean", "std", "var", "abs", "round", "floor", "ceil",
        "sqrt", "ln", "log10", "exp", "pow",
    )},
    **{m: "_is_str" for m in (
        "str_contains", "str_starts_with", "str_ends_with", "str_len",
        "str_to_lowercase", "str_to_uppercase", "str_strip",
        "str_replace", "str_extract", "str_matches", "str_count_matches",
        "json_extract", "str_split", "str_slice",
    )},
    **{m: "_is_temporal" for m in (
        "dt_year", "dt_month", "dt_day", "dt_hour", "dt_minute",
        "dt_second", "dt_epoch_day", "dt_truncate", "dt_add", "dt_diff",
    )},
    "is_nan": "_is_float",
    "fill_nan": "_is_float",
    "field": "_is_struct",
    "list": "_is_list",
    "map": "_is_map",
}


class FileChecker(ast.NodeVisitor):
    def __init__(
        self, path: str, tree: ast.Module, src: str = ""
    ) -> None:
        self.path = path
        self.findings: list[str] = []
        # the `# type: ignore` analog: a line carrying `# static: ignore`
        # documents a DELIBERATE violation (e.g. a typing-suite example
        # of the runtime gate) and is excluded from findings
        self.ignored_lines: set[int] = {
            i + 1
            for i, line in enumerate(src.splitlines())
            if "# static: ignore" in line
        }
        # name -> {column/attr name: live Column | None} for file-local
        # Schema classes (a live Column where the Column[DType]
        # annotation resolved to a library dtype — enables method
        # gating; None = membership only)
        self.local_schemas: dict[str, dict[str, object]] = {}
        # name -> live object (module or class) for library imports
        self.imported: dict[str, object] = {}
        # names assigned anywhere in the file: attribute bases shadowed
        # by local assignment are skipped rather than mis-resolved
        self.assigned: set[str] = set()
        self._schema_api = self._collect_schema_api()
        self._prescan(tree)

    @staticmethod
    def _collect_schema_api() -> set[str]:
        try:
            from colnade_spark.schema import Schema

            # 'Row' is generated per-subclass by the metaclass, so it
            # exists on every concrete schema even though dir(Schema)
            # lacks it
            return set(dir(Schema)) | {"Row"}
        except Exception:
            return set()

    # -- pre-scan: imports, local Schema class bodies, assignments ----

    def _prescan(self, tree: ast.Module) -> None:
        for node in ast.walk(tree):
            if isinstance(node, ast.Import):
                for a in node.names:
                    root = a.name.split(".")[0]
                    if root != "colnade_spark":
                        # a non-library import shadows the name
                        self.assigned.add(a.asname or root)
                        continue
                    bound = a.asname or root
                    try:
                        mod = importlib.import_module(a.name)
                    except Exception as e:  # broken library import IS a finding
                        self._report(node, f"cannot import {a.name}: {e}")
                        continue
                    self.imported[bound] = (
                        mod
                        if a.asname
                        else importlib.import_module(root)
                    )
            elif isinstance(node, ast.ImportFrom):
                if (
                    node.level
                    or not node.module
                    or node.module.split(".")[0] != "colnade_spark"
                ):
                    for al in node.names:
                        if al.name != "*":
                            self.assigned.add(al.asname or al.name)
                    continue
                try:
                    mod = importlib.import_module(node.module)
                except Exception as e:
                    self._report(node, f"cannot import {node.module}: {e}")
                    continue
                for a in node.names:
                    if a.name == "*":
                        continue
                    if not hasattr(mod, a.name):
                        # `from pkg import submodule`: the name is only
                        # set on the package once the submodule loads
                        try:
                            importlib.import_module(
                                f"{node.module}.{a.name}"
                            )
                        except Exception:
                            self._report(
                                node,
                                f"'{a.name}' not found in {node.module}",
                            )
                            continue
                    self.imported[a.asname or a.name] = getattr(mod, a.name)
            elif isinstance(node, ast.ClassDef):
                self._maybe_local_schema(node)
            else:
                self._record_bindings(node)

    def _record_bindings(self, node: ast.AST) -> None:
        """Record EVERY name-binding form into ``self.assigned`` so an
        attribute base that is shadowed anywhere in the file is skipped
        rather than mis-resolved to a library import — the
        zero-false-positive contract. Scope-insensitive on purpose:
        trading recall (a shadowed name is never checked, even in
        scopes where the import is live) for never flagging correct
        code."""

        def names(t: ast.AST) -> None:
            for n in ast.walk(t):
                if isinstance(n, ast.Name):
                    self.assigned.add(n.id)

        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            # the def's NAME is a binding too: a file-local
            # ``def typed(...):`` shadows a library import, so attribute
            # access on it must be skipped, not resolved to the import
            self.assigned.add(node.name)
        if isinstance(node, (ast.Assign, ast.AugAssign, ast.AnnAssign)):
            for t in node.targets if isinstance(node, ast.Assign) else [
                node.target
            ]:
                names(t)
        elif isinstance(node, ast.NamedExpr):
            names(node.target)
        elif isinstance(
            node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda)
        ):
            a = node.args
            for arg in (
                a.posonlyargs
                + a.args
                + a.kwonlyargs
                + ([a.vararg] if a.vararg else [])
                + ([a.kwarg] if a.kwarg else [])
            ):
                self.assigned.add(arg.arg)
        elif isinstance(node, (ast.For, ast.AsyncFor)):
            names(node.target)
        elif isinstance(node, ast.comprehension):
            names(node.target)
        elif isinstance(node, ast.withitem):
            if node.optional_vars is not None:
                names(node.optional_vars)
        elif isinstance(node, ast.ExceptHandler):
            if node.name:
                self.assigned.add(node.name)

    def _maybe_local_schema(self, node: ast.ClassDef) -> None:
        """Record annotated names of classes whose base chain reaches
        Schema — through an imported Schema (possibly generic, e.g.
        ``Schema`` or a subscripted base) or an earlier local schema.
        Each recorded name maps to a live ``Column`` (when the base is a
        live class, or the local annotation's dtype resolves) or None
        (membership only — no method gating)."""
        Column = _column_class()

        def live_cols(obj) -> dict[str, object]:
            out: dict[str, object] = {}
            for n in dir(obj):
                try:
                    v = getattr(obj, n)
                except Exception:
                    v = None
                out[n] = v if Column and isinstance(v, Column) else None
            return out

        base_cols: dict[str, object] | None = None
        for b in node.bases:  # UNION over all bases (multiple inheritance)
            target = b.value if isinstance(b, ast.Subscript) else b
            got: dict[str, object] | None = None
            if isinstance(target, ast.Name):
                if target.id in self.local_schemas:
                    got = dict(self.local_schemas[target.id])
                else:
                    obj = self.imported.get(target.id)
                    if _is_schema_class(obj):
                        got = live_cols(obj)
            elif isinstance(target, ast.Attribute) and isinstance(
                target.value, ast.Name
            ):
                mod = self.imported.get(target.value.id)
                obj = getattr(mod, target.attr, None) if mod else None
                if _is_schema_class(obj):
                    got = live_cols(obj)
            if got is not None:
                base_cols = got if base_cols is None else {**base_cols, **got}
        if base_cols is None:
            # NOT a schema subclass: the class NAME still shadows any
            # same-named library import — record it so attribute access
            # on the local class is skipped (zero-false-positive
            # contract), mirroring the FunctionDef name binding above
            self.assigned.add(node.name)
            return
        cols = base_cols
        for stmt in node.body:
            if isinstance(stmt, ast.AnnAssign) and isinstance(
                stmt.target, ast.Name
            ):
                cols[stmt.target.id] = self._column_from_annotation(
                    stmt.target.id, stmt.annotation
                )
            elif isinstance(stmt, ast.Assign):
                for t in stmt.targets:
                    if isinstance(t, ast.Name):
                        cols[t.id] = None
            elif isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef)):
                cols[stmt.name] = None
        self.local_schemas[node.name] = cols

    def _column_from_annotation(self, name: str, ann: ast.expr):
        """A live Column for a ``col: Column[DType]`` annotation when the
        dtype expression resolves to library dtypes; None otherwise
        (skipped, never guessed)."""
        Column = _column_class()
        if Column is None or not isinstance(ann, ast.Subscript):
            return None
        base = ann.value
        base_obj = (
            self.imported.get(base.id) if isinstance(base, ast.Name) else None
        )
        if base_obj is not Column:
            return None
        dtype, nullable = self._resolve_dtype(ann.slice)
        if dtype is None:
            return None
        try:
            return Column(name, dtype, nullable)
        except Exception:
            return None

    def _resolve_dtype(self, node: ast.expr):
        """(live dtype, nullable) for a dtype annotation subtree —
        Name, dotted Attribute, ``X | None``, and subscripted generics
        over resolvable parts. (None, False) when not statically known."""
        DType = _dtype_base()
        if DType is None:
            return None, False
        if isinstance(node, ast.BinOp) and isinstance(node.op, ast.BitOr):
            right_none = (
                isinstance(node.right, ast.Constant)
                and node.right.value is None
            )
            if right_none:
                inner, _ = self._resolve_dtype(node.left)
                return inner, True
            return None, False
        if isinstance(node, (ast.Name, ast.Attribute)):
            obj = self._resolve_base(node)
            cand = obj[1] if obj and obj[0] == "object" else None
            if isinstance(cand, type) and issubclass(cand, DType):
                return cand, False
            return None, False
        if isinstance(node, ast.Subscript):
            base, _ = self._resolve_dtype(node.value)
            if base is None:
                return None, False
            args = (
                list(node.slice.elts)
                if isinstance(node.slice, ast.Tuple)
                else [node.slice]
            )
            inner = [self._resolve_dtype(a)[0] for a in args]
            if any(i is None for i in inner):
                return None, False
            try:
                return base[tuple(inner) if len(inner) > 1 else inner[0]], False
            except Exception:
                return None, False
        return None, False

    # -- the check ------------------------------------------------------

    def _report(self, node: ast.AST, msg: str) -> None:
        line = getattr(node, "lineno", 0)
        if line in self.ignored_lines:
            return
        self.findings.append(f"{self.path}:{line}: {msg}")

    def _resolve_base(self, node: ast.expr):
        """Resolve an attribute's base expression to ('schema', columns),
        ('object', live_obj) or None when not statically known."""
        if isinstance(node, ast.Name):
            if node.id in self.local_schemas:
                return ("schema", self.local_schemas[node.id])
            if node.id in self.assigned:
                return None  # shadowed — a local, not the import
            obj = self.imported.get(node.id)
            if obj is not None:
                return ("object", obj)
            return None
        if isinstance(node, ast.Attribute):
            base = self._resolve_base(node.value)
            if base and base[0] == "object":
                obj = base[1]
                Column = _column_class()
                if Column and isinstance(obj, Column):
                    # never chain THROUGH a column: property accessors
                    # (.list/.map) raise on wrong dtypes at getattr time
                    # and method results are plan IR, not columns
                    return None
                if hasattr(obj, node.attr):
                    return ("object", getattr(obj, node.attr))
                return None  # reported at that node's own visit
            if base and base[0] == "schema":
                col = base[1].get(node.attr)
                Column = _column_class()
                if Column and isinstance(col, Column):
                    return ("object", col)
                return None
            return None
        return None

    def visit_Attribute(self, node: ast.Attribute) -> None:
        base = self._resolve_base(node.value)
        if base is not None:
            kind, val = base
            if kind == "schema":
                if node.attr not in val and node.attr not in self._schema_api:
                    self._report(
                        node,
                        f"schema has no column or attribute '{node.attr}'",
                    )
            else:
                obj = val
                Column = _column_class()
                if Column and isinstance(obj, Column):
                    gate = METHOD_GATES.get(node.attr)
                    if gate is not None:
                        try:
                            ok = bool(getattr(obj, gate))
                        except Exception:
                            ok = True  # unknown category: skip, not guess
                        if not ok:
                            from colnade_spark import dtypes as _dt

                            self._report(
                                node,
                                f"'{node.attr}' is not supported on column"
                                f" {obj.name!r} of dtype"
                                f" {_dt.dtype_name(obj.dtype)}",
                            )
                    elif not hasattr(obj, node.attr):
                        self._report(
                            node,
                            f"Column {obj.name!r} has no method or"
                            f" attribute '{node.attr}'",
                        )
                elif _is_schema_class(obj):
                    if not hasattr(obj, node.attr):
                        self._report(
                            node,
                            f"{getattr(obj, '__name__', obj)!s} has no"
                            f" column or attribute '{node.attr}'",
                        )
                elif hasattr(obj, "__path__") or hasattr(obj, "__file__"):
                    # a module: attribute must exist
                    if not hasattr(obj, node.attr):
                        self._report(
                            node,
                            f"module {obj.__name__} has no attribute"
                            f" '{node.attr}'",
                        )
        self.generic_visit(node)


def check_file(path: str) -> list[str]:
    try:
        src = open(path, encoding="utf-8").read()
        tree = ast.parse(src, filename=path)
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]
    c = FileChecker(path, tree, src)
    c.visit(tree)
    return c.findings


def main(argv: list[str]) -> int:
    paths = argv or [os.path.join(REPO, "tests", "typing")]
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files += sorted(
                os.path.join(p, f)
                for f in os.listdir(p)
                if f.endswith(".py")
            )
        else:
            files.append(p)
    findings: list[str] = []
    for f in files:
        findings += check_file(f)
    for line in findings:
        print(line)
    print(
        f"static_typecheck: {len(files)} files,"
        f" {len(findings)} findings"
    )
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
