"""The registry/docs consistency gate (scripts/check_registry_docs.py —
the analog of the reference's check_api_docs CI gate,
/root/reference/.github/workflows/ci.yml:72-81) must pass: every query
oracled-or-documented-rows-only, every oracle attached to a query, every
bench entry registered, every operator module covered."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_registry_docs_consistent(capsys):
    spec = importlib.util.spec_from_file_location(
        "check_registry_docs",
        os.path.join(REPO, "scripts", "check_registry_docs.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rc = mod.main()
    out = capsys.readouterr().out
    assert rc == 0, out
