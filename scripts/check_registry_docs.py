#!/usr/bin/env python3
"""Registry/docs consistency gate — this repo's analog of the reference's
docs CI gate (/root/reference/scripts/check_api_docs.py, wired in
.github/workflows/ci.yml:72-81): the reference verifies every public
export is documented; here the public contract surface is the
``__spark_entry__`` registry plus the repo docs that describe it, so the
gate verifies they cannot drift apart:

1. every ``oracle_sql()`` key names a ``queries()`` entry (no orphan
   oracles);
2. every ``queries()`` entry either has an oracle or is on the
   documented rows-only list below (non-SQL-expressible by nature) —
   a new query cannot silently ship unverifiable;
3. every ``queries()`` entry is mentioned by name in COVERAGE.md (the
   operator -> test -> oracle map) — coverage rows cannot go stale;
4. every bench HEADLINE entry names a ``queries()`` entry;
5. every operator/streaming module with public exports is referenced in
   COVERAGE.md. COVERAGE.md documents operator FAMILIES (one row per
   capability, naming its module and oracle queries), not every
   function — so the export rule is enforced at module granularity,
   the honest analog of the reference's per-export rule given this
   repo's docs surface.

Imports only (no Spark session, no data): safe as a test and as a
pre-commit check.  Exits 0 when consistent, 1 with a report otherwise.
"""

from __future__ import annotations

import importlib
import os
import pkgutil
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# queries whose outputs are non-SQL-expressible by nature; the driver
# records a weaker rows-only check for these and COVERAGE.md marks them
# `rows`. Emptied in round 6: minhash's mod-2^64 arithmetic is replayed
# with HUGEINT split-multiplies, the fake image decoder with VARCHAR
# sha256 + integer moments, and the HLL/t-digest entries now emit exact
# values + within-tolerance booleans — all 127 entries carry full oracles.
ROWS_ONLY: set[str] = set()


def main() -> int:
    from __spark_entry__ import oracle_sql, queries

    import bench

    q = set(queries())
    o = set(oracle_sql())
    coverage = open(os.path.join(REPO, "COVERAGE.md")).read()
    problems: list[str] = []

    for k in sorted(o - q):
        problems.append(f"oracle_sql() key {k!r} has no queries() entry")
    for k in sorted(q - o - ROWS_ONLY):
        problems.append(
            f"queries() entry {k!r} has neither an oracle_sql() twin nor a"
            " documented rows-only exemption (ROWS_ONLY in this script)"
        )
    for k in sorted(q):
        if k not in coverage:
            problems.append(f"queries() entry {k!r} not mentioned in COVERAGE.md")
    # an oracled query must not carry a stale `rows`-only marker in the
    # coverage map (rounds 2-5 left three of these behind)
    for m in re.finditer(r"`(\w+)` \(?rows", coverage):
        if m.group(1) in o:
            problems.append(
                f"COVERAGE.md marks {m.group(1)!r} rows-only but it has an"
                " oracle_sql() entry — update the marker to ✓sql"
            )
    for k in bench.HEADLINE:
        if k not in q:
            problems.append(f"bench HEADLINE entry {k!r} has no queries() entry")

    # recertification-rotation invariant: this round's new/changed entries
    # lead, then everything else ascending by last-driver-checked round
    # (never-checked = -1 first) with name tiebreak — so the driver's
    # bounded sweep always reaches the stalest certifications
    from __spark_entry__ import _ROUND_CHANGED, _driver_check_rounds, queries as _q

    order = list(_q())
    lead = [n for n in _ROUND_CHANGED if n in set(order)]
    if order[: len(lead)] != lead:
        problems.append(
            "queries() must lead with _ROUND_CHANGED entries, got"
            f" {order[:len(lead)]!r}"
        )
    checked = _driver_check_rounds()
    rest_keys = [
        (checked.get(n, -1), n) for n in order[len(lead):] if n not in set(lead)
    ]
    if rest_keys != sorted(rest_keys):
        bad = next(
            (a, b) for a, b in zip(rest_keys, rest_keys[1:]) if a > b
        )
        problems.append(
            f"queries() rotation order violated around {bad!r} — stale"
            " entries must come first"
        )

    # every headline query needs a committed plan-signature snapshot
    # (scripts/plan_signatures.py --update) — the import-only twin of the
    # spark-backed signature test, so the omission fails fast
    import json

    plans_path = os.path.join(REPO, "PLANS.json")
    if os.path.exists(plans_path):
        plans = json.load(open(plans_path))
        for k in bench.HEADLINE:
            if k not in plans:
                problems.append(
                    f"HEADLINE entry {k!r} missing from PLANS.json — run"
                    " scripts/plan_signatures.py --update"
                )

    # every operator/streaming module with public exports must have a
    # COVERAGE.md family row referencing it
    import colnade_spark.operators as ops_pkg

    modules = [
        f"colnade_spark.operators.{m.name}"
        for m in pkgutil.iter_modules(ops_pkg.__path__)
    ] + ["colnade_spark.streaming.stream"]
    for modname in modules:
        mod = importlib.import_module(modname)
        if not getattr(mod, "__all__", []):
            continue
        short = modname.rsplit(".", 1)[-1]
        if not re.search(rf"\b{re.escape(short)}\.py\b|\b{re.escape(short)}\b", coverage):
            problems.append(
                f"module {modname} (public exports:"
                f" {len(mod.__all__)}) has no COVERAGE.md reference"
            )

    if problems:
        print(f"{len(problems)} registry/docs inconsistencies:")
        for p in problems:
            print(f"  - {p}")
        return 1
    print(
        f"OK: {len(q)} queries ({len(q & o)} oracled,"
        f" {len(q - o)} rows-only documented), {len(bench.HEADLINE)} bench"
        " entries, all exports documented"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
