#!/usr/bin/env python3
"""Physical-plan signature snapshots for the headline queries.

A query can stay CORRECT while its plan silently regresses — a broadcast
join flipping to sort-merge, an extra exchange appearing, a filter no
longer reaching the scan. The per-op plan gates (test_plan_quality.py)
pin the contracts we thought to write down; this harness pins the REST:
for every bench HEADLINE query it records the multiset of physical
operator names in the (pre-execution, AQE-initial) plan at sf0.001 and
compares against the committed ``PLANS.json``.

Signatures count operator KINDS (BroadcastHashJoin, Exchange, Generate,
...), not ids/locations/partition counts, so they are stable across
runs and machines for fixed fixtures and confs; a changed signature is
exactly "the plan shape changed". When a change is INTENTIONAL, re-run
with ``--update`` and review the PLANS.json diff in the commit.

Usage:
    python scripts/plan_signatures.py            # compare (exit 1 on drift)
    python scripts/plan_signatures.py --update   # rewrite PLANS.json
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANS = os.path.join(REPO, "PLANS.json")
SF_DIR = os.environ.get("SPARK_GRAFT_PLAN_SF_DIR", "/root/testdata/sf0.001")

# strip per-run decorations: "(12)", "#123L", alias ids
_NODE_RE = re.compile(r"^[\s:+*\-]*(?:\([0-9]+\) )?([A-Za-z][A-Za-z0-9]*)")


def plan_signature(df) -> dict[str, int]:
    """Multiset of physical operator names from the pre-execution plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    sig: dict[str, int] = {}
    for line in plan.splitlines():
        if not line.strip():
            break  # the tree section ends at the first blank line
        m = _NODE_RE.match(line)
        if not m:
            continue
        name = m.group(1)
        # AdaptiveSparkPlan / WholeStageCodegen / InputAdapter / Scan
        # framing varies with codegen wrapping; count the logical kinds
        if name in {"WholeStageCodegen", "InputAdapter", "AdaptiveSparkPlan"}:
            continue
        sig[name] = sig.get(name, 0) + 1
    return sig


def main() -> int:
    update = "--update" in sys.argv
    import bench
    from __spark_entry__ import queries

    from colnade_spark.session import get_spark

    spark = get_spark("plan-signatures")
    spark.catalog.clearCache()  # compare uncached plans
    qs = queries()
    got: dict[str, dict[str, int]] = {}
    for name in bench.HEADLINE:
        try:
            got[name] = plan_signature(qs[name](spark, SF_DIR))
        except Exception as e:  # a query that cannot even plan is a failure
            got[name] = {"__error__": 1}
            print(f"[WARN] {name}: planning failed: {e}")

    if update or not os.path.exists(PLANS):
        with open(PLANS, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
        print(f"wrote {PLANS} ({len(got)} signatures)")
        return 0

    want = json.load(open(PLANS))
    drift = []
    for name, sig in got.items():
        if name not in want:
            drift.append(f"{name}: NEW query — run --update to snapshot")
        elif want[name] != sig:
            gained = {k: v for k, v in sig.items() if want[name].get(k) != v}
            lost = {k: v for k, v in want[name].items() if k not in sig}
            drift.append(f"{name}: plan changed — now {gained}, was {lost}")
    for name in want:
        if name not in got:
            drift.append(f"{name}: removed from HEADLINE but still in PLANS.json")
    if drift:
        print(f"{len(drift)} plan signature drifts:")
        for d in drift:
            print(f"  - {d}")
        print("intentional? re-run with --update and review the diff")
        return 1
    print(f"OK: {len(got)} plan signatures unchanged")
    return 0


if __name__ == "__main__":
    sys.exit(main())
