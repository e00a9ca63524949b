"""Plan-signature regression gate: every headline query's physical
operator profile must match the committed PLANS.json snapshot — a
broadcast flipping to sort-merge or a new exchange fails here even when
results stay correct. Intentional plan changes: re-run
`python scripts/plan_signatures.py --update` and review the diff."""

from __future__ import annotations

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_plan_signatures_unchanged(spark):
    spec = importlib.util.spec_from_file_location(
        "plan_signatures", os.path.join(REPO, "scripts", "plan_signatures.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    import bench
    from __spark_entry__ import queries

    # cached plan fragments from earlier tests (e.g. a .cache()'d top-k
    # over the same fixture) would substitute InMemoryTableScan into
    # matching subtrees and shift signatures — compare uncached plans
    spark.catalog.clearCache()
    qs = queries()
    want = json.load(open(os.path.join(REPO, "PLANS.json")))
    drift = {}
    for name in bench.HEADLINE:
        sig = mod.plan_signature(qs[name](spark, "/root/testdata/sf0.001"))
        if want.get(name) != sig:
            drift[name] = {"now": sig, "was": want.get(name)}
    assert not drift, json.dumps(drift, indent=1)[:4000]
