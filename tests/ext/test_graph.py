"""Connected components: synthetic graph shapes + convergence behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from colnade_spark.operators.graph import connected_components, largest_component_sizes


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _cc_map(cc):
    return {r.node: r.component for r in cc.collect()}


@pytest.mark.parametrize("dfe", [0, 10**6], ids=["distributed", "driver"])
def test_chain_collapses_to_min(spark, dfe):
    # 1-2-3-4-5 chain: everything labels to 1 (both execution paths)
    cc = connected_components(
        _edges(spark, [(i, i + 1) for i in range(1, 5)]), driver_finish_edges=dfe
    )
    assert _cc_map(cc) == {i: 1 for i in range(1, 6)}


@pytest.mark.parametrize("dfe", [0, 10**6], ids=["distributed", "driver"])
def test_two_components_and_isolated_node(spark, dfe):
    edges = _edges(spark, [(1, 2), (2, 3), (10, 11)])
    nodes = spark.createDataFrame([(1,), (2,), (3,), (10,), (11,), (99,)], "id long")
    cc = connected_components(edges, nodes=nodes, driver_finish_edges=dfe)
    got = _cc_map(cc)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_cycle_and_direction_irrelevant(spark):
    # directed edges forming a cycle + a reversed edge: undirected semantics
    cc = connected_components(_edges(spark, [(3, 2), (1, 3), (2, 1), (5, 4)]))
    got = _cc_map(cc)
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def test_star_converges_in_one_round(spark):
    # hub-and-spoke with hub = max id: spokes adopt min spoke via hub
    edges = _edges(spark, [(100, i) for i in range(1, 6)])
    cc = connected_components(edges)
    got = _cc_map(cc)
    assert set(got.values()) == {1}
    assert len(got) == 6


def test_self_loops_and_duplicate_edges_tolerated(spark):
    cc = connected_components(_edges(spark, [(1, 1), (1, 2), (2, 1), (1, 2)]))
    assert _cc_map(cc) == {1: 1, 2: 1}


def test_max_iter_exceeded_raises(spark):
    # a 6-chain needs ~3 doubling rounds; max_iter=1 must fail loudly
    edges = _edges(spark, [(i, i + 1) for i in range(1, 6)])
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(edges, max_iter=1, driver_finish_edges=0)


def test_component_sizes_summary(spark):
    edges = _edges(spark, [(1, 2), (2, 3), (10, 11)])
    cc = connected_components(edges)
    sizes = {r.component: r.size for r in largest_component_sizes(cc).collect()}
    assert sizes == {1: 3, 10: 2}


def test_matches_python_union_find_on_random_graph(spark):
    import random

    rng = random.Random(7)
    pairs = [(rng.randrange(60), rng.randrange(60)) for _ in range(45)]
    nodes = spark.createDataFrame([(i,) for i in range(60)], "id long")
    # both paths must produce the identical min-labeling
    cc = connected_components(_edges(spark, pairs), nodes=nodes)
    cc_dist = connected_components(
        _edges(spark, pairs), nodes=nodes, driver_finish_edges=0
    )
    assert _cc_map(cc) == _cc_map(cc_dist)

    # driver-side union-find model
    parent = list(range(60))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for n in range(60):
        r = find(n)
        want[n] = min(m for m in range(60) if find(m) == r)
    assert _cc_map(cc) == want
