"""Connected components over an edge list — duplicate-CLUSTER resolution.

Near-dedup operators (``dedup.minhash_candidate_pairs``, simhash/ngram
pairs) emit PAIRS; production dedup needs per-document cluster ids so one
canonical doc per cluster survives. Pair→cluster is connected components
on the duplicate graph.

Algorithm: alternating LARGE-STAR / SMALL-STAR contractions (Kiveris,
Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected Components in
MapReduce and Beyond", SoCC'14 — public paper). Each round rewires edges
toward per-neighborhood minima:

- large-star: every node links its LARGER neighbors to the minimum of its
  neighborhood (min(N(u) ∪ {u}));
- small-star: with edges directed high→low, every node links its smaller
  neighbors (and itself) to that minimum.

The edge set monotonically contracts to a forest of stars whose centers
are the per-component minimum ids, in O(log² n) rounds — a million-node
duplicate chain resolves in ~15 rounds where naive min-label propagation
needs a million. Naive propagation was the first implementation here and
did exactly that on sf0.1's long length-run chains.

Scale notes (100 TB):
- Each star step is one groupBy (neighborhood minima) + one equi-join
  (rewire) — two shuffles on node ids; AQE coalesces as the edge set
  contracts.
- ``localCheckpoint`` per round truncates the lineage — without it the
  plan tree doubles per iteration (the classic iterative-algorithm trap).
- Convergence = an EMPTY set-difference between consecutive edge sets
  (exact, distributed; no label collect).
- Edges are deduplicated/symmetrized inside each step; inputs may carry
  duplicates and self-loops.

Reference parity: no counterpart — the reference has no graph operators
(SURVEY.md §2.6); extension layer, same tier as dedup/similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "largest_component_sizes"]


def _large_star(e: DataFrame) -> DataFrame:
    """(u,v) ∈ E (undirected): link every neighbor v > u to
    m(u) = min(N(u) ∪ {u})."""
    sym = e.union(e.select(F.col("_b").alias("_a"), F.col("_a").alias("_b")))
    mins = (
        sym.groupBy("_a")
        .agg(F.min("_b").alias("_mn"))
        .select("_a", F.least("_a", "_mn").alias("_m"))
    )
    # no distinct here: small_star's first step re-directs + distincts, so
    # deduping would buy nothing and cost a shuffle per round
    return (
        sym.filter(F.col("_b") > F.col("_a"))
        .join(mins, "_a")
        .select(F.col("_b").alias("_a"), F.col("_m").alias("_b"))
        .filter(F.col("_a") != F.col("_b"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Edges directed high→low: link every smaller neighbor (and u itself)
    to m(u) = min(N(u) ∪ {u})."""
    d = e.select(
        F.greatest("_a", "_b").alias("_a"), F.least("_a", "_b").alias("_b")
    ).distinct()
    mins = d.groupBy("_a").agg(F.min("_b").alias("_m"))  # _m < _a by direction
    rewired = (
        d.join(mins, "_a")
        .filter(F.col("_b") != F.col("_m"))
        .select(F.col("_b").alias("_a"), F.col("_m").alias("_b"))
    )
    self_links = mins.select("_a", F.col("_m").alias("_b"))
    return rewired.union(self_links).filter(F.col("_a") != F.col("_b")).distinct()


def _driver_union_find(pairs: list) -> dict:
    """Union-find with path compression + union-by-min: labels every
    endpoint with its component MINIMUM (same labeling as the distributed
    star rounds). Pure Python, runs in O(alpha) per edge."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    seen = set()
    for a, b in pairs:
        seen.add(a)
        seen.add(b)
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if rb < ra:
            ra, rb = rb, ra
        parent[rb] = ra  # larger root under smaller: roots stay minima
    return {x: find(x) for x in seen}


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    max_iter: int = 30,
    driver_finish_edges: int = 1_000_000,
) -> DataFrame:
    """Resolve ``(node, component)`` for every node, where ``component``
    is the MINIMUM node id in the node's connected component (stable,
    deterministic labeling — no dependence on iteration order).

    ``edges`` is an undirected edge list (direction ignored, self-loops
    and duplicates tolerated). ``nodes`` optionally supplies isolated
    nodes (first column is the id); isolated nodes come back as their own
    component. Raises ``RuntimeError`` if not converged in ``max_iter``
    alternating rounds (log²-many suffice for any real graph — 30 covers
    ~2^30-node components).

    ``driver_finish_edges``: once the (monotonically contracting) edge set
    fits under this bound, the remaining rounds collapse into one bounded
    driver-side union-find pass (1M edges ≈ 16 MB — the same
    bounded-driver-materialization tier as the IVF training sample).
    Blocked dedup graphs start tiny and star rounds contract big ones
    geometrically, so this replaces the long tail of near-empty shuffle
    stages (~2·log² n stages of pure scheduling latency) with
    milliseconds of driver CPU; the distributed rounds remain the scale
    path for edge sets above the bound. Set to 0 to force fully
    distributed execution.

    SHARED-SESSION caveat: the per-round shuffle sizing temporarily sets
    ``spark.sql.shuffle.partitions`` on the SESSION conf (restored in a
    ``finally``) — runtime SQL confs have no narrower scope to set them
    on. While an iteration is in flight, other queries planned on the
    same SparkSession pick up the reduced partition count. Fine on a
    dedicated job (the normal deployment); on a session shared with
    concurrent planners, either accept the transient sizing or run this
    on its own session."""
    # the raw edge selection is checkpointed FIRST: its producer (often a
    # window/join pipeline over the corpus) is consumed by e below AND by
    # all_nodes' two union branches, and every consumer of the returned
    # label frame re-evaluates the roots anti-join — without this barrier
    # the edge derivation re-ran once per branch per consumer (measured:
    # the length-chain window subtree evaluated 3-6× across the CC query
    # family at sf0.1). Ids-only rows, the same storage tier as the
    # per-round checkpoints.
    raw = edges.select(
        F.col(src).alias("_a"), F.col(dst).alias("_b")
    ).localCheckpoint(eager=False)
    e = (
        raw.filter(F.col("_a") != F.col("_b"))
        .distinct()
        # lazy: the first fingerprint below is the materializing action
        .localCheckpoint(eager=False)
    )
    all_nodes = raw.select(F.col("_a").alias("_n")).union(
        raw.select(F.col("_b").alias("_n"))
    )
    if nodes is not None:
        first = nodes.columns[0]
        all_nodes = all_nodes.union(nodes.select(F.col(first).alias("_n")))
    # used exactly once (root labeling at the end): no checkpoint job
    all_nodes = all_nodes.distinct()

    def _fingerprint(df: DataFrame) -> tuple:
        # one cheap aggregate: (row count, order-independent hash-sum)
        row = df.agg(
            F.count("*").alias("n"),
            # decimal(38,0) accumulator: immune to ANSI long-overflow
            F.sum(F.xxhash64("_a", "_b").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    # Per-round shuffle sizing: the loop runs ~2·log² n tiny shuffle stages
    # on a monotonically CONTRACTING edge set; with the session's global
    # shuffle-partition count each stage schedules dozens of near-empty
    # tasks and pure stage latency dominates (measured 6.5-13 s at sf0.1
    # for ~5k edges). The fingerprint already reports the exact edge count
    # every round for free, so shuffles are sized to it: ~100k edges per
    # partition, never above the session setting (big graphs keep full
    # parallelism; AQE still coalesces within a round). Conf is restored
    # on exit.
    spark = edges.sparkSession
    base_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        base_p = int(base_shuffle)
    except (TypeError, ValueError):  # pragma: no cover - e.g. "auto"
        base_p = None

    def _finish_on_driver(edge_df: DataFrame) -> DataFrame:
        from pyspark.sql import types as T

        sp = edge_df.sparkSession
        lab = _driver_union_find(
            [(r["_a"], r["_b"]) for r in edge_df.collect()]
        )
        id_type = edge_df.schema["_a"].dataType
        lbl_schema = T.StructType(
            [
                T.StructField("node", id_type),
                T.StructField("component", id_type),
            ]
        )
        labels = sp.createDataFrame(sorted(lab.items()), lbl_schema)
        roots = all_nodes.join(
            labels.select(F.col("node").alias("_a")),
            all_nodes["_n"] == F.col("_a"),
            "left_anti",
        ).select(F.col("_n").alias("node"), F.col("_n").alias("component"))
        return labels.union(roots)

    fp = _fingerprint(e)
    try:
        for _ in range(max_iter):
            if fp[0] <= driver_finish_edges:
                return _finish_on_driver(e)
            if base_p is not None:
                p = max(1, min(base_p, fp[0] // 100_000 + 1))
                spark.conf.set("spark.sql.shuffle.partitions", str(p))
            # lazy checkpoint: the fingerprint aggregate below is the one
            # action per round and materializes it — eager=True would spend a
            # second full job per round just to checkpoint. (Measured: fusing
            # TWO star rounds per checkpoint is ~40% SLOWER at sf0.1 — the
            # doubled lineage per checkpoint costs more than the saved
            # fingerprint actions; one round per checkpoint is the optimum.)
            stepped = _small_star(_large_star(e)).localCheckpoint(eager=False)
            # two-tier convergence check: a single-aggregate fingerprint per
            # round (count + order-independent hash-sum), and only when it
            # matches, the EXACT distributed set-difference confirms — so the
            # expensive anti-join pair runs once at the end, not every round.
            new_fp = _fingerprint(stepped)
            changed = 1
            if new_fp == fp:
                changed = (
                    stepped.exceptAll(e).limit(1).count()
                    + e.exceptAll(stepped).limit(1).count()
                )
            e, fp = stepped, new_fp
            if changed == 0:
                # stars: every non-root points at its component minimum
                labels = e.select(
                    F.col("_a").alias("node"), F.col("_b").alias("component")
                )
                roots = all_nodes.join(
                    e.select("_a").distinct(),
                    all_nodes["_n"] == F.col("_a"),
                    "left_anti",
                ).select(F.col("_n").alias("node"), F.col("_n").alias("component"))
                return labels.union(roots)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base_shuffle)
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def largest_component_sizes(cc: DataFrame, top: int = 20) -> DataFrame:
    """Component size histogram head — the dedup-audit summary (how big is
    the worst near-dup cluster?). One aggregate on the cc output."""
    return (
        cc.groupBy("component")
        .agg(F.count("*").alias("size"))
        .orderBy(F.col("size").desc(), F.col("component").asc())
        .limit(top)
    )
