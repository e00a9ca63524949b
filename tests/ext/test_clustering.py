"""Reproducible Lloyd's k-means: exact equivalence to a single-node pure
python model (the point of the integer-sum design), plus structure
recovery on the labeled embeddings."""

from __future__ import annotations

from pyspark.sql import functions as F

from colnade_spark.operators.clustering import DEFAULT_SCALE, kmeans
from colnade_spark.tpch import table_path


def _half_up(y: float) -> float:
    """Spark ROUND semantics: ties away from zero. The power-of-two scale
    makes y exactly representable, so this is engine-independent."""
    import math

    return math.floor(y + 0.5) if y >= 0 else -math.floor(-y + 0.5)


def _python_kpp_init(pts, k):
    """Twin of clustering._kpp_init: md5-uniform weighted draws."""
    import hashlib
    import math

    by_id = sorted(pts)
    cents = [list(by_id[0][1])]
    for rnd in range(1, k):
        best = None
        for rid, v in pts:
            dmin = min(
                sum((a - b) * (a - b) for a, b in zip(v, c)) for c in cents
            )
            h = hashlib.md5(f"{rid}:kpp:{rnd}".encode()).hexdigest()
            u = int(h[:15], 16) / float(1 << 60)
            key = (
                math.log(u) / dmin if dmin > 0 and u > 0 else float("-inf")
            )
            cand = (-key, rid)  # max key, ties to lowest id
            if best is None or cand < best[0]:
                best = (cand, v)
        cents.append(list(best[1]))
    return cents


def _python_kmeans(rows, k, iters, init="lowest_ids"):
    """Same algorithm, same operation order, pure python floats."""
    pts = [
        (rid, [_half_up(float(x) * DEFAULT_SCALE) for x in vec])
        for rid, vec in rows
    ]
    if init == "kpp":
        cents = _python_kpp_init(pts, k)
    else:
        cents = [list(v) for _, v in sorted(pts)[:k]]

    def assign(v):
        best = None
        for cid, c in enumerate(cents):
            d = 0.0
            for a, b in zip(v, c):
                d += (a - b) * (a - b)
            if best is None or (d, cid) < best:
                best = (d, cid)
        return best[1]

    for _ in range(iters):
        sums = {}
        for _, v in pts:
            cid = assign(v)
            s, n = sums.get(cid, ([0] * len(v), 0))
            sums[cid] = ([a + int(b) for a, b in zip(s, v)], n + 1)
        new_cents = []
        for cid in range(k):
            if cid in sums:
                s, n = sums[cid]
                new_cents.append([float(x) / n for x in s])
            else:
                new_cents.append(cents[cid])
        cents = new_cents
    return {rid: assign(v) for rid, v in pts}


def test_kmeans_matches_python_model_exactly(spark, sf_dir):
    emb = spark.read.parquet(table_path(sf_dir, "embeddings"))
    rows = [(r.vec_id, r.embedding) for r in emb.collect()]
    want = _python_kmeans(rows, k=4, iters=2)
    got = {
        r.vec_id: r.cluster
        for r in kmeans(emb, "vec_id", "embedding", k=4, iters=2).collect()
    }
    assert got == want


def test_kmeans_kpp_init_matches_python_model(spark, sf_dir):
    emb = spark.read.parquet(table_path(sf_dir, "embeddings"))
    rows = [(r.vec_id, r.embedding) for r in emb.collect()]
    want = _python_kmeans(rows, k=4, iters=1, init="kpp")
    got = {
        r.vec_id: r.cluster
        for r in kmeans(emb, "vec_id", "embedding", k=4, iters=1, init="kpp").collect()
    }
    assert got == want


def test_kmeans_kpp_spreads_centroids(spark, sf_dir):
    """k-means++ must not pick duplicate starting points on distinct data
    and rejects unknown init names."""
    import pytest

    emb = spark.read.parquet(table_path(sf_dir, "embeddings"))
    rows = [(r.vec_id, r.embedding) for r in emb.collect()]
    pts = [
        (rid, tuple(_half_up(float(x) * DEFAULT_SCALE) for x in vec))
        for rid, vec in rows
    ]
    cents = _python_kpp_init([(r, list(v)) for r, v in pts], 6)
    assert len({tuple(c) for c in cents}) == 6
    with pytest.raises(ValueError):
        kmeans(emb, k=2, init="random")


def test_kmeans_reruns_are_identical(spark, sf_dir):
    """Reproducibility under repartitioning — the design goal."""
    emb = spark.read.parquet(table_path(sf_dir, "embeddings"))
    a = {r.vec_id: r.cluster for r in kmeans(emb, k=3, iters=2).collect()}
    b = {
        r.vec_id: r.cluster
        for r in kmeans(emb.repartition(13), k=3, iters=2).collect()
    }
    assert a == b


def test_kmeans_improves_objective_and_beats_random(spark, sf_dir):
    """Lloyd's guarantee is a non-increasing within-cluster SSE — assert
    iterations actually reduce it vs the init assignment. The synthetic
    embeddings are only weakly label-clustered (purity ~0.18 at k=10 vs
    0.10 random), so purity only gets an above-random check."""
    emb = spark.read.parquet(table_path(sf_dir, "embeddings"))
    rows = [(r.vec_id, r.embedding) for r in emb.collect()]

    def sse(assign_map, cents_k, iters):
        # python-model twin (proven equivalent above) to read off the SSE
        pts = {
            rid: [_half_up(float(x) * DEFAULT_SCALE) for x in vec]
            for rid, vec in rows
        }
        by_c = {}
        for rid, cid in assign_map.items():
            by_c.setdefault(cid, []).append(pts[rid])
        total = 0.0
        for cid, vs in by_c.items():
            n = len(vs)
            cent = [sum(col) / n for col in zip(*vs)]
            for v in vs:
                total += sum((a - b) * (a - b) for a, b in zip(v, cent))
        return total

    a0 = {r.vec_id: r.cluster for r in kmeans(emb, k=8, iters=0).collect()}
    a3 = {r.vec_id: r.cluster for r in kmeans(emb, k=8, iters=3).collect()}
    assert sse(a3, 8, 3) < sse(a0, 8, 0)

    n_labels = emb.select("label").distinct().count()
    out = kmeans(emb, k=n_labels, iters=3)
    joined = out.join(emb.select("vec_id", "label"), "vec_id")
    top = (
        joined.groupBy("cluster", "label").count()
        .groupBy("cluster").agg(F.max("count").alias("top"))
    )
    purity = sum(r.top for r in top.collect()) / emb.count()
    assert purity > 1.2 / n_labels, purity


def test_kmeans_validates_args(spark, sf_dir):
    import pytest

    emb = spark.read.parquet(table_path(sf_dir, "embeddings"))
    with pytest.raises(ValueError):
        kmeans(emb, k=0)
    with pytest.raises(ValueError):
        kmeans(emb, k=2, iters=-1)


# ---------------------------------------------------------------------------
# prototypicality / prototype_prune (Sorscher et al. 2022 pruning metric)
# ---------------------------------------------------------------------------


def _python_prototypicality(rows, cents):
    """Twin of clustering.prototypicality: integer-scaled vectors, same
    left-to-right IEEE fold, ties to the lowest centroid id."""
    out = {}
    for rid, vec in rows:
        v = [_half_up(float(x) * DEFAULT_SCALE) for x in vec]
        best = None
        for cid, c in enumerate(cents):
            d = 0.0
            for a, b in zip(v, c):
                d += (a - b) * (a - b)
            if best is None or (d, cid) < best:
                best = (d, cid)
        out[rid] = (best[1], best[0])
    return out


def test_prototypicality_matches_python_model_exactly(spark, sf_dir):
    from colnade_spark.operators.clustering import kmeans, prototypicality

    emb = spark.read.parquet(table_path(sf_dir, "embeddings"))
    asg, cents = kmeans(emb, k=4, iters=1, return_centroids=True)
    rows = [(r.vec_id, r.embedding) for r in emb.collect()]
    want = _python_prototypicality(rows, cents)

    got_df = prototypicality(emb, cents)
    got = {r.vec_id: (r.cluster, r.proto_dist) for r in got_df.collect()}
    assert got == want  # bit-exact doubles, not approx

    # the frozen-centroid assignment IS the kmeans assignment
    km = {r.vec_id: r.cluster for r in asg.collect()}
    assert {k: v[0] for k, v in got.items()} == km

    # all input columns preserved, two added
    assert set(got_df.columns) == set(emb.columns) | {"cluster", "proto_dist"}


def test_prototypicality_is_scan_side(spark, sf_dir):
    from colnade_spark.operators.clustering import kmeans, prototypicality

    emb = spark.read.parquet(table_path(sf_dir, "embeddings"))
    _, cents = kmeans(emb, k=4, iters=1, return_centroids=True)
    plan = (
        prototypicality(emb, cents)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_prototype_prune_modes_and_counts(spark, sf_dir):
    import math

    from colnade_spark.operators.clustering import (
        kmeans,
        prototype_prune,
        prototypicality,
    )

    emb = spark.read.parquet(table_path(sf_dir, "embeddings"))
    _, cents = kmeans(emb, k=4, iters=1, return_centroids=True)
    rows = [(r.vec_id, r.embedding) for r in emb.collect()]
    scored = _python_prototypicality(rows, cents)

    by_cluster = {}
    for rid, (cid, d) in scored.items():
        by_cluster.setdefault(cid, []).append((d, rid))

    frac = 0.5
    want_hard, want_easy = set(), set()
    for cid, members in by_cluster.items():
        keep = math.ceil(frac * len(members))
        # hard: farthest first, ties to lowest id
        hard = sorted(members, key=lambda t: (-t[0], t[1]))[:keep]
        easy = sorted(members, key=lambda t: (t[0], t[1]))[:keep]
        want_hard |= {rid for _, rid in hard}
        want_easy |= {rid for _, rid in easy}

    got_hard = {
        r.vec_id
        for r in prototype_prune(emb, cents, frac, mode="keep_hard").collect()
    }
    got_easy = {
        r.vec_id
        for r in prototype_prune(emb, cents, frac, mode="keep_easy").collect()
    }
    assert got_hard == want_hard
    assert got_easy == want_easy

    # frac=1.0 keeps everything in either mode
    n = emb.count()
    assert prototype_prune(emb, cents, 1.0).count() == n

    # per-cluster survivor counts are exactly ceil(frac * n_cluster)
    got_counts = {
        r.cluster: r.n
        for r in prototype_prune(emb, cents, frac)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want_counts = {
        cid: math.ceil(frac * len(m)) for cid, m in by_cluster.items()
    }
    assert got_counts == want_counts


def test_prototype_ops_validate_args(spark, sf_dir):
    import pytest

    from colnade_spark.operators.clustering import (
        prototype_prune,
        prototypicality,
    )

    emb = spark.read.parquet(table_path(sf_dir, "embeddings"))
    cents = [[0.0] * 64]
    with pytest.raises(ValueError):
        prototypicality(emb, [])
    with pytest.raises(ValueError):
        prototype_prune(emb, cents, 0.0)
    with pytest.raises(ValueError):
        prototype_prune(emb, cents, 0.5, mode="keep_some")
    with pytest.raises(ValueError):
        prototypicality(emb.withColumn("cluster", F.lit(1)), cents)
    with pytest.raises(ValueError):
        prototypicality(emb.withColumn("_proto_v", F.lit(1)), cents)


def test_prototype_prune_threshold_composition(spark, sf_dir):
    """The documented 100 TB reduction: when a cluster outgrows its sort,
    prototypicality + quality_prune_threshold (score = proto_dist,
    per-domain = per-cluster) replaces the exact rank window with a
    scan-side filter. Pin that the composition (a) keeps approximately
    the requested fraction and (b) agrees with the exact keep_hard cut up
    to the sketch's rank error (ties all survive in the approx path)."""
    from colnade_spark.operators.clustering import (
        kmeans,
        prototype_prune,
        prototypicality,
    )
    from colnade_spark.operators.quality import quality_prune_threshold

    emb = spark.read.parquet(table_path(sf_dir, "embeddings"))
    _, cents = kmeans(emb, k=4, iters=1, return_centroids=True)
    scored = prototypicality(emb, cents)

    frac = 0.5
    approx = quality_prune_threshold(
        scored, frac, score_col="proto_dist", domain_col="cluster",
        accuracy=100_000,
    )
    exact = prototype_prune(emb, cents, frac, mode="keep_hard")

    n = emb.count()
    na, ne = approx.count(), exact.count()
    # kept fraction within the sketch tolerance band
    assert abs(na - ne) <= max(4, 0.05 * n), (na, ne, n)
    # the approx cut is the same top-of-distance slice: near-total overlap
    a_ids = {r.vec_id for r in approx.select("vec_id").collect()}
    e_ids = {r.vec_id for r in exact.select("vec_id").collect()}
    assert len(a_ids & e_ids) >= 0.9 * len(e_ids)

    # and the approx plan has NO per-cluster sort window (the point)
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan


def test_prototype_prune_rejects_window_staging_collision(spark, sf_dir):
    import pytest

    from colnade_spark.operators.clustering import prototype_prune

    emb = spark.read.parquet(table_path(sf_dir, "embeddings"))
    cents = [[0.0] * 64]
    with pytest.raises(ValueError):
        prototype_prune(emb.withColumn("_rn", F.lit(1)), cents, 0.5)
