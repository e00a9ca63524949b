"""Contrastive mining: hand-checked label rules, python-model parity,
and the broadcast scan shape."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from colnade_spark.operators.mining import hard_negative_topk, hard_positive_topk


def _vecs():
    # label 0: ids 1,2,3 near +x; label 1: ids 4,5 near +y, 6 near +x
    return [
        (1, [1.0, 0.0], 0),
        (2, [0.9, 0.1], 0),
        (3, [0.8, -0.2], 0),
        (4, [0.0, 1.0], 1),
        (5, [0.1, 0.9], 1),
        (6, [0.95, 0.05], 1),  # label-1 item embedded among label 0s
    ]


def _cos(u, v):
    d = sum(a * b for a, b in zip(u, v))
    return round(
        d
        / (
            math.sqrt(sum(a * a for a in u))
            * math.sqrt(sum(a * a for a in v))
        ),
        6,
    )


def _model(rows, anchor, k, same_label, descending):
    aid, av, al = anchor
    cands = [
        (i, _cos(av, v))
        for i, v, l in rows
        if i != aid and ((l == al) == same_label)
    ]
    cands.sort(key=lambda t: (-t[1] if descending else t[1], t[0]))
    return [i for i, _ in cands[:k]]


def _df(spark):
    return spark.createDataFrame(_vecs(), ["vec_id", "embedding", "label"])


def test_hard_negatives_match_model(spark):
    df = _df(spark)
    anchors = df.filter(F.col("vec_id") == 1)
    got = [
        r.neighbor_id
        for r in hard_negative_topk(df, anchors, k=3)
        .orderBy("rank")
        .collect()
    ]
    assert got == _model(_vecs(), (1, [1.0, 0.0], 0), 3, False, True)
    # the cross-label item sitting in anchor 1's neighborhood must lead
    assert got[0] == 6


def test_hard_positives_are_least_similar_same_label(spark):
    df = _df(spark)
    anchors = df.filter(F.col("vec_id") == 4)
    got = [
        r.neighbor_id
        for r in hard_positive_topk(df, anchors, k=2)
        .orderBy("rank")
        .collect()
    ]
    # same label as 4 -> {5, 6}; 6 is far (near +x), 5 is close
    assert got == [6, 5]


def test_no_self_and_label_rule_holds(spark):
    df = _df(spark)
    anchors = df
    neg = hard_negative_topk(df, anchors, k=10).collect()
    lab = {i: l for i, _, l in _vecs()}
    for r in neg:
        assert r.neighbor_id != r.anchor_id
        assert lab[r.neighbor_id] != lab[r.anchor_id]
    pos = hard_positive_topk(df, anchors, k=10).collect()
    for r in pos:
        assert r.neighbor_id != r.anchor_id
        assert lab[r.neighbor_id] == lab[r.anchor_id]


def test_mining_is_broadcast_scan(spark):
    df = _df(spark)
    plan = (
        hard_negative_topk(df, df.limit(2), k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_degenerate_rows_are_excluded_not_fatal(spark):
    """Zero-norm embeddings must not abort the job (ANSI divide), null
    sims must not occupy top ranks, and null-label rows are neither
    negatives nor positives."""
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [0.9, 0.1], 0),
            (3, None, 0),           # null embedding
            (4, [0.0, 0.0], 0),     # zero norm
            (5, [0.95, 0.05], None),  # null label
            (6, [0.1, 0.9], 1),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    anchors = df.filter(F.col("vec_id") == 1)
    pos = hard_positive_topk(df, anchors, k=10).collect()
    assert [r.neighbor_id for r in pos] == [2]
    assert all(r.cos_sim is not None for r in pos)
    neg = hard_negative_topk(df, anchors, k=10).collect()
    assert [r.neighbor_id for r in neg] == [6]


def test_recall_at_k_audit(spark, sf_dir):
    """recall_at_k: exact self-comparison is 1.0; a truncated approx
    result shows the right fraction; empty approx for a query is 0.0."""
    from colnade_spark.operators.similarity import (
        brute_force_topk,
        recall_at_k,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    q = e.filter(F.col("vec_id") < 4)
    exact = brute_force_topk(e, q, k=5).cache()
    perfect = recall_at_k(exact, exact).collect()
    assert len(perfect) == 4
    assert all(r.recall == 1.0 and r.n_exact == 5 for r in perfect)

    # keep only rank<=2 of one query, drop another query entirely
    partial = exact.filter(
        ((F.col("query_id") == 0) & (F.col("rank") <= 2))
        | (F.col("query_id") == 1)
    )
    got = {r.query_id: r.recall for r in recall_at_k(partial, exact).collect()}
    assert got[0] == 0.4 and got[1] == 1.0 and got[2] == 0.0 and got[3] == 0.0


def test_pq_recall_beats_random_and_ivf_is_perfect(spark, sf_dir):
    """Property tie-in: full-probe IVF recall is exactly 1.0 vs brute
    force; trained-PQ recall is measurable and nonzero."""
    from colnade_spark.operators.pq import pq_encode, pq_topk, train_pq_codebooks
    from colnade_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        recall_at_k,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    q = e.filter(F.col("vec_id") < 4)
    exact = brute_force_topk(e, q, k=5).cache()
    ivf = ivf_topk(e, q, k=5, nlist=4, nprobe=4)
    assert all(r.recall == 1.0 for r in recall_at_k(ivf, exact).collect())

    books = train_pq_codebooks(e, m=8, ksub=16, sample_n=512, seed=3)
    pq = pq_topk(pq_encode(e, books), q, books, k=5)
    mean_recall = (
        recall_at_k(pq, exact).agg(F.avg("recall").alias("m")).first().m
    )
    assert mean_recall > 0.0


def test_recall_at_k_is_duplicate_safe(spark):
    """recall is a SET metric: duplicate (query, neighbor) rows in either
    input must neither fan out the join nor double-count (ADVICE round 3).
    Exact {1,2,3} vs approx {2,3,9} is recall 2/3 regardless of row
    multiplicity on either side."""
    from colnade_spark.operators.similarity import recall_at_k

    exact = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 2)], ["query_id", "neighbor_id"]
    )
    approx = spark.createDataFrame(
        [(0, 2), (0, 2), (0, 3), (0, 9)], ["query_id", "neighbor_id"]
    )
    r = recall_at_k(approx, exact).collect()
    assert len(r) == 1
    row = r[0]
    assert row.n_exact == 3 and row.n_hit == 2
    assert abs(row.recall - 2 / 3) < 1e-12
