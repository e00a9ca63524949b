"""DSIR importance weighting: pure-python model parity, degenerate
distributions, deterministic Gumbel resampling, and the broadcast join
shape of the scoring pass."""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from colnade_spark.operators.importance import (
    MICRO,
    bucket_distribution,
    dsir_weights,
    gumbel_topk,
)

B = 64
DOCS = [
    (1, "the quick brown fox", "en"),
    (2, "the the the the", "en"),
    (3, "un deux trois", "fr"),
    (4, "quick brown dogs run", "en"),
    (5, "", "en"),
    (6, None, "fr"),
    (7, "fox and dogs", "fr"),
]


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _toks(text):
    t = re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", (text or "").lower())).strip()
    return [w for w in t.split(" ") if w]


def _feats(text):
    tk = _toks(text)
    grams = tk + [" ".join(tk[i : i + 2]) for i in range(len(tk) - 1)]
    return [_h60(g) % B for g in grams]


def _model_weights(rows, target_langs=("en",), s=1.0):
    raw, tgt = {}, {}
    for _, text, lang in rows:
        for b in _feats(text):
            raw[b] = raw.get(b, 0) + 1
            if lang in target_langs:
                tgt[b] = tgt.get(b, 0) + 1
    rt, tt = sum(raw.values()), sum(tgt.values())
    lr = {
        b: round(
            (
                math.log((tgt.get(b, 0) + s) / (tt + s * B))
                - math.log((raw.get(b, 0) + s) / (rt + s * B))
            )
            * MICRO
        )
        for b in range(B)
    }
    out = {}
    for i, text, _ in rows:
        fs = _feats(text)
        out[i] = (len(fs), sum(lr[b] for b in fs) / float(MICRO))
    return out


def _df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])


def test_weights_match_python_model(spark):
    df = _df(spark)
    got = {
        r.doc_id: (r.n_feats, r.weight)
        for r in dsir_weights(
            df, df.filter(F.col("lang") == "en"), buckets=B
        ).collect()
    }
    want = _model_weights(DOCS)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-9), k


def test_empty_and_null_docs_score_zero_feats(spark):
    df = _df(spark)
    got = {
        r.doc_id: (r.n_feats, r.weight)
        for r in dsir_weights(df, df, buckets=B).collect()
    }
    assert got[5] == (0, 0.0)
    assert got[6] == (0, 0.0)


def test_target_equals_raw_gives_zero_weights(spark):
    df = _df(spark)
    for r in dsir_weights(df, df, buckets=B).collect():
        assert r.weight == 0.0


def test_bucket_distribution_total(spark):
    df = _df(spark)
    total = (
        bucket_distribution(df, buckets=B)
        .agg(F.sum("n").alias("t"))
        .first()
        .t
    )
    assert total == sum(len(_feats(t)) for _, t, _ in DOCS)


def test_gumbel_topk_deterministic_and_bounded(spark):
    df = _df(spark)
    w = dsir_weights(df, df.filter(F.col("lang") == "en"), buckets=B)
    a = [(r.doc_id, r.rk) for r in gumbel_topk(w, 3).orderBy("rk").collect()]
    b = [(r.doc_id, r.rk) for r in gumbel_topk(w, 3).orderBy("rk").collect()]
    assert a == b
    assert len(a) == 3
    assert [rk for _, rk in a] == [1, 2, 3]
    # a different salt is a different (but still deterministic) draw
    c = [(r.doc_id, r.rk) for r in gumbel_topk(w, 3, salt="other").collect()]
    assert all(rk in (1, 2, 3) for _, rk in c)


def test_scoring_is_shuffle_free(spark):
    """dsir_weights scores via the frozen table: the scoring plan must
    contain NO exchange at all — the corpus never shuffles."""
    df = _df(spark)
    plan = (
        dsir_weights(df, df, buckets=B)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_frozen_scoring_matches_join_path(spark):
    from colnade_spark.operators.importance import dsir_score_frozen, fit_logratio

    df = _df(spark)
    target = df.filter(F.col("lang") == "en")
    lr = fit_logratio(df, target, buckets=B)
    assert len(lr) == B
    frozen = {
        r.doc_id: (r.n_feats, r.weight)
        for r in dsir_score_frozen(df, lr).collect()
    }
    joined = {
        r.doc_id: (r.n_feats, r.weight)
        for r in dsir_weights(df, target, buckets=B).collect()
    }
    assert frozen == joined


def test_frozen_scoring_plan_has_no_shuffle(spark):
    from colnade_spark.operators.importance import dsir_score_frozen

    df = _df(spark)
    plan = (
        dsir_score_frozen(df, [0] * B)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# SoftDeDup-style reweighting (commonness_weights / duplication_weights)
# ---------------------------------------------------------------------------

SOFT_DOCS = [
    (1, "alpha beta gamma delta epsilon"),
    (2, "alpha beta gamma delta epsilon"),      # exact dup of 1
    (3, "alpha beta gamma delta DIFFERENT"),    # shares a leading gram
    (4, "zeta eta theta iota kappa"),           # unique
    (5, "one two"),                             # fewer than n tokens
    (6, ""),                                    # empty
    (7, None),                                  # NULL
]


def _soft_model(rows, n=3):
    """Pure-python twin of commonness_weights: gram occurrence counts,
    per-doc exact sums, one float division."""
    per_doc_grams = {}
    counts = {}
    for rid, text in rows:
        tk = _toks(text)
        grams = [" ".join(tk[i : i + n]) for i in range(len(tk) - n + 1)]
        hs = [_h60(g) for g in grams]
        per_doc_grams[rid] = hs
        for h in hs:
            counts[h] = counts.get(h, 0) + 1
    out = {}
    for rid, hs in per_doc_grams.items():
        s = sum(counts[h] for h in hs)
        w = (len(hs) / float(s)) if s > 0 else 1.0
        out[rid] = (len(hs), s, w)
    return out


def test_commonness_weights_match_python_model(spark):
    from colnade_spark.operators.importance import commonness_weights

    df = spark.createDataFrame(SOFT_DOCS, ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_grams, r.sum_df, r.weight)
        for r in commonness_weights(df, n=3).collect()
    }
    want = _soft_model(SOFT_DOCS, n=3)
    assert got == want  # exact ints + one IEEE division -> bit equality

    # semantics: dup pair down-weighted, unique doc weighs exactly 1.0
    assert got[4][2] == 1.0
    assert got[1][2] < 1.0 and got[1] == got[2]
    # partial overlap sits between full dup and unique
    assert got[1][2] < got[3][2] <= 1.0
    # gram-free docs (short/empty/NULL) weigh 1.0 with zero grams
    for rid in (5, 6, 7):
        assert got[rid] == (0, 0, 1.0)


def test_commonness_weights_corpus_bounds(spark, sf_dir):
    from colnade_spark.operators.importance import commonness_weights
    from colnade_spark.tpch import table_path

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    out = commonness_weights(docs, n=3)
    assert out.count() == docs.count()  # every doc gets a weight
    bad = out.filter(
        (F.col("weight") <= 0) | (F.col("weight") > 1.0)
        | (F.col("sum_df") < F.col("n_grams"))
    ).count()
    assert bad == 0  # df >= 1 per own occurrence => 0 < weight <= 1


def test_duplication_weights_cluster_sizes(spark):
    from colnade_spark.operators.importance import duplication_weights

    rows = [
        (1, "Hello, World!"),
        (2, "hello world"),      # same fingerprint as 1 (normalization)
        (3, "hello world!!!"),   # same fingerprint again
        (4, "something else"),
        (5, None),               # NULL text -> weight 1.0, not a cluster
        (6, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.cluster_size, r.dup_weight)
        for r in duplication_weights(df).collect()
    }
    third = 1.0 / 3.0
    assert got[1] == got[2] == got[3] == (3, third)
    assert got[4] == (1, 1.0)
    assert got[5] == (1, 1.0) and got[6] == (1, 1.0)


def test_soft_dedup_ops_validate_columns(spark):
    from colnade_spark.operators.importance import (
        commonness_weights,
        duplication_weights,
    )

    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        commonness_weights(df, n=0)
    with pytest.raises(ValueError):
        commonness_weights(df.withColumn("_sd_tk", F.lit(1)))
    with pytest.raises(ValueError):
        duplication_weights(df.withColumn("_dw_fp", F.lit(1)))


# ---------------------------------------------------------------------------
# Frozen-count commonness scoring (commonness_score_frozen)
# ---------------------------------------------------------------------------


def test_commonness_frozen_matches_exact_when_collision_free(spark):
    """Scoring the fit corpus against its own frozen table reproduces
    commonness_weights bit-exactly when no two distinct grams share a
    bucket (2^14 buckets over ~15 distinct grams — verified
    collision-free below, not assumed)."""
    from colnade_spark.operators.importance import (
        commonness_score_frozen,
        commonness_weights,
        fit_gram_counts,
    )

    buckets = 1 << 14
    # verify the fixture really is collision-free at this size
    grams = set()
    for _, text in SOFT_DOCS:
        tk = _toks(text)
        grams.update(" ".join(tk[i : i + 3]) for i in range(len(tk) - 2))
    assert len({_h60(g) % buckets for g in grams}) == len(grams)

    df = spark.createDataFrame(SOFT_DOCS, ["doc_id", "text"])
    ct = fit_gram_counts(df, n=3, buckets=buckets)
    assert len(ct) == buckets and sum(ct) > 0
    frozen = {
        r.doc_id: (r.n_grams, r.sum_df, r.weight)
        for r in commonness_score_frozen(df, ct, n=3).collect()
    }
    exact = {
        r.doc_id: (r.n_grams, r.sum_df, r.weight)
        for r in commonness_weights(df, n=3).collect()
    }
    assert frozen == exact


def test_commonness_frozen_collisions_are_conservative(spark):
    """buckets=1 is the worst collision case: every gram shares one
    bucket, so each gram's df becomes the corpus-wide gram total and
    weight collapses to 1/total — never HIGHER than the exact weight."""
    from colnade_spark.operators.importance import (
        commonness_score_frozen,
        commonness_weights,
        fit_gram_counts,
    )

    df = spark.createDataFrame(SOFT_DOCS, ["doc_id", "text"])
    ct = fit_gram_counts(df, n=3, buckets=1)
    total = ct[0]
    assert total == sum(
        max(len(_toks(t)) - 2, 0) for _, t in SOFT_DOCS
    )
    frozen = {
        r.doc_id: (r.n_grams, r.sum_df, r.weight)
        for r in commonness_score_frozen(df, ct, n=3).collect()
    }
    exact = {
        r.doc_id: r.weight for r in commonness_weights(df, n=3).collect()
    }
    for rid, (n_grams, sum_df, w) in frozen.items():
        if n_grams == 0:
            assert (sum_df, w) == (0, 1.0)
        else:
            assert sum_df == n_grams * total
            assert w == n_grams / float(sum_df) == 1.0 / total
            assert w <= exact[rid]


def test_commonness_frozen_unseen_grams_weigh_one(spark):
    """Grams absent from the fit corpus clamp to df=1 (their own
    occurrence): an entirely-novel document weighs exactly 1.0, a
    half-novel document sits strictly between."""
    from colnade_spark.operators.importance import (
        commonness_score_frozen,
        fit_gram_counts,
    )

    fit = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")] * 2, ["doc_id", "text"]
    )
    ct = fit_gram_counts(fit, n=3, buckets=1 << 14)
    novel = spark.createDataFrame(
        [
            (10, "totally new words never seen before anywhere"),
            (11, "alpha beta gamma delta epsilon"),  # all grams seen 2x
            (12, None),
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.n_grams, r.sum_df, r.weight)
        for r in commonness_score_frozen(novel, ct, n=3).collect()
    }
    assert got[10][2] == 1.0 and got[10][1] == got[10][0]  # every df clamped to 1
    assert got[11] == (3, 6, 0.5)  # each of 3 grams counted twice in fit
    assert got[12] == (0, 0, 1.0)


def test_commonness_frozen_plan_has_no_shuffle(spark):
    """Frozen scoring is a pure scan-side projection: NO exchange."""
    from colnade_spark.operators.importance import commonness_score_frozen

    df = spark.createDataFrame(SOFT_DOCS, ["doc_id", "text"])
    plan = (
        commonness_score_frozen(df, [0] * 256)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_commonness_frozen_guards(spark):
    from colnade_spark.operators.importance import (
        commonness_score_frozen,
        fit_gram_counts,
    )

    df = spark.createDataFrame(SOFT_DOCS, ["doc_id", "text"])
    with pytest.raises(ValueError, match="empty count table"):
        commonness_score_frozen(df, [])
    with pytest.raises(ValueError, match="n must be"):
        fit_gram_counts(df, n=0)
    with pytest.raises(ValueError, match="buckets must be"):
        fit_gram_counts(df, buckets=0)
    clash = df.withColumn("_cf_tk", F.lit(1))
    with pytest.raises(ValueError, match="_cf_tk"):
        commonness_score_frozen(clash, [1])


def test_fused_fit_matches_two_pass_fit(spark):
    """fit_logratio_flagged (one tokenize+explode pass, conditional target
    count) must reproduce fit_logratio(corpus.filter(flag), corpus)
    EXACTLY — same integer-micro list, element for element."""
    from colnade_spark.operators.importance import (
        fit_logratio,
        fit_logratio_flagged,
    )

    df = _df(spark)
    flag = F.col("lang") == "en"
    fused = fit_logratio_flagged(df, flag, buckets=B)
    twopass = fit_logratio(df, df.filter(flag), buckets=B)
    assert fused == twopass
    # degenerate flags: never-true and always-true targets
    assert fit_logratio_flagged(df, F.lit(False), buckets=B) == fit_logratio(
        df, df.filter(F.lit(False)), buckets=B
    )
    assert fit_logratio_flagged(df, F.lit(True), buckets=B) == [0] * B


def test_fused_fit_entry_weights_unchanged(spark):
    """The dsir entry rewrite (fused fit + frozen scoring) must emit the
    same rows as the original dsir_weights(corpus, corpus.filter(flag))."""
    from colnade_spark.operators.importance import (
        dsir_score_frozen,
        fit_logratio_flagged,
    )

    df = _df(spark)
    flag = F.col("lang") == "en"
    got = {
        r.doc_id: (r.n_feats, r.weight)
        for r in dsir_score_frozen(
            df, fit_logratio_flagged(df, flag, buckets=B)
        ).collect()
    }
    want = {
        r.doc_id: (r.n_feats, r.weight)
        for r in dsir_weights(df, df.filter(flag), buckets=B).collect()
    }
    assert got == want
