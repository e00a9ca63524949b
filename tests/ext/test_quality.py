"""Quality-filter operators: repetition stats and Gopher rules, checked
against hand-computed expectations on synthetic multi-line documents (the
driver corpus is single-line) plus smoke runs on real testdata."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from colnade_spark.operators import quality


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def multiline(spark):
    # doc 1: 4 lines, "dup line" appears twice; one blank-line paragraph gap
    # doc 2: no repetition at all
    # doc 3: empty text
    # doc 4: every token identical
    return spark.createDataFrame(
        [
            (1, "dup line\nunique one\n\ndup line\nanother line"),
            (2, "alpha beta\ngamma delta"),
            (3, ""),
            (4, "spam spam spam spam"),
        ],
        ["doc_id", "text"],
    )


def test_repetition_stats_hand_checked(multiline):
    out = {
        r.doc_id: r
        for r in quality.repetition_stats(multiline).collect()
    }
    # doc 1: 4 non-empty lines, one value duplicated -> (4-3)/4
    assert out[1].rep_dup_line_frac == pytest.approx(1 / 4)
    # chars in duplicated lines: "dup line" (8) * 2 of total 8+8+10+12=38
    assert out[1].rep_dup_line_char_frac == pytest.approx(16 / 38)
    # paragraphs: ["dup line\nunique one", "dup line\nanother line"] distinct
    assert out[1].rep_dup_para_frac == 0.0
    assert out[2].rep_dup_line_frac == 0.0
    assert out[2].rep_dup_token_frac == 0.0
    assert out[3].rep_dup_line_frac == 0.0  # empty: guarded, not NaN
    assert out[4].rep_dup_token_frac == pytest.approx(3 / 4)


def test_top_token_stats_hand_checked(spark):
    df = spark.createDataFrame(
        [(1, "a b a c a"), (2, "x y"), (3, "")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in quality.top_token_stats(df).collect()}
    assert out[1].n_tokens == 5 and out[1].top_token_count == 3
    assert out[1].top_token_frac == pytest.approx(3 / 5)
    assert out[2].top_token_frac == pytest.approx(1 / 2)
    # empty doc survives (explode_outer) with zero counts
    assert out[3].n_tokens == 0 and out[3].top_token_frac == 0.0


def test_top_token_stats_keeps_every_doc(docs):
    out = quality.top_token_stats(docs)
    assert out.count() == docs.count()
    r = out.agg(F.min("top_token_frac"), F.max("top_token_frac")).first()
    assert 0 < r[0] <= r[1] <= 1


def test_gopher_flags_rules(spark):
    good = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "with many other common words that keep the average length sane "
        "while it is still long enough to clear the minimum word count "
        "for this particular test of the gopher quality rule filters"
    )
    bullets = "- one\n- two\n- three\n- four"
    symbols = "### ### ### " + good
    df = spark.createDataFrame(
        [(1, good), (2, bullets), (3, symbols), (4, "tiny doc")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in quality.gopher_flags(df, min_words=40).collect()}
    assert out[1].gopher_keep
    assert not out[2].g_bullet_ok and not out[2].gopher_keep
    assert not out[3].g_symbol_ratio_ok
    assert not out[4].g_word_count_ok


def test_gopher_filter_drops_flag_columns(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "c d")], ["doc_id", "text"])
    out = quality.gopher_filter(df, min_words=1, min_stopword_hits=0,
                                min_avg_word_len=0.0, min_alpha_word_frac=0.0)
    assert out.columns == ["doc_id", "text"]
    assert out.count() == 2


def test_gopher_flags_on_real_docs(docs):
    # synthetic corpus vocabulary contains only one stopword ("the")
    out = quality.gopher_flags(docs, min_words=10, min_stopword_hits=1)
    n = out.count()
    kept = out.filter("gopher_keep").count()
    assert n == docs.count() and 0 < kept <= n


def test_word_ngrams_and_dup_fracs(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x y z"), (3, "w")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in quality.repetition_stats(df).collect()}
    # doc 1 bigrams: [a b, b a, a b, b a] -> 2 dup of 4
    assert out[1].rep_dup_2gram_frac == pytest.approx(2 / 4)
    # doc 1 trigrams: [a b a, b a b, a b a] -> 1 dup of 3
    assert out[1].rep_dup_3gram_frac == pytest.approx(1 / 3)
    assert out[2].rep_dup_2gram_frac == 0.0
    assert out[3].rep_dup_2gram_frac == 0.0  # sub-n doc: empty grams


def test_top_ngram_stats_hand_checked(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "w")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in quality.top_ngram_stats(df, 2).collect()}
    assert out[1].n_grams == 4 and out[1].top_ngram_count == 2
    assert out[1].top_ngram_frac == pytest.approx(0.5)
    assert out[2].n_grams == 0 and out[2].top_ngram_frac == 0.0


def test_null_text_treated_as_empty(spark):
    df = spark.createDataFrame([(1, None), (2, "a b a")], ["doc_id", "text"])
    rep = {r.doc_id: r for r in quality.repetition_stats(df).collect()}
    assert rep[1].rep_dup_line_frac == 0.0 and rep[1].rep_dup_token_frac == 0.0
    top = {r.doc_id: r for r in quality.top_token_stats(df).collect()}
    assert top[1].n_tokens == 0
    flags = {r.doc_id: r for r in quality.gopher_flags(df).collect()}
    assert flags[1].gopher_keep is False  # not null


def test_unigram_logprob_surprise_ordering_and_empty_docs(spark):
    from colnade_spark.operators.quality import unigram_logprob

    rows = [(i, "the cat sat on the mat") for i in range(10)]
    rows += [(100, "zyzzyva qwerty xylophone"), (101, ""), (102, None)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: (r.n_toks, r.neg_logprob) for r in unigram_logprob(df).collect()}
    assert len(out) == 13  # every doc labeled, even empty/null
    assert out[101] == (0, None) and out[102] == (0, None)
    # a doc of corpus-rare tokens is more "surprising" than boilerplate
    assert out[100][1] > out[0][1]
    # identical docs get identical scores
    assert len({out[i] for i in range(10)}) == 1


def test_perplexity_buckets_hand_checked(spark):
    """Exact integer cut points per domain, ascending-score rank, ties
    to lowest id; NULL scores rejected; invalid bounds raise."""
    import pytest

    rows = [("en", i, float(100 - i)) for i in range(1, 11)]  # scores 99..90
    rows += [("fr", 100 + i, 5.0) for i in range(3)]          # all tied
    df = spark.createDataFrame(rows, ["lang", "doc_id", "nll"])
    out = {
        r.doc_id: r.ppl_bucket
        for r in quality.perplexity_buckets(
            df, "nll", domain_col="lang"
        ).collect()
    }
    # en: ascending nll = doc_ids 10 (90.0) .. 1 (99.0); n=10 ->
    # head rank <= ceil(3.3)=4, middle <= ceil(6.6)=7
    assert [out[d] for d in (10, 9, 8, 7)] == ["head"] * 4
    assert [out[d] for d in (6, 5, 4)] == ["middle"] * 3
    assert [out[d] for d in (3, 2, 1)] == ["tail"] * 3
    # fr ties: rank by id -> 100 head (ceil(0.99)=1), 101 middle, 102 tail
    assert (out[100], out[101], out[102]) == ("head", "middle", "tail")
    with pytest.raises(ValueError):
        quality.perplexity_buckets(df, "nll", bounds=(66, 33))
    with pytest.raises(Exception, match="NULL nll"):
        quality.perplexity_buckets(
            df.withColumn(
                "nll", F.when(F.col("doc_id") == 1, F.col("nll"))
            ),
            "nll",
            domain_col="lang",
        ).collect()


def test_code_quality_signals_hand_checked(spark):
    from colnade_spark.operators.quality import code_quality_signals

    rows = [
        (1, "def f(x):\n    return x + 1\n"),                # clean
        (2, "x" * 2000),                                     # minified blob
        (3, "!@# $%^ &*() {}[] ::: ;;; ...\n<<< >>> ???"),   # low alnum
        (4, "// auto-generated file, do not edit\ncode()"),  # marker
        (5, "// AUTOGENERATED\ncode()"),                     # marker, case
        (6, None),                                           # contentless
        (7, ""),                                             # empty
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in code_quality_signals(df).collect()}

    r1 = got[1]
    assert r1.n_lines == 3 and r1.max_line_len == 16
    assert r1.avg_line_len == (9 + 16 + 0) / 3.0
    assert r1.keep and not (
        r1.flag_long_lines or r1.flag_low_alnum or r1.flag_autogen
    )

    assert got[2].flag_long_lines and not got[2].keep
    assert got[3].flag_low_alnum and not got[3].keep
    assert got[4].flag_autogen and not got[4].keep
    assert got[5].flag_autogen and not got[5].keep  # auto-?generated variant

    r6 = got[6]
    assert r6.n_lines is None and not r6.keep
    r7 = got[7]
    # empty text: one empty line (split semantics) -> avg 0.0; zero chars
    # -> NULL alnum fraction, so low-alnum does not fire (no evidence)
    assert r7.n_lines == 1 and r7.max_line_len == 0
    assert r7.avg_line_len == 0.0 and r7.alnum_frac is None
    assert not r7.flag_long_lines and not r7.flag_low_alnum
    assert r7.keep  # nothing flagged; gate on length upstream if desired


def test_code_quality_signals_plan_is_scan_side(spark, sf_dir):
    from colnade_spark.operators.quality import code_quality_signals

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        code_quality_signals(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Join" not in plan, plan


def test_blend_quality_scores_matches_python_model(spark):
    from colnade_spark.operators.quality import blend_quality_scores

    rows = [
        (1, "en", 10, 100),
        (2, "en", 30, 50),
        (3, "en", 20, 75),
        (4, "en", 20, 60),   # tied s1 with doc 3 -> id breaks the rank
        (5, "fr", 5, 10),
        (6, "fr", 7, 5),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "s1", "s2"])
    weights = {"s1": 2.0, "s2": 1.0}
    got = {
        r.doc_id: r.blended_score
        for r in blend_quality_scores(df, weights, domain_col="lang").collect()
    }

    def pranks(vals):
        # percent_rank over (score, id): rank-1 / (n-1), unique ranks
        ordered = sorted(vals, key=lambda t: (t[1], t[0]))
        n = len(ordered)
        return {
            rid: (i / (n - 1)) if n > 1 else 0.0
            for i, (rid, _) in enumerate(ordered)
        }
    want = {}
    for lang in ("en", "fr"):
        sub = [r for r in rows if r[1] == lang]
        p1 = pranks([(r[0], r[2]) for r in sub])
        p2 = pranks([(r[0], r[3]) for r in sub])
        for rid, _, _, _ in sub:
            want[rid] = (2.0 / 3.0) * p1[rid] + (1.0 / 3.0) * p2[rid]
    assert got == want  # exact divisions + fixed-order float chain

    # the doc best on both signals ranks top of its domain
    assert max(got, key=lambda k: got[k] if k <= 4 else -1) == 2


def test_blend_quality_scores_validates_and_rejects_nulls(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkRuntimeError

    from colnade_spark.operators.quality import blend_quality_scores

    df = spark.createDataFrame([(1, 1.0), (2, None)], ["doc_id", "s"])
    with pytest.raises(ValueError):
        blend_quality_scores(df, {})
    with pytest.raises(ValueError):
        blend_quality_scores(df, {"s": -1.0})
    with pytest.raises((Py4JJavaError, PySparkRuntimeError, Exception)):
        blend_quality_scores(df, {"s": 1.0}).collect()


def test_code_quality_autogen_needs_word_boundary(spark):
    from colnade_spark.operators.quality import code_quality_signals

    rows = [
        (1, "this file regenerated bytes of data"),   # no marker: substring only
        (2, "degenerated by the process"),            # 'generated by' inside a word
        (3, "AUTO-GENERATED: do not edit"),           # real marker
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.flag_autogen for r in code_quality_signals(df).collect()}
    assert got == {1: False, 2: False, 3: True}


def test_blend_rejects_existing_output_column(spark):
    import pytest

    from colnade_spark.operators.quality import blend_quality_scores

    df = spark.createDataFrame(
        [(1, 1.0, 0.5)], ["doc_id", "s", "blended_score"]
    )
    with pytest.raises(ValueError):
        blend_quality_scores(df, {"s": 1.0})


# ---------------------------------------------------------------------------
# Frozen-quantile blending (fit_blend_quantiles / blend_quality_frozen)
# ---------------------------------------------------------------------------


def _blend_fixture(spark):
    rows = [
        # (doc_id, dom, s1, s2) — two domains with incomparable scales
        (1, "a", 10.0, 0.1),
        (2, "a", 20.0, 0.9),
        (3, "a", 30.0, 0.5),
        (4, "a", 40.0, 0.7),
        (5, "b", 1000.0, 5.0),
        (6, "b", 2000.0, 1.0),
        (7, "b", 3000.0, 9.0),
        (8, "b", 4000.0, 3.0),
    ]
    return spark.createDataFrame(rows, ["doc_id", "dom", "s1", "s2"])


def test_blend_frozen_orders_like_exact_blend(spark):
    """The frozen rank surrogate is monotone in each score within a
    domain: with enough quantiles to separate the fixture's values, the
    per-domain ORDER of blended scores matches the exact percent_rank
    blend (values differ — quantile granularity + sketch error — but a
    threshold gate selects the same tail)."""
    df = _blend_fixture(spark)
    weights = {"s1": 0.7, "s2": 0.3}
    q = quality.fit_blend_quantiles(df, list(weights), "dom", n_quantiles=50)
    assert len(q) == 2 and all(len(r["s1"]) == 49 for r in q)
    frozen = {
        r.doc_id: r.blended_score
        for r in quality.blend_quality_frozen(df, weights, q, "dom").collect()
    }
    exact = {
        r.doc_id: r.blended_score
        for r in quality.blend_quality_scores(df, weights, "dom").collect()
    }
    for dom_ids in ([1, 2, 3, 4], [5, 6, 7, 8]):
        fr = sorted(dom_ids, key=lambda i: (frozen[i], i))
        ex = sorted(dom_ids, key=lambda i: (exact[i], i))
        assert fr == ex
    assert all(0.0 <= v <= 1.0 for v in frozen.values())


def test_blend_frozen_scores_new_data_against_fit_distribution(spark):
    """Scoring NEW rows against the frozen model: a value above every
    fit edge ranks ~1, below every edge ranks 0 — the fit snapshot is
    the distribution, not the scored batch."""
    df = _blend_fixture(spark)
    q = quality.fit_blend_quantiles(df, ["s1"], "dom", n_quantiles=10)
    new = spark.createDataFrame(
        [(10, "a", 99999.0), (11, "a", -5.0)], ["doc_id", "dom", "s1"]
    )
    got = {
        r.doc_id: r.blended_score
        for r in quality.blend_quality_frozen(new, {"s1": 1.0}, q, "dom").collect()
    }
    assert got[10] == 0.9  # all 9 edges <= score -> 9/10
    assert got[11] == 0.0


def test_blend_frozen_guards(spark):
    from pyspark.errors import PySparkException

    df = _blend_fixture(spark)
    q = quality.fit_blend_quantiles(df, ["s1"], "dom", n_quantiles=10)
    # unknown domain raises in-expression
    alien = spark.createDataFrame([(9, "zz", 1.0)], ["doc_id", "dom", "s1"])
    with pytest.raises(PySparkException, match="domain not in the"):
        quality.blend_quality_frozen(alien, {"s1": 1.0}, q, "dom").collect()
    # NULL score raises in-expression
    nul = spark.createDataFrame(
        [(9, "a", None)], "doc_id long, dom string, s1 double"
    )
    with pytest.raises(PySparkException, match="NULL s1"):
        quality.blend_quality_frozen(nul, {"s1": 1.0}, q, "dom").collect()
    # model/score mismatch, empty model, bad weights, clashing output
    with pytest.raises(ValueError, match="missing from the"):
        quality.blend_quality_frozen(df, {"s2": 1.0}, q, "dom")
    with pytest.raises(ValueError, match="empty quantile model"):
        quality.blend_quality_frozen(df, {"s1": 1.0}, [], "dom")
    with pytest.raises(ValueError, match="weights must be positive"):
        quality.blend_quality_frozen(df, {"s1": -1.0}, q, "dom")
    with pytest.raises(ValueError, match="n_quantiles"):
        quality.fit_blend_quantiles(df, ["s1"], "dom", n_quantiles=1)
    with pytest.raises(ValueError, match="at least one score"):
        quality.fit_blend_quantiles(df, [], "dom")


def test_blend_frozen_global_model_and_plan(spark):
    """domain_col=None: one-row global model cross-joined broadcast;
    the scoring plan has NO shuffle exchange and NO sort — the whole
    point of the surrogate (the exact blend needs a per-domain sort)."""
    df = _blend_fixture(spark)
    q = quality.fit_blend_quantiles(df, ["s1", "s2"], None, n_quantiles=20)
    assert len(q) == 1
    out = quality.blend_quality_frozen(df, {"s1": 0.5, "s2": 0.5}, q, None)
    assert out.count() == 8
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Sort" not in plan
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastExchange" in plan or "Exchange" not in plan


def test_blend_frozen_staging_clash_and_ragged_model(spark):
    df = _blend_fixture(spark).withColumn("_bqf_s1", F.lit(1))
    q = quality.fit_blend_quantiles(_blend_fixture(spark), ["s1"], "dom")
    with pytest.raises(ValueError, match="_bqf_s1"):
        quality.blend_quality_frozen(df, {"s1": 1.0}, q, "dom")
    ragged = [dict(q[0]), dict(q[1])]
    ragged[1]["s1"] = ragged[1]["s1"][:-1]
    with pytest.raises(ValueError, match="ragged"):
        quality.blend_quality_frozen(
            _blend_fixture(spark), {"s1": 1.0}, ragged, "dom"
        )


def test_blend_frozen_null_domain_stratum(spark):
    """The fit keeps a NULL-domain stratum (groupBy preserves NULL
    groups) and the frozen blend joins NULL-SAFELY, so NULL-domain rows
    score against their own stratum instead of raising — the
    _psi_report NULL-stratum rule. A NULL domain the fit never saw
    still raises loudly."""
    from pyspark.errors import PySparkException

    df = spark.createDataFrame(
        [
            (1, None, 1.0),
            (2, None, 2.0),
            (3, None, 3.0),
            (4, "a", 10.0),
            (5, "a", 20.0),
        ],
        "doc_id long, dom string, s1 double",
    )
    q = quality.fit_blend_quantiles(df, ["s1"], "dom", n_quantiles=10)
    assert any(r["dom"] is None for r in q)
    got = {
        r.doc_id: r.blended_score
        for r in quality.blend_quality_frozen(df, {"s1": 1.0}, q, "dom").collect()
    }
    # NULL-domain rows rank within the NULL stratum: monotone in s1 ...
    assert got[1] < got[2] < got[3]
    # ... and against the NULL stratum's own edges (in domain 'a',
    # whose smallest score is 10.0, s1=3.0 would rank 0)
    assert got[3] > 0.5
    # a NULL domain ABSENT from the fit still raises in-expression
    q_a = [r for r in q if r["dom"] is not None]
    nul = spark.createDataFrame(
        [(9, None, 1.0)], "doc_id long, dom string, s1 double"
    )
    with pytest.raises(PySparkException, match="domain not in the"):
        quality.blend_quality_frozen(nul, {"s1": 1.0}, q_a, "dom").collect()


def test_blend_frozen_all_null_domain_model(spark):
    """A model whose ONLY stratum is the NULL domain still constructs
    (the edge table uses an explicit schema — type inference from an
    all-None column would fail) and scores NULL-domain rows."""
    df = spark.createDataFrame(
        [(1, None, 1.0), (2, None, 5.0)], "doc_id long, dom string, s1 double"
    )
    q = quality.fit_blend_quantiles(df, ["s1"], "dom", n_quantiles=4)
    assert len(q) == 1 and q[0]["dom"] is None
    got = {
        r.doc_id: r.blended_score
        for r in quality.blend_quality_frozen(df, {"s1": 1.0}, q, "dom").collect()
    }
    assert got[1] < got[2]


def test_maintain_blend_drift_validates_at_manifest_time(spark, tmp_path):
    """The maintainer fingerprints the blend model BEFORE any batch
    reaches the blend: a bad (weights, model) pair fails at manifest
    write with the operator's own message, not a ZeroDivision/KeyError
    from inside the hash."""
    import pytest as _pytest

    from colnade_spark.operators.quality import maintain_blend_drift

    base = {
        "value_col": "blended_score",
        "edges": [0.2, 0.4, 0.6, 0.8],
        "group_col": None,
        "counts": [{"bin": 0, "n_old": 1}],
    }
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )
    with _pytest.raises(ValueError, match="at least one score"):
        maintain_blend_drift(
            stream, {}, [{"s1": [1.0]}], base,
            str(tmp_path / "t"), str(tmp_path / "ck"),
        )
    with _pytest.raises(ValueError, match="missing from the"):
        maintain_blend_drift(
            stream, {"s1": 1.0}, [{"s2": [1.0]}], base,
            str(tmp_path / "t2"), str(tmp_path / "ck2"),
        )
    # a weight dict summing to <= 0 must hit the operator's own
    # message, NOT the w/total manifest normalization (ZeroDivision)
    with _pytest.raises(ValueError, match="weights must be positive"):
        maintain_blend_drift(
            stream, {"s1": 1.0, "s2": -1.0},
            [{"s1": [1.0], "s2": [1.0]}], base,
            str(tmp_path / "t3"), str(tmp_path / "ck3"),
        )
    # the fingerprint applies the FULL blend validation (shared
    # helper): ragged models and multi-row global models fail at
    # manifest time too, not at first-batch scoring
    with _pytest.raises(ValueError, match="ragged"):
        maintain_blend_drift(
            stream, {"s1": 1.0},
            [{"dom": "a", "s1": [1.0, 2.0]}, {"dom": "b", "s1": [1.0]}],
            base, str(tmp_path / "t4"), str(tmp_path / "ck4"),
            domain_col="dom",
        )
    with _pytest.raises(ValueError, match="exactly one"):
        maintain_blend_drift(
            stream, {"s1": 1.0},
            [{"s1": [1.0]}, {"s1": [2.0]}], base,
            str(tmp_path / "t5"), str(tmp_path / "ck5"),
        )
