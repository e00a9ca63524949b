"""Chunking and deterministic-sampling operators: hand-checked window
semantics, determinism across runs, split exhaustiveness, stratified
exactness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from colnade_spark.operators import chunking, sampling


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


# ------------------------------------------------------------- chunking ----
def test_chunk_windows_hand_checked(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x"), (3, "")], ["doc_id", "text"]
    )
    out = chunking.chunk_by_tokens(df, chunk_size=4, overlap=1)
    rows = {(r.doc_id, r.chunk_id): r for r in out.collect()}
    # doc 1: 7 tokens, stride 3 -> starts 0, 3, 6
    assert rows[(1, 0)].chunk_text == "a b c d"
    assert rows[(1, 1)].chunk_text == "d e f g"
    assert rows[(1, 2)].chunk_text == "g" and rows[(1, 2)].chunk_tokens == 1
    # doc 2: single short chunk; doc 3 (empty): no rows
    assert rows[(2, 0)].chunk_text == "x"
    assert {d for d, _ in rows} == {1, 2}


def test_chunk_coverage_reconstructs_document(docs):
    out = chunking.chunk_by_tokens(docs, chunk_size=16, overlap=0)
    rebuilt = (
        out.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_id", "chunk_text"))),
                    lambda s: s["chunk_text"],
                ),
                " ",
            ).alias("joined")
        )
    )
    orig = docs.select(
        "doc_id", F.concat_ws(" ", F.split(F.trim("text"), r"\s+")).alias("norm")
    )
    diff = rebuilt.join(orig, "doc_id").filter(F.col("joined") != F.col("norm"))
    assert diff.count() == 0


def test_chunk_overlap_validates():
    with pytest.raises(ValueError):
        chunking.chunk_by_tokens(None, chunk_size=4, overlap=4)


# ------------------------------------------------------------- sampling ----
def test_hash_sample_deterministic_and_proportional(docs):
    a = sampling.hash_sample(docs, 0.25, salt="s1")
    b = sampling.hash_sample(docs, 0.25, salt="s1")
    ids_a = {r.doc_id for r in a.select("doc_id").collect()}
    ids_b = {r.doc_id for r in b.select("doc_id").collect()}
    assert ids_a == ids_b
    n = docs.count()
    assert 0.15 * n < len(ids_a) < 0.35 * n
    # nested: a 0.1 sample is a subset of the 0.25 sample (same salt)
    ids_c = {
        r.doc_id
        for r in sampling.hash_sample(docs, 0.1, salt="s1").select("doc_id").collect()
    }
    assert ids_c <= ids_a


def test_hash_sample_salt_independence(docs):
    ids_1 = {r.doc_id for r in sampling.hash_sample(docs, 0.5, salt="a").collect()}
    ids_2 = {r.doc_id for r in sampling.hash_sample(docs, 0.5, salt="b").collect()}
    assert ids_1 != ids_2  # different salts select different rows


def test_hash_split_exhaustive_and_stable(docs):
    out = sampling.hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(
        F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()
    assert counts["train"] > counts["val"]
    with pytest.raises(ValueError):
        sampling.hash_split(docs, {"a": 0.5, "b": 0.4})


def test_stratified_sample_exact_k(docs):
    out = sampling.stratified_sample(docs, "lang", k=5)
    sizes = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    orig = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    for lang, n in sizes.items():
        assert n == min(5, orig[lang])
    # deterministic across runs
    again = sampling.stratified_sample(docs, "lang", k=5)
    assert {r.doc_id for r in out.collect()} == {r.doc_id for r in again.collect()}


def test_chunk_null_text_yields_no_chunks(spark):
    df = spark.createDataFrame([(1, None), (2, "a b")], ["doc_id", "text"])
    out = chunking.chunk_by_tokens(df, chunk_size=4)
    assert {r.doc_id for r in out.collect()} == {2}


def test_weighted_sample_determinism_and_bias(spark):
    import statistics

    rows = [(i, 10.0 if i < 20 else 0.1) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    a = {r.doc_id for r in sampling.weighted_sample(df, 30, "w").collect()}
    b = {r.doc_id for r in sampling.weighted_sample(df, 30, "w").collect()}
    assert a == b and len(a) == 30
    # the 20 heavy rows (100x weight) should dominate the sample
    heavy = sum(1 for i in a if i < 20)
    assert heavy >= 15
    # different salt -> different sample
    c = {r.doc_id for r in sampling.weighted_sample(df, 30, "w", salt="z").collect()}
    assert c != a


def test_weighted_sample_excludes_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)], ["doc_id", "w"]
    )
    out = {r.doc_id for r in sampling.weighted_sample(df, 10, "w").collect()}
    assert out == {1, 5}
    with pytest.raises(ValueError):
        sampling.weighted_sample(df, 0, "w")


def test_mixture_sample_hits_target_proportions(docs):
    out = sampling.mixture_sample(
        docs, "source", {"src0": 0.5, "src1": 0.3, "src2": 0.2}, salt="t"
    )
    by_src = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(by_src) == {"src0", "src1", "src2"}  # others dropped
    n0 = docs.filter(F.col("source") == "src0").count()
    # binding source (highest target/actual ratio) is kept whole
    assert by_src["src0"] == n0
    total = sum(by_src.values())
    # output mixture approximates 50/30/20 (hash-gate binomial noise)
    assert abs(by_src["src0"] / total - 0.5) < 0.15
    assert abs(by_src["src1"] / total - 0.3) < 0.15
    assert abs(by_src["src2"] / total - 0.2) < 0.15
    # deterministic: same call, same row set
    a = {r.doc_id for r in out.select("doc_id").collect()}
    b = {
        r.doc_id
        for r in sampling.mixture_sample(
            docs, "source", {"src0": 0.5, "src1": 0.3, "src2": 0.2}, salt="t"
        ).select("doc_id").collect()
    }
    assert a == b


def test_mixture_sample_validates(docs):
    with pytest.raises(ValueError):
        sampling.mixture_sample(docs, "source", {})
    with pytest.raises(ValueError):
        sampling.mixture_sample(docs, "source", {"src0": -0.1, "src1": 1.1})
    with pytest.raises(ValueError):
        sampling.mixture_sample(docs, "source", {"src0": 0.5, "nope": 0.5})


def test_mixture_sample_unnormalized_targets_equivalent(docs):
    """Weights are normalized: {1, 2} == {1/3, 2/3}."""
    a = {
        r.doc_id
        for r in sampling.mixture_sample(
            docs, "source", {"src3": 1.0, "src4": 2.0}, salt="u"
        ).select("doc_id").collect()
    }
    b = {
        r.doc_id
        for r in sampling.mixture_sample(
            docs, "source", {"src3": 1 / 3, "src4": 2 / 3}, salt="u"
        ).select("doc_id").collect()
    }
    assert a == b and a


def test_upsample_epochs_whole_and_fractional(docs):
    """2.0 epochs -> exactly 2 copies of every row; fractional part is a
    deterministic hash gate (~frac of keys get one extra copy)."""
    up = sampling.upsample_epochs(
        docs, {"en": 2.0, "de": 3.5}, domain_col="lang", salt="t1"
    )
    base = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {r.lang: r.n for r in up.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got["en"] == 2 * base["en"]
    assert 3 * base["de"] <= got["de"] <= 4 * base["de"]
    # unlisted domains pass through with exactly 1 copy
    for lang, n in base.items():
        if lang not in ("en", "de"):
            assert got[lang] == n
    # deterministic: a re-run replicates the identical row multiset
    again = sampling.upsample_epochs(
        docs, {"en": 2.0, "de": 3.5}, domain_col="lang", salt="t1"
    )
    a = sorted((r.doc_id, r.epoch) for r in up.select("doc_id", "epoch").collect())
    b = sorted((r.doc_id, r.epoch) for r in again.select("doc_id", "epoch").collect())
    assert a == b


def test_upsample_epochs_downsamples_below_one(docs):
    """Epochs < 1 act as a content-addressed keep-gate (0 whole copies +
    fractional extra), consistent with hash_sample's membership."""
    up = sampling.upsample_epochs(docs, {"en": 0.4}, domain_col="lang", salt="s")
    kept = {r.doc_id for r in up.filter(F.col("lang") == "en").collect()}
    direct = {
        r.doc_id
        for r in sampling.hash_sample(
            docs.filter(F.col("lang") == "en"), 0.4, salt="s"
        ).collect()
    }
    assert kept == direct


def test_upsample_epochs_epoch_numbering(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "lang"])
    up = sampling.upsample_epochs(df, {"a": 3.0}, domain_col="lang")
    assert sorted(r.epoch for r in up.collect()) == [1, 2, 3]


def test_upsample_epochs_rejects_negative(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "lang"])
    with pytest.raises(ValueError):
        sampling.upsample_epochs(df, {"a": -1.0}, domain_col="lang")


def test_solve_epochs_realizes_target_mixture():
    from colnade_spark.operators.sampling import solve_epochs

    counts = {"web": 1000, "code": 100, "books": 50}
    targets = {"web": 0.5, "code": 0.3, "books": 0.2}
    e = solve_epochs(counts, targets)
    # scarcest-relative domain anchors at 1 epoch
    assert min(e.values()) == 1.0
    # realized token mixture matches the target proportions
    realized = {d: e[d] * counts[d] for d in counts}
    tot = sum(realized.values())
    for d in counts:
        assert abs(realized[d] / tot - targets[d]) < 1e-9


def test_solve_epochs_cap_and_defaults():
    from colnade_spark.operators.sampling import solve_epochs

    e = solve_epochs({"a": 1000, "b": 1}, {"a": 0.5, "b": 0.5}, max_epochs=8)
    assert e["b"] == 8.0 and e["a"] == 1.0  # cap binds the scarce domain
    # domains without a target stay at one epoch
    e2 = solve_epochs({"a": 10, "b": 10}, {"a": 1.0})
    assert e2 == {"a": 1.0, "b": 1.0}
    import pytest
    with pytest.raises(ValueError):
        solve_epochs({"a": 0}, {"a": 1.0})


def test_solve_epochs_feeds_upsample(spark, sf_dir):
    """counts -> epochs -> upsample: the realized per-lang row mixture
    moves toward the target."""
    import pyspark.sql.functions as F
    from colnade_spark.operators.sampling import solve_epochs, upsample_epochs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    targets = {lang: 1.0 / len(counts) for lang in counts}  # uniform target
    epochs = solve_epochs(counts, targets)
    up = upsample_epochs(docs, epochs, domain_col="lang", salt="mix")
    got = {
        r.lang: r.n
        for r in up.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # uniformity improves: max/min ratio shrinks vs the raw corpus
    raw_ratio = max(counts.values()) / min(counts.values())
    new_ratio = max(got.values()) / min(got.values())
    assert new_ratio < raw_ratio


def test_group_split_is_leakage_safe(spark, docs):
    """Every member of a group gets the SAME split label (near-dup
    clusters cannot straddle train/test); unmapped rows fall back to
    singleton groups; full coverage and determinism like hash_split."""
    groups = docs.select(
        "doc_id", (F.col("doc_id") % 37).alias("component")
    ).filter(F.col("doc_id") % 2 == 0)  # PARTIAL mapping: odd ids unmapped
    out = sampling.group_split(
        docs, groups, {"train": 0.8, "val": 0.1, "test": 0.1},
        group_col="component", salt="gs",
    )
    assert out.count() == docs.count()          # left join loses nothing
    assert set(out.columns) == set(docs.columns) | {"split"}
    # purity: each mapped group carries exactly one split label
    purity = (
        out.join(groups, "doc_id")
        .groupBy("component")
        .agg(F.countDistinct("split").alias("k"))
        .agg(F.max("k").alias("mx"))
        .head()
        .mx
    )
    assert purity == 1
    # unmapped rows behave exactly like hash_split on their own key
    odd = out.filter(F.col("doc_id") % 2 == 1).select("doc_id", "split")
    want = sampling.hash_split(
        docs.filter(F.col("doc_id") % 2 == 1),
        {"train": 0.8, "val": 0.1, "test": 0.1},
        salt="gs",
    ).select("doc_id", "split")
    assert sorted(map(tuple, odd.collect())) == sorted(map(tuple, want.collect()))
    # deterministic
    again = sampling.group_split(
        docs, groups, {"train": 0.8, "val": 0.1, "test": 0.1},
        group_col="component", salt="gs",
    )
    assert sorted(map(tuple, out.select("doc_id", "split").collect())) == sorted(
        map(tuple, again.select("doc_id", "split").collect())
    )


def test_temperature_mixture_flattens_toward_sqrt(spark):
    """alpha=0.5: realized counts approach sqrt proportions, the
    relatively-scarcest source keeps EVERY row, alpha=1 is identity,
    and membership is deterministic; invalid alpha raises."""
    rows = [(i, "big" if i % 10 < 8 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = sampling.temperature_mixture(df, alpha=0.5, salt="t")
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(
        F.count("*").alias("n")).collect()}
    assert counts["small"] == 200                   # binding source kept whole
    # big's target rate is sqrt(800)/sqrt(200)-scaled: 800 * (sqrt(800)*m/800)
    # with m = 200/sqrt(200) -> 800 rows * 0.5 = 400 expected; hash gate
    # realizes a binomial around it
    assert 320 < counts["big"] < 480
    # alpha=1 keeps the natural mixture: every row survives
    ident = sampling.temperature_mixture(df, alpha=1.0, salt="t")
    assert ident.count() == 1000
    # deterministic
    again = sampling.temperature_mixture(df, alpha=0.5, salt="t")
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )
    with pytest.raises(ValueError):
        sampling.temperature_mixture(df, alpha=0.0)


def test_temperature_mixture_ignores_null_sources(spark):
    """NULL-source rows are dropped by the gate unconditionally, so they
    must not participate in the count solve either — a huge NULL group
    would otherwise become the binding minimum and depress every real
    source's keep rate. Output over a frame WITH nulls equals output
    over the same frame with nulls pre-filtered."""
    rows = [(i, "big" if i % 10 < 8 else "small") for i in range(1000)]
    rows += [(10_000 + i, None) for i in range(5000)]  # dominant NULL group
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    with_nulls = sampling.temperature_mixture(df, alpha=0.5, salt="t")
    without = sampling.temperature_mixture(
        df.filter(F.col("source").isNotNull()), alpha=0.5, salt="t"
    )
    assert sorted(r.doc_id for r in with_nulls.collect()) == sorted(
        r.doc_id for r in without.collect()
    )
    # and the realized mixture still matches the 2-source solve
    assert with_nulls.filter("source = 'small'").count() == 200


def test_group_split_collapses_duplicate_mappings(spark):
    """A key mapped to two groups must not fan out: the mapping
    collapses deterministically (min group id) and output row count is
    preserved."""
    df = spark.createDataFrame([(i,) for i in range(20)], ["doc_id"])
    groups = spark.createDataFrame(
        [(i, "g1") for i in range(20)] + [(i, "g0") for i in range(20)],
        ["doc_id", "component"],
    )
    out = sampling.group_split(df, groups, {"a": 0.5, "b": 0.5})
    rows = out.collect()
    assert len(rows) == 20
    # all keys collapsed to 'g0' (min) -> one label for everyone
    assert len({r.split for r in rows}) == 1


def test_temperature_mixture_all_null_sources_drops_all(spark):
    """A frame whose every source is NULL gates to EMPTY (the drop
    contract), not to keep-all via the empty-counts short-circuit; a
    truly empty frame stays empty."""
    df = spark.createDataFrame(
        [(i, None) for i in range(50)], "doc_id: long, source: string"
    )
    assert sampling.temperature_mixture(df, alpha=0.5).count() == 0
    assert sampling.temperature_mixture(df.limit(0), alpha=0.5).count() == 0


def test_stratified_exact_split_matches_python_model(spark):
    import hashlib
    import math

    from colnade_spark.operators.sampling import stratified_exact_split

    rows = [(i, ["en", "fr", "zh", None][i % 4]) for i in range(1, 101)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}

    def h60(key, salt=""):
        return int(hashlib.md5(f"{key}{salt}".encode()).hexdigest()[:15], 16)

    want = {}
    by_stratum = {}
    for rid, lang in rows:
        by_stratum.setdefault(lang, []).append(rid)
    for lang, ids in by_stratum.items():
        ordered = sorted(ids, key=lambda i: (h60(i), i))
        n = len(ordered)
        acc, bounds = 0.0, []
        for label, w in list(weights.items())[:-1]:
            acc += w
            bounds.append((label, math.floor(n * acc)))
        for rank, rid in enumerate(ordered, start=1):
            label = next(
                (lb for lb, b in bounds if rank <= b), list(weights)[-1]
            )
            want[rid] = label

    out = stratified_exact_split(df, weights, strata_col="lang")
    got = {r.doc_id: r.split for r in out.collect()}
    assert got == want

    # exact per-stratum counts: floor(0.8*25)=20, floor(0.9*25)-20=2, rest 3
    from collections import Counter

    for lang in ("en", "fr", "zh", None):
        c = Counter(got[i] for i, lg in rows if lg == lang)
        assert c == {"train": 20, "val": 2, "test": 3}, (lang, c)

    # determinism under repartitioning
    got2 = {
        r.doc_id: r.split
        for r in stratified_exact_split(
            df.repartition(7), weights, strata_col="lang"
        ).collect()
    }
    assert got2 == got


def test_stratified_exact_split_validates(spark):
    import pytest

    from colnade_spark.operators.sampling import stratified_exact_split

    df = spark.createDataFrame([(1, "en")], ["doc_id", "lang"])
    with pytest.raises(ValueError):
        stratified_exact_split(df, {"a": 0.5, "b": 0.4}, "lang")
    with pytest.raises(ValueError):
        stratified_exact_split(
            df.withColumn("_ses_rn", F.lit(1)), {"a": 1.0}, "lang"
        )
    # tiny strata still realize every nonzero floor boundary: a single
    # row goes to the LAST label (all floors are 0)
    one = spark.createDataFrame([(1, "en")], ["doc_id", "lang"])
    out = stratified_exact_split(one, {"train": 0.9, "val": 0.1}, "lang")
    assert out.collect()[0].split == "val"


def test_stratified_exact_split_rejects_negative_weights(spark):
    import pytest

    from colnade_spark.operators.sampling import stratified_exact_split

    df = spark.createDataFrame([(1, "en")], ["doc_id", "lang"])
    # sums to 1 but a negative weight would make the rank bounds
    # non-monotone and silently misassign
    with pytest.raises(ValueError):
        stratified_exact_split(df, {"a": 1.5, "b": -0.5}, "lang")
    # zero-weight labels are legal and simply empty
    out = stratified_exact_split(
        spark.createDataFrame([(i, "en") for i in range(10)], ["doc_id", "lang"]),
        {"a": 0.0, "b": 1.0},
        "lang",
    )
    assert out.filter(F.col("split") == "a").count() == 0
    assert out.filter(F.col("split") == "b").count() == 10


def test_stratified_exact_split_output_column_guard(spark):
    import pytest

    from colnade_spark.operators.sampling import stratified_exact_split

    df = spark.createDataFrame([(1, "en", "old")], ["doc_id", "lang", "split"])
    with pytest.raises(ValueError):
        stratified_exact_split(df, {"a": 1.0}, "lang")
    # an unrelated _ses_h column is no longer spuriously rejected
    ok = spark.createDataFrame([(1, "en", 9)], ["doc_id", "lang", "_ses_h"])
    out = stratified_exact_split(ok, {"a": 1.0}, "lang")
    assert out.collect()[0].split == "a"
