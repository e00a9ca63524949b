"""Property tests for the pipeline operators: chunking/packing invariants
on random documents, sampling partition laws.

Pure-Python reference models are recomputed per example and compared
exactly — these pin the SEMANTICS (coverage, ordering, determinism), the
DuckDB oracles in __spark_entry__ pin cross-engine equivalence."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from colnade_spark.operators import chunking, packing, sampling

common = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

words = st.text(alphabet="abc xy", min_size=0, max_size=40)
docs_strategy = st.lists(words, min_size=1, max_size=12)


@pytest.mark.usefixtures("spark")
@common
@given(texts=docs_strategy, size=st.integers(2, 8), overlap=st.integers(0, 3))
def test_chunking_model(spark, texts, size, overlap):
    if overlap >= size:
        overlap = size - 1
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        (r.doc_id, r.chunk_id): (r.chunk_start, r.chunk_tokens, r.chunk_text)
        for r in chunking.chunk_by_tokens(
            df, chunk_size=size, overlap=overlap
        ).collect()
    }
    # pure-python model
    stride = size - overlap
    want = {}
    for i, t in enumerate(texts):
        toks = [w for w in t.split() if w]
        for ci, start in enumerate(range(0, len(toks), stride)):
            w = toks[start : start + size]
            want[(i, ci)] = (start, len(w), " ".join(w))
    assert got == want


@pytest.mark.usefixtures("spark")
@common
@given(
    sizes=st.lists(st.integers(1, 30), min_size=1, max_size=40),
    budget=st.integers(5, 60),
)
def test_packing_model(spark, sizes, budget):
    rows = [(0, i, n) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, ["doc_id", "chunk_id", "chunk_tokens"])
    got = {
        r.chunk_id: (r.pack_offset, r.pack_id)
        for r in packing.pack_chunks(df, budget=budget, n_shards=1).collect()
    }
    off = 0
    want = {}
    for i, n in enumerate(sizes):
        want[i] = (off, off // budget)
        off += n
    assert got == want


@pytest.mark.usefixtures("spark")
@common
@given(frac=st.floats(0.0, 1.0), salt=st.sampled_from(["", "a", "bb"]))
def test_hash_sample_is_prefix_stable(spark, frac, salt):
    """The frac-sample equals the threshold-filter model, and smaller
    fractions are strict subsets (same salt)."""
    df = spark.createDataFrame([(i,) for i in range(60)], ["doc_id"])
    ids = {r.doc_id for r in sampling.hash_sample(df, frac, salt=salt).collect()}
    half = {r.doc_id for r in sampling.hash_sample(df, frac / 2, salt=salt).collect()}
    assert half <= ids
    assert len(ids) <= 60


@pytest.mark.usefixtures("spark")
@common
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 5),                      # user
            st.integers(0, 50),                     # hour offset
            st.sampled_from(["a", "b", "c", "x"]),  # type
        ),
        min_size=1,
        max_size=60,
    )
)
def test_funnel_model(spark, events):
    from datetime import datetime, timedelta

    from colnade_spark.operators import funnel

    base = datetime(2024, 1, 1)
    rows = [(u, base + timedelta(hours=h), t) for u, h, t in events]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {
        r.user_id: (r.t_1, r.t_2, r.t_3, r.stage_reached)
        for r in funnel.funnel_user_stages(df, ["a", "b", "c"]).collect()
    }
    # pure-python model: earliest completion, strictly increasing
    want = {}
    by_user = {}
    for u, ts, t in rows:
        by_user.setdefault(u, []).append((ts, t))
    for u, evs in by_user.items():
        prev = None
        stages = []
        for step in ["a", "b", "c"]:
            cands = [
                ts for ts, t in evs
                if t == step and (prev is None or ts > prev)
            ]
            cur = min(cands) if cands else None
            prev = cur
            stages.append(cur)
            if cur is None:
                stages.extend([None] * (2 - len(stages) + 1))
                break
        stages = (stages + [None, None, None])[:3]
        reached = sum(1 for s in stages if s is not None)
        want[u] = (stages[0], stages[1], stages[2], reached)
    assert got == want


def _span_model(texts: list[str], k: int) -> set[tuple[int, int, int]]:
    """Pure-python duplicated-span model: k-gram counts -> per-doc hit
    positions -> merged maximal spans."""
    import re
    from collections import Counter

    def toks(t):
        t = re.sub(r"[^a-z0-9 ]", " ", (t or "").lower())
        return [x for x in re.split(r"\s+", t.strip()) if x]

    per = {i: toks(t) for i, t in enumerate(texts)}
    grams: Counter = Counter()
    for tk in per.values():
        for i in range(len(tk) - k + 1):
            grams[" ".join(tk[i : i + k])] += 1
    out = set()
    for did, tk in per.items():
        hits = [
            i for i in range(len(tk) - k + 1)
            if grams[" ".join(tk[i : i + k])] >= 2
        ]
        cur = None
        for i in hits:
            if cur is None or i > cur[1]:
                if cur:
                    out.add((did, cur[0], cur[1]))
                cur = [i, i + k - 1]
            else:
                cur[1] = i + k - 1
        if cur:
            out.add((did, cur[0], cur[1]))
    return out


# tiny alphabet so random docs actually collide: self-repeats, cross-doc
# shares, and overlapping islands all occur within 10 examples
span_words = st.lists(
    st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=12
).map(" ".join)


@pytest.mark.usefixtures("spark")
@common
@given(texts=st.lists(span_words, min_size=1, max_size=6), k=st.integers(2, 4))
def test_duplicate_spans_model(spark, texts, k):
    from colnade_spark.operators import spans

    df = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in spans.duplicate_spans(df, k=k).collect()
    }
    assert got == _span_model(texts, k)


@pytest.mark.usefixtures("spark")
@common
@given(texts=st.lists(span_words, min_size=1, max_size=6), k=st.integers(2, 4))
def test_remove_spans_matches_model(spark, texts, k):
    """Removal drops exactly the model's span tokens, order preserved."""
    import re

    from colnade_spark.operators import spans

    def toks(t):
        t = re.sub(r"[^a-z0-9 ]", " ", (t or "").lower())
        return [x for x in re.split(r"\s+", t.strip()) if x]

    model = _span_model(texts, k)
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r.doc_id: r.text_dedup
        for r in spans.remove_duplicate_spans(df, k=k).collect()
    }
    for did, t in enumerate(texts):
        tk = toks(t)
        bad = {
            i
            for (d, s, e) in model
            if d == did
            for i in range(s, e + 1)
        }
        expect = " ".join(x for i, x in enumerate(tk) if i not in bad)
        assert got[did] == expect, (did, texts, k)


@pytest.mark.usefixtures("spark")
@common
@given(
    n=st.integers(20, 120),
    ngroups=st.integers(1, 10),
    salt=st.sampled_from(["", "s1", "s2"]),
)
def test_group_split_purity_model(spark, n, ngroups, salt):
    """Purity and coverage hold for ANY group map: every row labeled,
    labels constant within a group, and the label equals the pure-python
    hash-gate of the group key."""
    import hashlib

    from colnade_spark.operators.sampling import group_split

    from pyspark.sql import functions as F

    rows = [(i, i % ngroups) for i in range(n)]
    df = spark.createDataFrame(rows, ["doc_id", "g"])
    groups = df.select("doc_id", F.col("g").alias("component"))
    out = group_split(
        df, groups, {"train": 0.8, "val": 0.1, "test": 0.1},
        group_col="component", salt=salt,
    )
    got = {r.doc_id: r.split for r in out.collect()}
    assert len(got) == n

    def model_label(key: str) -> str:
        h = int(hashlib.md5((key + salt).encode()).hexdigest()[:15], 16)
        b1, b2 = int(0.8 * (1 << 60)), int((0.8 + 0.1) * (1 << 60))
        return "train" if h < b1 else ("val" if h < b2 else "test")

    for i in range(n):
        assert got[i] == model_label(str(i % ngroups))


@pytest.mark.usefixtures("spark")
@common
@given(
    counts=st.lists(st.integers(1, 500), min_size=1, max_size=6),
)
def test_temperature_mixture_rate_model(spark, counts):
    """The per-source keep thresholds equal the pure-python sqrt-flatten
    computation for ANY source-count profile, and the binding source
    keeps every row."""
    import hashlib
    import math

    from colnade_spark.operators.sampling import temperature_mixture

    rows = [
        (f"{s}_{i}", f"src{s}")
        for s, c in enumerate(counts)
        for i in range(c)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = temperature_mixture(df, alpha=0.5, key_col="doc_id", salt="p")
    got = {r.doc_id for r in out.collect()}

    w = {f"src{s}": math.sqrt(float(c)) for s, c in enumerate(counts)}
    n = {f"src{s}": c for s, c in enumerate(counts)}
    m = min(n[s] / w[s] for s in w)
    thr = {s: int(((w[s] * m) / n[s]) * (1 << 60)) for s in w}
    want = {
        did
        for did, src in rows
        if int(hashlib.md5((did + "p").encode()).hexdigest()[:15], 16) < thr[src]
    }
    assert got == want
    # the binding source — MINIMUM n/w, i.e. scarcest relative to its
    # flattened target — keeps every row (rate = 1 by construction)
    binding = min(w, key=lambda s: n[s] / w[s])
    assert {d for d, s in rows if s == binding} <= got


@pytest.mark.usefixtures("spark")
@common
@given(
    scores=st.lists(st.integers(0, 50), min_size=1, max_size=40),
    budget=st.integers(0, 300),
)
def test_token_budget_model(spark, scores, budget):
    """Budget pruning equals the greedy pure-python model for any score/
    token profile (tokens == scores here; ties resolved by id)."""
    from colnade_spark.operators.quality import token_budget_prune

    rows = [(i, int(s)) for i, s in enumerate(scores)]
    df = spark.createDataFrame(rows, ["doc_id", "toks"])
    got = {
        r.doc_id
        for r in token_budget_prune(
            df, budget, "toks", score_col="toks"
        ).collect()
    }
    order = sorted(rows, key=lambda r: (-r[1], r[0]))
    want, cum = set(), 0
    for i, t in order:
        cum += t
        if cum <= budget:
            want.add(i)
        else:
            break
    assert got == want


@pytest.mark.usefixtures("spark")
@common
@given(
    weights=st.lists(st.integers(0, 500), min_size=4, max_size=60),
    n_shards=st.integers(1, 8),
    salt=st.sampled_from(["", "p1"]),
)
def test_balanced_shards_model(spark, weights, n_shards, salt):
    """For ANY non-negative weight vector: balanced membership equals
    the pure-python equal-weight cut of the hash order (start*n div
    total), per-shard sums land within one max weight of total/n, and
    the bucketed Spark decomposition matches the flat model exactly."""
    import hashlib

    from colnade_spark.operators.shards import training_order

    if sum(weights) == 0:
        return  # rejected by the operator (tested separately)
    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    out = training_order(
        df, n_shards, salt=salt, balance_col="w", n_buckets=64
    )
    got = {r.doc_id: r.shard for r in out.collect()}

    def h(i: int) -> int:
        return int(hashlib.md5((str(i) + salt).encode()).hexdigest()[:15], 16)

    order = sorted(range(len(weights)), key=lambda i: (h(i), i))
    total = sum(weights)
    start, model = 0, {}
    for i in order:
        model[i] = min((start * n_shards) // total, n_shards - 1)
        start += weights[i]
    assert got == model
    per = {}
    for i, w in enumerate(weights):
        per[model[i]] = per.get(model[i], 0) + w
    mx = max(weights)
    for s, tot in per.items():
        assert abs(tot - total / n_shards) <= mx + 1


@pytest.mark.usefixtures("spark")
@common
@given(
    sizes=st.lists(st.integers(0, 1000), min_size=1, max_size=50),
    p=st.sampled_from([25, 50, 75, 90, 100]),
)
def test_corpus_card_quantile_model(spark, sizes, p):
    """q_p equals the pure-python lower empirical quantile at rank
    ceil(p*n/100) for ANY size multiset."""
    from colnade_spark.operators import report

    df = spark.createDataFrame(
        [("g", s) for s in sizes], ["lang", "n_chars"]
    )
    row = report.corpus_card(df, quantiles=(p,)).collect()[0]
    srt = sorted(sizes)
    rank = (p * len(sizes) + 99) // 100  # == ceil(p*n/100)
    assert row[f"q_{p}"] == srt[rank - 1]
    assert row.n_docs == len(sizes) and row.total_size == sum(sizes)
