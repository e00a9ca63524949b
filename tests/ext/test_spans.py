"""Sub-document dedup: duplicated token spans (Lee et al. 2022 style)
and corpus-wide boilerplate line removal — hand-checked on synthetic
corpora plus pure-python model comparisons on real testdata."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from colnade_spark.operators import spans


@pytest.fixture(scope="module")
def corpus(spark):
    # docs 1 & 2 share the verbatim 10-token passage "p0 ... p9" (one
    # maximal duplicated span each at k=8); doc 3 repeats its own 8-token
    # run twice (intra-doc duplication also counts); doc 4 is clean; doc 5
    # is empty.
    shared = " ".join(f"p{i}" for i in range(10))
    selfrep = " ".join(f"s{i}" for i in range(8))
    return spark.createDataFrame(
        [
            (1, f"intro one two {shared} outro alpha"),
            (2, f"{shared} totally different tail here"),
            (3, f"{selfrep} filler {selfrep}"),
            (4, "completely unique text with no duplication at all ok"),
            (5, ""),
        ],
        ["doc_id", "text"],
    )


def test_duplicate_spans_hand_checked(corpus):
    out = {
        (r.doc_id, r.span_start, r.span_end)
        for r in spans.duplicate_spans(corpus, k=8).collect()
    }
    # doc 1: shared block occupies tokens 3..12 -> windows 3,4,5 merge to
    # span [3, 12]; doc 2: tokens 0..9 -> span [0, 9]
    assert (1, 3, 12) in out
    assert (2, 0, 9) in out
    # doc 3: both copies of the 8-token run are duplicated windows;
    # positions 0 and 9, non-overlapping -> two spans
    assert (3, 0, 7) in out and (3, 9, 16) in out
    assert not any(d == 4 or d == 5 for d, *_ in out)


def test_remove_duplicate_spans_reassembles(corpus):
    out = {
        r.doc_id: r.text_dedup
        for r in spans.remove_duplicate_spans(corpus, k=8).collect()
    }
    assert out[1] == "intro one two outro alpha"
    assert out[2] == "totally different tail here"
    assert out[3] == "filler"
    # untouched docs keep their full normalized text
    assert out[4] == "completely unique text with no duplication at all ok"
    assert out[5] == ""


def test_duplicate_spans_min_count(corpus):
    # min_count=3: the cross-doc pair (2 occurrences) no longer qualifies,
    # but doc 3's intra-doc repeat contributes 2 of the needed... also only
    # 2 -> empty result
    assert spans.duplicate_spans(corpus, k=8, min_count=3).count() == 0


def test_duplicate_spans_matches_python_model(spark, sf_dir):
    """Span starts/ends at k=8 equal a brute-force python recomputation
    on the real documents fixture."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = docs.select("doc_id", "text").collect()
    import re
    from collections import Counter

    def toks(t):
        t = re.sub(r"[^a-z0-9 ]", " ", (t or "").lower())
        return [x for x in re.split(r"\s+", t.strip()) if x]

    k = 8
    grams: Counter = Counter()
    per_doc = {}
    for r in rows:
        tk = toks(r.text)
        per_doc[r.doc_id] = tk
        for i in range(len(tk) - k + 1):
            grams[" ".join(tk[i : i + k])] += 1
    expect = set()
    for did, tk in per_doc.items():
        hits = [
            i
            for i in range(len(tk) - k + 1)
            if grams[" ".join(tk[i : i + k])] >= 2
        ]
        cur = None
        for i in hits:
            if cur is None or i > cur[1]:
                if cur:
                    expect.add((did, cur[0], cur[1]))
                cur = [i, i + k - 1]
            else:
                cur[1] = i + k - 1
        if cur:
            expect.add((did, cur[0], cur[1]))
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in spans.duplicate_spans(docs, k=8).collect()
    }
    assert got == expect


def _suffix_automaton_repeat_coverage(seqs: dict, k: int) -> dict:
    """Independent EXACT model: generalized suffix automaton over the
    token sequences; a position is covered iff it lies inside some
    substring of length >= k occurring >= 2 times corpus-wide (within-doc
    repeats count). This is the suffix-structure formulation of Lee et
    al. 2022 — algorithmically disjoint from the k-gram hashing the
    operator (and the other python model) use."""
    sa_len, sa_link, sa_next, sa_cnt = [0], [-1], [{}], [0]
    last = 0

    def extend(c: str) -> int:
        nonlocal last
        cur = len(sa_len)
        sa_len.append(sa_len[last] + 1)
        sa_link.append(-1)
        sa_next.append({})
        sa_cnt.append(1)
        p = last
        while p != -1 and c not in sa_next[p]:
            sa_next[p][c] = cur
            p = sa_link[p]
        if p == -1:
            sa_link[cur] = 0
        else:
            q = sa_next[p][c]
            if sa_len[p] + 1 == sa_len[q]:
                sa_link[cur] = q
            else:
                clone = len(sa_len)
                sa_len.append(sa_len[p] + 1)
                sa_link.append(sa_link[q])
                sa_next.append(dict(sa_next[q]))
                sa_cnt.append(0)
                while p != -1 and sa_next[p].get(c) == q:
                    sa_next[p][c] = clone
                    p = sa_link[p]
                sa_link[q] = clone
                sa_link[cur] = clone
        last = cur
        return cur

    pos_state = {}
    for did, tk in seqs.items():
        last = 0  # generalized SA: each string starts at the root
        for i, t in enumerate(tk):
            pos_state[(did, i)] = extend(t)
    for s in sorted(range(1, len(sa_len)), key=lambda s: -sa_len[s]):
        if sa_link[s] > 0:
            sa_cnt[sa_link[s]] += sa_cnt[s]
    # longest repeated suffix ending at a position = len of the deepest
    # suffix-chain state with >= 2 occurrences (iterative memo walk)
    memo = {0: 0}

    def lrep(s: int) -> int:
        trail = []
        while s not in memo:
            if sa_cnt[s] >= 2:
                memo[s] = sa_len[s]
                break
            trail.append(s)
            s = sa_link[s]
        v = memo[s]
        for t in trail:
            memo[t] = v
        return v

    cov: dict = {}
    for (did, e), st in pos_state.items():
        L = lrep(st)
        if L >= k:
            cov.setdefault(did, set()).update(range(e - L + 1, e + 1))
    return cov


def test_duplicate_spans_equal_suffix_automaton_exact_repeats(spark, sf_dir):
    """Round-6 spike verdict, pinned as a test: the distributed k-gram
    inversion covers EXACTLY the positions a suffix-automaton exact-
    repeat pass covers at the same threshold (every repeated run of
    >= k tokens is a union of repeated k-windows and vice versa), so a
    suffix array/automaton operator would add zero recall while being a
    single-machine structure — measured position-for-position equal on
    the real fixtures (sf0.001 and sf0.01: 2697 and 2430 covered tokens,
    identical doc sets) plus the adversarial cases here (within-doc
    repeat, overlapping repeats, exactly-k and k-1 runs)."""
    k = 4
    fixture = spark.createDataFrame(
        [
            # cross-doc repeat of exactly k tokens (flagged)...
            (1, "p q r s junk1 junk2"),
            (2, "other p q r s tail"),
            # ...and a k-1 run shared by docs 3/4 (NOT flagged)
            (3, "x y z stop1 stop2 stop3"),
            (4, "filler x y z end9"),
            # within-ONE-doc repeat (min_count counts occurrences, not docs)
            (5, "a b c d mid a b c d"),
            # overlapping repeats: 'm n o p' and 'n o p q' both repeated
            (6, "m n o p q eins"),
            (7, "m n o p zwei n o p q drei"),
        ],
        ["doc_id", "text"],
    )
    for docs in (fixture, spark.read.parquet(f"{sf_dir}/documents.parquet")):
        kk = k if docs is fixture else 8
        rows = docs.select("doc_id", "text").collect()
        import re

        seqs = {
            r.doc_id: [
                x
                for x in re.split(
                    r"\s+",
                    re.sub(r"[^a-z0-9 ]", " ", (r.text or "").lower()).strip(),
                )
                if x
            ]
            for r in rows
        }
        want = _suffix_automaton_repeat_coverage(seqs, kk)
        got: dict = {}
        for r in spans.duplicate_spans(docs, k=kk, min_count=2).collect():
            got.setdefault(r.doc_id, set()).update(
                range(r.span_start, r.span_end + 1)
            )
        assert got == want
    # fixture sanity: the k-1 run is invisible, the within-doc and
    # overlapping repeats aren't
    fcov = _suffix_automaton_repeat_coverage(
        {
            r.doc_id: [x for x in (r.text or "").lower().split() if x]
            for r in fixture.collect()
        },
        k,
    )
    assert 3 not in fcov and 4 not in fcov
    assert 1 in fcov and 2 in fcov and 5 in fcov and 6 in fcov and 7 in fcov


@pytest.fixture(scope="module")
def lined(spark):
    # "boiler plate" appears in docs 1 and 2 (removed); "doc one only"
    # repeats WITHIN doc 1 but is unique to it (kept: min_docs counts
    # distinct docs); empty lines always drop.
    return spark.createDataFrame(
        [
            (1, "boiler plate\ndoc one only\n\ndoc one only\nunique a"),
            (2, "unique b\nboiler plate"),
            (3, "unique c"),
        ],
        ["doc_id", "text"],
    )


def test_duplicate_lines_counts(lined):
    out = spans.duplicate_lines(lined).collect()
    assert len(out) == 1
    assert out[0].n_docs == 2 and out[0].n_total == 2


def test_remove_duplicate_lines_order_preserved(lined):
    out = {
        r.doc_id: r.text_dedup
        for r in spans.remove_duplicate_lines(lined).collect()
    }
    assert out[1] == "doc one only\ndoc one only\nunique a"
    assert out[2] == "unique b"
    assert out[3] == "unique c"


def test_remove_all_lines_yields_empty(spark):
    df = spark.createDataFrame(
        [(1, "same line"), (2, "same line")], ["doc_id", "text"]
    )
    out = {
        r.doc_id: r.text_dedup
        for r in spans.remove_duplicate_lines(df).collect()
    }
    assert out == {1: "", 2: ""}


def test_line_dedup_delimiter_is_literal(spark):
    """The delimiter is a LITERAL string, not a Java regex: '|' must
    split on pipes (a raw regex '|' splits on every character and then
    removes the pipes themselves as corpus-wide boilerplate)."""
    from colnade_spark.operators.spans import remove_duplicate_lines

    df = spark.createDataFrame(
        [
            (1, "keep one|shared boiler|keep two"),
            (2, "other text|shared boiler|more text"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r.text_dedup
        for r in remove_duplicate_lines(
            df, delimiter="|", min_docs=2
        ).collect()
    }
    assert out[1] == "keep one|keep two"
    assert out[2] == "other text|more text"
