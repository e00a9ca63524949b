"""Curation decision reporting: per-doc keep/drop verdicts with sorted
gate reasons; the summary counts each fired gate plus the kept row."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from colnade_spark.operators import report


def test_curation_decisions_hand_checked(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 7)], ["doc_id"])
    gates = {
        "b_gate": spark.createDataFrame([(2,), (3,), (3,)], ["doc_id"]),  # dup ids ok
        "a_gate": spark.createDataFrame([(3,), (4,)], ["doc_id"]),
        "c_gate": spark.createDataFrame([], "doc_id long"),               # empty gate
    }
    out = {r.doc_id: (r.keep, r.n_reasons, r.reasons)
           for r in report.curation_decisions(docs, gates).collect()}
    assert out[1] == (True, 0, [])
    assert out[2] == (False, 1, ["b_gate"])
    assert out[3] == (False, 2, ["a_gate", "b_gate"])   # sorted gate names
    assert out[4] == (False, 1, ["a_gate"])
    assert out[5] == (True, 0, []) and out[6] == (True, 0, [])

    summary = {r.reason: r.n_docs
               for r in report.curation_summary(
                   report.curation_decisions(docs, gates)).collect()}
    assert summary == {"a_gate": 2, "b_gate": 2, "__kept__": 3}

    with pytest.raises(ValueError):
        report.curation_decisions(docs, {})


def test_curation_decisions_gate_extra_columns_ignored(spark):
    docs = spark.createDataFrame([(1,), (2,)], ["doc_id"])
    gate = spark.createDataFrame([(2, "why", 0.9)], ["doc_id", "note", "score"])
    out = {r.doc_id: r.keep
           for r in report.curation_decisions(docs, {"g": gate}).collect()}
    assert out == {1: True, 2: False}


def test_corpus_diff_hand_checked(spark):
    """added/removed/changed partition the churn exactly; unchanged rows
    (including whitespace-normalization-equal text) are never emitted;
    a precomputed fingerprint column takes precedence over text."""
    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma"), (4, "delta  x")],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [(2, "beta"), (3, "GAMMA EDITED"), (4, "delta x"), (5, "new doc")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.status for r in report.corpus_diff(old, new=new).collect()}
    # 4 is unchanged under the normalized fingerprint (whitespace fold)
    assert got == {1: "removed", 3: "changed", 5: "added"}
    # explicit fingerprint column: raw text compare makes 4 a change
    o2 = old.withColumn("fp", old.text)
    n2 = new.withColumn("fp", new.text)
    got2 = {
        r.doc_id: r.status
        for r in report.corpus_diff(o2, new=n2, fingerprint_col="fp").collect()
    }
    assert got2 == {1: "removed", 3: "changed", 4: "changed", 5: "added"}


def test_corpus_diff_null_text_rows(spark):
    """Presence comes from row membership, not fingerprint nullness: a
    NULL-text row in both snapshots is unchanged (NOT 'added'); present
    only in old it is 'removed'; NULL->value and value->NULL are real
    changes."""
    from pyspark.sql import functions as F

    old = spark.createDataFrame(
        [(1, None), (2, None), (3, None), (4, "real")],
        ["doc_id", "text"],
    ).withColumn("text", F.col("text").cast("string"))
    new = spark.createDataFrame(
        [(1, None), (3, "now real"), (4, None)], ["doc_id", "text"]
    ).withColumn("text", F.col("text").cast("string"))
    got = {r.doc_id: r.status for r in report.corpus_diff(old, new=new).collect()}
    assert got == {2: "removed", 3: "changed", 4: "changed"}


def test_corpus_card_rejects_null_sizes(spark):
    """NULL sizes rank engine-dependently (Spark NULLS FIRST, DuckDB
    NULLS LAST) — the op raises instead of silently corrupting the
    quantiles."""
    import pytest
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("en", 10), ("en", None)], ["lang", "n_chars"]
    )
    with pytest.raises(Exception, match="NULL n_chars"):
        report.corpus_card(df).collect()


def test_corpus_card_exact_quantiles(spark):
    """Pinned integer-rank quantiles: q_p = value at rank
    (p*n + 99) div 100 in ascending size order; NULL groups report as
    __null__; invalid quantiles raise."""
    import pytest

    rows = [("en", s) for s in [10, 20, 30, 40, 50, 60, 70, 80, 90, 100]]
    rows += [("fr", s) for s in [5, 7, 9]]
    rows += [(None, 42)]
    df = spark.createDataFrame(rows, ["lang", "n_chars"])
    got = {
        r.lang: r for r in report.corpus_card(df, quantiles=(50, 90)).collect()
    }
    en = got["en"]
    assert (en.n_docs, en.total_size) == (10, 550)
    assert en.q_50 == 50      # rank ceil(5.0) = 5
    assert en.q_90 == 90      # rank ceil(9.0) = 9 — NOT the float 10
    fr = got["fr"]
    assert (fr.q_50, fr.q_90) == (7, 9)  # ranks 2 and 3 of [5,7,9]
    assert got["__null__"].n_docs == 1 and got["__null__"].q_50 == 42
    with pytest.raises(ValueError):
        report.corpus_card(df, quantiles=())
    with pytest.raises(ValueError):
        report.corpus_card(df, quantiles=(0,))


def test_corpus_card_approx_matches_exact_below_accuracy(spark):
    """GK at accuracy >= group size is rank-exact, so the approx card
    reproduces the exact card's shape and (here) values; NULL groups
    report under __null__, NULL sizes raise, invalid quantiles raise —
    the same policy surface as the exact card."""
    rows = [("en", s) for s in [10, 20, 30, 40, 50, 60, 70, 80, 90, 100]]
    rows += [("fr", s) for s in [5, 7, 9]]
    rows += [(None, 42)]
    df = spark.createDataFrame(rows, ["lang", "n_chars"])
    exact = {r.lang: r for r in report.corpus_card(df).collect()}
    approx = {r.lang: r for r in report.corpus_card_approx(df).collect()}
    assert set(exact) == set(approx)
    for k in exact:
        assert (approx[k].n_docs, approx[k].total_size) == (
            exact[k].n_docs,
            exact[k].total_size,
        )
        # element-of-dataset guarantee + rank-exactness at this scale
        assert abs(approx[k].q_50 - exact[k].q_50) <= 0.05 * exact[k].q_50
        assert abs(approx[k].q_90 - exact[k].q_90) <= 0.05 * exact[k].q_90
    with pytest.raises(ValueError):
        report.corpus_card_approx(df, quantiles=())
    with pytest.raises(ValueError):
        report.corpus_card_approx(df, quantiles=(101,))
    bad = spark.createDataFrame([("en", 10), ("en", None)], ["lang", "n_chars"])
    with pytest.raises(Exception, match="NULL n_chars"):
        report.corpus_card_approx(bad).collect()


def test_changed_rows_gate_hand_checked(spark):
    """Full new-side rows survive with status; unchanged rows drop;
    NULL fingerprints follow the null-safe change rule."""
    old = spark.createDataFrame(
        [(1, "same"), (2, "was this"), (4, None)], "doc_id: long, text: string"
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "now this"), (3, "brand new"), (4, None)],
        "doc_id: long, text: string",
    )
    got = {
        r.doc_id: (r.status, r.text)
        for r in report.changed_rows_gate(new, old=old).collect()
    }
    assert got == {2: ("changed", "now this"), 3: ("added", "brand new")}
    # composes with corpus_diff's add/change half exactly
    diff = {
        r.doc_id: r.status
        for r in report.corpus_diff(old, new=new).collect()
        if r.status != "removed"
    }
    assert diff == {k: v for k, (v, _) in got.items()}


def test_changed_rows_gate_rejects_status_collision(spark):
    """A payload column named like status_col would be clobbered AND
    duplicated in the output — rejected instead."""
    import pytest

    old = spark.createDataFrame([(1, "a", "ok")], ["doc_id", "text", "status"])
    new = spark.createDataFrame([(1, "b", "ok")], ["doc_id", "text", "status"])
    with pytest.raises(ValueError, match="already exists"):
        report.changed_rows_gate(new, old=old)
    # a different status_col works and preserves the payload column
    out = report.changed_rows_gate(new, old=old, status_col="churn").collect()
    assert out[0].status == "ok" and out[0].churn == "changed"


def test_corpus_diff_raises_on_duplicate_ids(spark):
    """Snapshots must be keyed: a duplicate id would fan out through
    the full-outer join (old fps {A} vs new {A, B} emits both nothing
    and a 'changed' row). Both sides raise instead of fanning out."""
    from pyspark.errors import SparkRuntimeException

    clean = spark.createDataFrame([(1, "a"), (2, "b")], ["doc_id", "text"])
    duped = spark.createDataFrame(
        [(1, "a"), (1, "a2"), (2, "b")], ["doc_id", "text"]
    )
    with pytest.raises(SparkRuntimeException, match="duplicate doc_id.*new"):
        report.corpus_diff(clean, new=duped).collect()
    with pytest.raises(SparkRuntimeException, match="duplicate doc_id.*old"):
        report.corpus_diff(duped, new=clean).collect()
    # identical duplicate rows are STILL duplicate ids — same error
    same = spark.createDataFrame([(1, "a"), (1, "a")], ["doc_id", "text"])
    with pytest.raises(SparkRuntimeException, match="duplicate doc_id"):
        report.corpus_diff(clean, new=same).collect()
    # clean snapshots are unaffected
    assert report.corpus_diff(clean, new=clean).count() == 0


def test_changed_rows_gate_raises_on_duplicate_old_ids(spark):
    """A new row matching two old rows would duplicate its payload
    through the left join — the old side raises on duplicate ids.
    Duplicate ids in NEW are legal (each incoming row gates alone)."""
    from pyspark.errors import SparkRuntimeException

    old = spark.createDataFrame(
        [(1, "a"), (1, "other"), (2, "b")], ["doc_id", "text"]
    )
    new = spark.createDataFrame([(1, "a"), (3, "c")], ["doc_id", "text"])
    with pytest.raises(SparkRuntimeException, match="duplicate doc_id.*old"):
        report.changed_rows_gate(new, old=old).collect()
    dup_new = spark.createDataFrame(
        [(1, "x"), (1, "x")], ["doc_id", "text"]
    )
    clean_old = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    out = report.changed_rows_gate(dup_new, old=clean_old).collect()
    assert [r.status for r in out] == ["changed", "changed"]


def test_changed_rows_gate_rejects_staging_name_collision(spark):
    """A payload column named like an internal staging column would be
    silently clobbered and re-selected into the output — rejected."""
    old = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    bad = spark.createDataFrame(
        [(1, "b", "x")], ["doc_id", "text", "_crg_new_fp"]
    )
    with pytest.raises(ValueError, match="staging names"):
        report.changed_rows_gate(bad, old=old)


def test_snapshot_args_are_keyword_only():
    """corpus_diff(old, new=...) / changed_rows_gate(new, old=...):
    both operators accept any two same-shaped frames, so a positional
    second snapshot could be transposed silently — it's a TypeError."""
    import inspect

    for fn, kw in ((report.corpus_diff, "new"), (report.changed_rows_gate, "old")):
        p = inspect.signature(fn).parameters[kw]
        assert p.kind is inspect.Parameter.KEYWORD_ONLY


# ---------------------------------------------------------------------------
# source_overlap_matrix / length_drift_psi (corpus diagnostics)
# ---------------------------------------------------------------------------


def test_source_overlap_matrix_hand_checked(spark):
    rows = [
        # srcA: 3 distinct fps {hello world, foo bar, solo a}
        (1, "Hello, World!", "srcA"),
        (2, "foo bar", "srcA"),
        (3, "solo a", "srcA"),
        # srcB shares "hello world" (normalization) and "foo bar"
        (4, "hello   world", "srcB"),
        (5, "FOO BAR!!!", "srcB"),
        # srcC shares only "foo bar"; has one unique fp
        (6, "foo bar", "srcC"),
        (7, "only in c", "srcC"),
        # NULLs are neither a source nor a fingerprint
        (8, None, "srcA"),
        (9, "orphan text", None),
        # duplicate (fp, source) collapses before counting
        (10, "hello world", "srcA"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {
        (r.source_a, r.source_b): (r.n_fps_a, r.n_fps_b, r.n_shared, r.jaccard)
        for r in report.source_overlap_matrix(df).collect()
    }
    assert out[("srcA", "srcB")] == (3, 2, 2, 2 / 3.0)
    assert out[("srcA", "srcC")] == (3, 2, 1, 1 / 4.0)
    assert out[("srcB", "srcC")] == (2, 2, 1, 1 / 3.0)
    assert len(out) == 3  # only sharing pairs, each once, a < b


def test_source_overlap_matrix_disjoint_sources_empty(spark):
    df = spark.createDataFrame(
        [(1, "aaa", "x"), (2, "bbb", "y")], ["doc_id", "text", "source"]
    )
    assert report.source_overlap_matrix(df).count() == 0


def _psi_model(old_vals, new_vals, edges):
    """Pure-python twin of length_drift_psi (global, no groups)."""
    import math

    n_bins = len(edges) + 2

    def b(x):
        if x is None:
            return n_bins - 1
        return sum(1 for e in edges if x >= e)

    co, cn = {}, {}
    for x in old_vals:
        co[b(x)] = co.get(b(x), 0) + 1
    for x in new_vals:
        cn[b(x)] = cn.get(b(x), 0) + 1
    to, tn = len(old_vals), len(new_vals)
    out = {}
    for k in sorted(set(co) | set(cn)):
        no, nn = co.get(k, 0), cn.get(k, 0)
        po = (no + 1) / float(to + n_bins)
        pn = (nn + 1) / float(tn + n_bins)
        t = (pn - po) * math.log(pn / po)
        out[k] = (no, nn, po, pn, round(t, 6))
    return out


def test_length_drift_psi_matches_python_model(spark):
    old_vals = [50, 120, 130, 250, 900, None, 80]
    new_vals = [500, 510, 520, 10, None, None]
    edges = (100, 200, 400, 800)
    old = spark.createDataFrame([(v,) for v in old_vals], "n_chars int")
    new = spark.createDataFrame([(v,) for v in new_vals], "n_chars int")
    got = {
        r.bin: (r.n_old, r.n_new, r.p_old, r.p_new, r.psi_term)
        for r in report.length_drift_psi(old, new=new, edges=edges).collect()
    }
    assert got == _psi_model(old_vals, new_vals, edges)
    # identical snapshots -> every term is exactly 0
    same = report.length_drift_psi(old, new=old, edges=edges)
    assert {r.psi_term for r in same.collect()} == {0.0}


def test_length_drift_psi_grouped_and_validated(spark):
    old = spark.createDataFrame(
        [(1, "en", 50), (2, "en", 150), (3, "fr", 50)],
        ["doc_id", "lang", "n_chars"],
    )
    new = spark.createDataFrame(
        [(4, "en", 450), (5, "de", 50)], ["doc_id", "lang", "n_chars"]
    )
    out = report.length_drift_psi(
        old, new=new, edges=(100, 400), group_col="lang"
    )
    rows = out.collect()
    # groups union: en (both), fr (old only), de (new only)
    assert {r.lang for r in rows} == {"en", "fr", "de"}
    # fr appears with n_new=0 (drift to absence is drift)
    fr = [r for r in rows if r.lang == "fr"][0]
    assert fr.n_old == 1 and fr.n_new == 0

    with pytest.raises(ValueError):
        report.length_drift_psi(old, new=new, edges=())
    with pytest.raises(ValueError):
        report.length_drift_psi(old, new=new, edges=(5, 5, 10))
    with pytest.raises(TypeError):
        report.length_drift_psi(old, new)  # keyword-only snapshots


def test_length_drift_psi_null_group_is_one_stratum(spark):
    """A NULL group value must behave as ONE stratum on both sides —
    a null-unsafe join would split it into two half-rows with zeroed
    opposite counts and wrong totals."""
    old = spark.createDataFrame(
        [(1, None, 50), (2, None, 150), (3, "en", 50)],
        ["doc_id", "lang", "n_chars"],
    )
    new = spark.createDataFrame(
        [(4, None, 50), (5, "en", 150)], ["doc_id", "lang", "n_chars"]
    )
    out = report.length_drift_psi(
        old, new=new, edges=(100,), group_col="lang"
    ).collect()
    null_rows = [r for r in out if r.lang is None]
    # one row per observed bin, both sides' counts present on the SAME row
    assert {(r.bin, r.n_old, r.n_new) for r in null_rows} == {
        (0, 1, 1),  # <100: one old, one new
        (1, 1, 0),  # >=100: one old, zero new
    }


def test_curation_funnel_sequential_attribution(spark):
    """Docs are attributed to the FIRST gate that fires (pipeline
    order), later gates never see them; the running survivor counts
    chain exactly."""
    docs = spark.createDataFrame([(i,) for i in range(1, 11)], ["doc_id"])
    stages = {
        "gate_a": spark.createDataFrame([(1,), (2,), (2,)], ["doc_id"]),
        "gate_b": spark.createDataFrame([(2,), (3,), (4,)], ["doc_id"]),  # 2 already gone
        "gate_c": spark.createDataFrame([], "doc_id long"),               # drops nothing
        "gate_d": spark.createDataFrame([(4,), (9,)], ["doc_id"]),        # 4 already gone
    }
    rows = {
        r.stage: (r.stage_idx, r.n_in, r.n_dropped, r.n_out, r.drop_frac)
        for r in report.curation_funnel(docs, stages).collect()
    }
    assert rows["gate_a"] == (0, 10, 2, 8, 0.2)
    assert rows["gate_b"] == (1, 8, 2, 6, 0.25)
    assert rows["gate_c"] == (2, 6, 0, 6, 0.0)
    assert rows["gate_d"] == (3, 6, 1, 5, 1 / 6.0)
    assert len(rows) == 4

    import pytest

    with pytest.raises(ValueError):
        report.curation_funnel(docs, {})


def test_curation_funnel_renamed_gate_keeps_pipeline_order(spark):
    """Renamed-gate pin (VERDICT r6): funnel attribution follows the
    stages dict's PIPELINE order even when the gate names sort the
    other way round — while curation_decisions keeps its sorted-name
    reasons contract on the same gates. A doc failing both gates is
    attributed to the pipeline-FIRST gate ('z_url'), not the
    alphabetically first ('a_short')."""
    docs = spark.createDataFrame([(i,) for i in range(1, 7)], ["doc_id"])
    both = spark.createDataFrame([(1,), (2,)], ["doc_id"])
    stages = {
        "z_url": both,  # pipeline-first, sorts LAST
        "a_short": spark.createDataFrame([(1,), (2,), (3,)], ["doc_id"]),
    }
    rows = {
        r.stage: (r.stage_idx, r.n_in, r.n_dropped, r.n_out)
        for r in report.curation_funnel(docs, stages).collect()
    }
    # docs 1,2 fall at z_url (pipeline first); only 3 is left for a_short
    assert rows["z_url"] == (0, 6, 2, 4)
    assert rows["a_short"] == (1, 4, 1, 3)

    # decisions on the SAME gates: reasons stay sorted-name order
    dec = {
        r.doc_id: list(r.reasons)
        for r in report.curation_decisions(docs, stages).collect()
    }
    assert dec[1] == ["a_short", "z_url"]
    assert dec[3] == ["a_short"]
    assert dec[4] == []


def test_curation_funnel_empty_corpus(spark):
    docs = spark.createDataFrame([], "doc_id long")
    stages = {"g": spark.createDataFrame([(1,)], ["doc_id"])}
    rows = report.curation_funnel(docs, stages).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_in, r.n_dropped, r.n_out) == (0, 0, 0)
    assert r.drop_frac is None  # nothing entered: fraction undefined


def test_source_overlap_matrix_custom_key_near_dup(spark):
    """key_col generalizes the matrix beyond exact fingerprints: with a
    MinHash band key, near-duplicates (different exact fingerprints)
    still count as shared buckets."""
    from colnade_spark.operators.dedup import minhash_signatures
    from pyspark.sql import functions as F

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base, "srcA"),
        (2, base + " extra", "srcB"),          # near-dup of 1, not exact
        (3, "completely different text with nothing shared here", "srcB"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    # exact fingerprints: no overlap at all
    assert report.source_overlap_matrix(df).count() == 0

    sigs = minhash_signatures(df, num_hashes=32)
    banded = sigs.select(
        "doc_id",
        F.col("source"),
        F.posexplode(
            F.transform(
                F.array(*[F.slice("_sig", 1 + 8 * b, 8) for b in range(4)]),
                lambda band: F.md5(F.concat_ws(",", band)),
            )
        ).alias("_band", "bkey"),
    ).withColumn("bkey", F.concat_ws(":", F.col("_band"), F.col("bkey")))
    out = report.source_overlap_matrix(
        banded, group_col="source", key_col="bkey"
    )
    got = {(r.source_a, r.source_b): r.n_shared for r in out.collect()}
    # the near-dup pair shares at least one band bucket across sources
    assert got.get(("srcA", "srcB"), 0) >= 1


def test_gate_names_with_dots_are_legal(spark):
    """Stage/gate names are labels, not column names: dotted names must
    not break the internal flag columns (index-based staging)."""
    docs = spark.createDataFrame([(i,) for i in range(1, 5)], ["doc_id"])
    gates = {
        "pii.email": spark.createDataFrame([(1,)], ["doc_id"]),
        "dedup`weird": spark.createDataFrame([(2,)], ["doc_id"]),
    }
    dec = {r.doc_id: r.reasons
           for r in report.curation_decisions(docs, gates).collect()}
    assert dec[1] == ["pii.email"] and dec[2] == ["dedup`weird"]
    fun = {r.stage: r.n_dropped
           for r in report.curation_funnel(docs, gates).collect()}
    assert fun == {"pii.email": 1, "dedup`weird": 1}


def test_length_drift_psi_float_edges(spark):
    """Float edges bin float metrics (blend scores) correctly — they are
    not silently truncated to integers."""
    old = spark.createDataFrame([(0.1,), (0.4,), (0.9,)], "score double")
    new = spark.createDataFrame([(0.6,), (0.7,)], "score double")
    out = report.length_drift_psi(
        old, new=new, value_col="score", edges=(0.25, 0.5, 0.75)
    )
    got = {r.bin: (r.n_old, r.n_new) for r in out.collect()}
    # old: 0.1->bin0, 0.4->bin1, 0.9->bin3; new: 0.6,0.7->bin2
    assert got == {0: (1, 0), 1: (1, 0), 2: (0, 2), 3: (1, 0)}

    import pytest

    with pytest.raises(ValueError):
        report.length_drift_psi(old, new=new, edges=("a", "b"))


def test_psi_against_baseline_matches_two_frame_report(spark):
    """The frozen-baseline scorer is bit-identical to length_drift_psi
    on the same snapshots (exact integer counts both ways — nothing
    approximate in the baseline), grouped and global, including a NULL
    group stratum."""
    from pyspark.sql import functions as F

    from colnade_spark.operators.report import (
        fit_psi_baseline,
        length_drift_psi,
        psi_against_baseline,
    )

    rows = [(i, ["a", "b", None][i % 3], float(i * 7 % 50)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, g string, v double")
    old = df.filter(F.col("doc_id") % 2 == 0)
    new = df.filter(F.col("doc_id") % 2 == 1)
    for gcol in ("g", None):
        base = fit_psi_baseline(old, "v", (10.0, 25.0, 40.0), gcol)
        got = {
            tuple(r)
            for r in psi_against_baseline(
                new, base, "v", (10.0, 25.0, 40.0), gcol
            ).collect()
        }
        want = {
            tuple(r)
            for r in length_drift_psi(
                old, new=new, value_col="v", edges=(10.0, 25.0, 40.0),
                group_col=gcol,
            ).collect()
        }
        assert got == want and len(got) > 0

    # parameter drift refuses: edges, value_col, group_col each pinned
    base = fit_psi_baseline(old, "v", (10.0, 25.0), "g")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="baseline was fit with"):
        psi_against_baseline(new, base, "v", (10.0, 30.0), "g")
    with _pytest.raises(ValueError, match="baseline was fit with"):
        psi_against_baseline(new, base, "doc_id", (10.0, 25.0), "g")
    with _pytest.raises(ValueError, match="baseline was fit with"):
        psi_against_baseline(new, base, "v", (10.0, 25.0), None)


def test_histogram_card_empty_quantiles_guard(spark):
    """The empty-quantiles guard fires before per-quantile validation
    (the check order matches the guard's intent)."""
    hist = spark.createDataFrame(
        [("en", 0, 3, 30)], ["lang", "bin", "n", "sum_size"]
    )
    with pytest.raises(ValueError, match="at least one quantile"):
        report.histogram_card(hist, (10, 100), quantiles=())
    with pytest.raises(ValueError, match="must be an int percent"):
        report.histogram_card(hist, (10, 100), quantiles=(0,))


def test_fit_size_edges_minimal_integer_ratio(spark):
    """The auto-fit is integer-exact: lo = max(1, sample min), hi =
    sample max, ratio = the SMALLEST integer r >= 2 with
    lo * r^(n_edges-1) >= hi, edges = lo * r^k — hand-checked, stable
    under repartitioning (content-addressed sample), guarded on
    degenerate and all-NULL inputs, and composable with
    corpus_card_binned (int-edges contract)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate([10, 50, 3000, 200, 80])],
        ["doc_id", "n_chars"],
    )
    edges = report.fit_size_edges(df, n_edges=6, sample_n=2048)
    # r=2: 10*32=320 < 3000; r=3: 2430 < 3000; r=4: 10*1024 >= 3000
    assert edges == (10, 40, 160, 640, 2560, 10240)
    assert report.fit_size_edges(df.repartition(7), n_edges=6) == edges
    card = report.corpus_card_binned(
        df.withColumn("lang", F.lit("en")), edges=edges
    )
    assert card.count() == 1

    with pytest.raises(ValueError, match="degenerate"):
        report.fit_size_edges(
            spark.createDataFrame([(1, 7), (2, 7)], ["doc_id", "n_chars"])
        )
    with pytest.raises(ValueError, match="no non-NULL"):
        report.fit_size_edges(
            spark.createDataFrame([(1, None)], "doc_id long, n_chars long")
        )
    # NULL ids are excluded BEFORE the top-k (ADVICE r9): md5(NULL) is
    # NULL and sorts FIRST under Spark's ASC default, so an unfiltered
    # NULL-id row would fill the bounded sample ahead of every real row
    # (here: its 10**9 size would trip the ratio cap)
    withnull = spark.createDataFrame(
        [(1, 10), (2, 3000), (None, 10**9)],
        "doc_id long, n_chars long",
    )
    assert report.fit_size_edges(withnull, n_edges=6, sample_n=2) == (
        10, 40, 160, 640, 2560, 10240,
    )
    with pytest.raises(ValueError, match="n_edges"):
        report.fit_size_edges(df, n_edges=1)
    with pytest.raises(ValueError, match="sample_n"):
        report.fit_size_edges(df, sample_n=1)
    # ratio cap: a spread needing r > 63 raises (keeps the SQL-replay
    # contract's bounded integer ratio scan airtight)
    wide = spark.createDataFrame(
        [(1, 1), (2, 10**9)], ["doc_id", "n_chars"]
    )
    with pytest.raises(ValueError, match="ratio > 63"):
        report.fit_size_edges(wide, n_edges=2)


def test_source_overlap_near_sees_what_exact_matrix_cannot(spark):
    """Band-key overlap pairs sources holding NEAR copies: trailing/
    leading-phrase variants share most k=13 shingles, so their band
    keys collide, while the exact fingerprint matrix reports NOTHING
    (different normalized strings). Unrelated sources stay disjoint.
    Key accounting: each source holds at most bands keys per distinct
    content cluster."""
    from pyspark.sql import functions as F

    texts = [
        "the quick brown fox jumps over the lazy dog near the river bank today",
        "pack my box with five dozen liquor jugs before the morning train leaves",
        "a completely different document about spark partitions and shuffle costs",
    ]
    rows = [(i, t, "full") for i, t in enumerate(texts)]
    rows += [
        (100 + i, t + " near duplicate tail", "near")
        for i, t in enumerate(texts)
    ]
    rows += [
        (200, "entirely unrelated content discussing medieval castle masonry works", "other"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "src"])

    exact = report.source_overlap_matrix(df, group_col="src").collect()
    assert exact == []  # no pair of sources shares an exact fingerprint

    near = {
        (r.source_a, r.source_b): r
        for r in report.source_overlap_near(
            df, group_col="src", num_hashes=64, bands=16, shingle_k=13
        ).collect()
    }
    assert ("full", "near") in near
    r = near[("full", "near")]
    assert r.n_shared > 0
    assert 0.0 < r.jaccard <= 1.0
    # at most bands keys per doc, 3 docs per source
    assert r.n_fps_a <= 3 * 16 and r.n_fps_b <= 3 * 16
    # the unrelated source never pairs with anything
    assert all("other" not in k for k in near)

    with pytest.raises(ValueError, match="multiple of bands"):
        report.overlap_band_keys(df, group_col="src", num_hashes=10, bands=16)
    # zero/negative num_hashes are multiples of bands arithmetically but
    # must still raise — rows_per=0 would give every source the same
    # empty-slice band keys (jaccard ~1.0 between unrelated sources)
    with pytest.raises(ValueError, match="multiple of bands"):
        report.overlap_band_keys(df, group_col="src", num_hashes=0, bands=16)
    with pytest.raises(ValueError, match="multiple of bands"):
        report.overlap_band_keys(df, group_col="src", num_hashes=-16, bands=16)


def test_curation_funnel_consistent_with_nondeterministic_gate(spark):
    """The funnel's count table materializes ONCE (localCheckpoint) —
    the total-aggregate and the per-stage rows must come from the SAME
    evaluation. A nondeterministic gate makes any double evaluation
    visible: if the gates re-ran per consumer, the running-survivor
    arithmetic (derived from the total) and the drop counts (from the
    spine join) would disagree across rows. Internal-consistency
    invariants must hold exactly regardless of what the gate sampled."""
    docs = spark.createDataFrame([(i,) for i in range(1, 201)], ["doc_id"])
    flaky = docs.filter(F.rand() < 0.5).select("doc_id")
    fixed = spark.createDataFrame([(1,), (2,), (3,)], ["doc_id"])
    rows = sorted(
        report.curation_funnel(docs, {"flaky": flaky, "fixed": fixed}).collect(),
        key=lambda r: r.stage_idx,
    )
    # chain: every stage's n_out is the next stage's n_in
    assert rows[0].n_in == 200
    assert rows[0].n_out == rows[0].n_in - rows[0].n_dropped
    assert rows[1].n_in == rows[0].n_out
    assert rows[1].n_out == rows[1].n_in - rows[1].n_dropped
    # total docs are conserved: drops + final survivors == corpus
    assert rows[0].n_dropped + rows[1].n_dropped + rows[1].n_out == 200
