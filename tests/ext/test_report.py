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
