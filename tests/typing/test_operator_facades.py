"""Typed operator-facade type tests (mypy --strict / ty).

Must produce zero type errors. The pipeline facades are generic in the
schema for schema-preserving ops and pin concrete output schemas for
schema-changing ops — verified here by assignability and attribute
access on the returned frames' typed rows.
"""

from __future__ import annotations

from colnade_spark import Column, DataFrame, Float32, Int64, Schema, Utf8
from colnade_spark.dtypes import List as ListD
from colnade_spark.operators import typed
from colnade_spark.operators.typed import Chunks, PackedChunks


class Corpus(Schema):
    doc_id: Column[Int64]
    text: Column[Utf8]
    lang: Column[Utf8]


class Emb(Schema):
    vec_id: Column[Int64]
    embedding: Column[ListD[Float32]]


def check_schema_preserving(frame: DataFrame[Corpus]) -> DataFrame[Corpus]:
    # every schema-preserving facade returns the SAME frame type
    kept: DataFrame[Corpus] = typed.gopher_filter(frame, min_words=10)
    sampled: DataFrame[Corpus] = typed.hash_sample(kept, 0.5, salt="s")
    strat: DataFrame[Corpus] = typed.stratified_sample(sampled, "lang", k=5)
    d1: DataFrame[Corpus] = typed.dedup_exact(strat)
    d2: DataFrame[Corpus] = typed.dedup_minhash(d1, threshold=0.8)
    # typed column refs still valid on the result
    return d2.filter(Corpus.doc_id > 0)


def check_chunk_pack_types(frame: DataFrame[Corpus]) -> DataFrame[PackedChunks]:
    chunks: DataFrame[Chunks] = typed.chunk_by_tokens(frame, chunk_size=64)
    # typed column access on the pinned output schema
    small = chunks.filter(Chunks.chunk_tokens > 0).sort(
        Chunks.doc_id, Chunks.chunk_id
    )
    packed: DataFrame[PackedChunks] = typed.pack_chunks(small, budget=256)
    return packed.filter(PackedChunks.pack_id >= 0)


def check_typed_rows(chunks: DataFrame[Chunks]) -> list[str]:
    # rows() yields typed dataclasses: attribute types flow
    out: list[str] = []
    for r in chunks.rows():
        t: str = r.chunk_text
        n: int = r.chunk_tokens
        out.append(t if n > 0 else "")
    return out


def check_round3_facades(frame: DataFrame[Corpus]) -> DataFrame[Corpus]:
    # schema-preserving: SemDeDup and DSIR resampling keep the frame type
    target: DataFrame[Corpus] = frame.filter(Corpus.lang == "en")
    picked: DataFrame[Corpus] = typed.dsir_sample(frame, target, k=10)
    deduped: DataFrame[Corpus] = typed.semantic_dedup(
        picked, [[1.0, 0.0], [0.0, 1.0]], threshold=0.9
    )
    return deduped.filter(Corpus.doc_id > 0)


def check_round3_tables(frame: DataFrame[Corpus]) -> list[float]:
    # table-shaped outputs carry pinned schemas with typed rows
    w: DataFrame[typed.DsirWeights] = typed.dsir_weights(
        frame, frame.filter(Corpus.lang == "en")
    )
    out: list[float] = []
    for r in w.rows():
        x: float = r.weight
        n: int = r.n_feats
        out.append(x if n > 0 else 0.0)
    pairs: DataFrame[typed.SemDupPairs] = typed.semantic_dup_pairs(
        frame, [[1.0, 0.0]], threshold=0.5
    )
    _ = pairs.filter(typed.SemDupPairs.cos_sim >= 0.5)
    # round 10: production near-dup facade pins NearDupPairs
    nd: DataFrame[typed.NearDupPairs] = typed.embedding_near_dups(
        frame, dim=2
    )
    _ = nd.filter(typed.NearDupPairs.cos_sim >= 0.95)
    _ = (typed.NearDupPairs.id_a, typed.NearDupPairs.id_b)
    return out


def check_round4_facades(frame: DataFrame[Corpus]) -> list[float]:
    # pq_screen_gate is schema-preserving; recall_at_k pins RecallRows
    screened: DataFrame[Corpus] = typed.pq_screen_gate(
        frame, [[1.0, 0.0]], [[[0.0, 0.0], [1.0, 1.0]]], threshold=0.9
    )
    _ = screened.filter(Corpus.doc_id > 0)
    audit: DataFrame[typed.RecallRows] = typed.recall_at_k(frame, frame)
    out: list[float] = []
    for r in audit.rows():
        x: float = r.recall
        n: int = r.n_exact
        out.append(x if n > 0 else 0.0)
    return out


def check_round5_facades(frame: DataFrame[Corpus]) -> list[float]:
    # pq_contamination_report pins PqContaminationRows (Int64 query_id)
    rep: DataFrame[typed.PqContaminationRows] = typed.pq_contamination_report(
        frame, [[1.0, 0.0]], [[[0.0, 0.0], [1.0, 1.0]]], threshold=0.9
    )
    _ = rep.filter(typed.PqContaminationRows.frac_hits > 0.0)
    out: list[float] = []
    for r in rep.rows():
        x: float = r.max_adc
        n: int = r.n_hits
        out.append(x if n > 0 else 0.0)
    return out


def check_round5_report_facades(frame: DataFrame[Corpus]) -> list[int]:
    diff: DataFrame[typed.CorpusDiffRows] = typed.corpus_diff(frame, new=frame)
    _ = diff.filter(typed.CorpusDiffRows.status == "changed")
    card: DataFrame[typed.CorpusCardRows] = typed.corpus_card(frame)
    pii: DataFrame[typed.PiiCountRows] = typed.pii_counts(frame)
    mid: DataFrame[Corpus] = typed.perplexity_bucket_select(
        frame, "score", keep="middle"
    )
    _ = mid.filter(Corpus.doc_id > 0)
    out: list[int] = []
    for r in card.rows():
        n: int = r.n_docs
        out.append(n)
    for p in pii.rows():
        m: int = p.n_emails
        out.append(m)
    return out


def check_round6_facades(frame: DataFrame[Corpus]) -> list[float]:
    audit: DataFrame[typed.MinhashAuditRows] = typed.minhash_estimate_audit(
        frame, threshold=0.8
    )
    _ = audit.filter(typed.MinhashAuditRows.agree_at_threshold == True)  # noqa: E712
    out: list[float] = []
    for r in audit.rows():
        e: float = r.abs_err
        ok: bool = r.agree_at_threshold
        out.append(e if ok else -e)
    return out


def check_round6_audit_facades(frame: DataFrame[Corpus]) -> list[float]:
    pairs: DataFrame[typed.JaccardPairs] = typed.charshingle_jaccard_pairs(
        frame, threshold=0.8
    )
    _ = pairs.filter(typed.JaccardPairs.jaccard >= 0.9)
    audit: DataFrame[typed.PrtAuditRow] = typed.minhash_prt_audit(frame)
    out: list[float] = []
    for r in audit.rows():
        rc: float = r.candidate_recall
        n: int = r.n_true_pairs
        out.append(rc if n > 0 else 0.0)
    return out


def check_round6_weight_facades(frame: DataFrame[Corpus]) -> list[float]:
    cw: DataFrame[typed.SoftDedupWeights] = typed.commonness_weights(frame, n=3)
    _ = cw.filter(typed.SoftDedupWeights.weight < 1.0)
    dw: DataFrame[typed.DupWeights] = typed.duplication_weights(frame)
    _ = dw.filter(typed.DupWeights.cluster_size > 1)
    fert: DataFrame[typed.FertilityRows] = typed.fertility_stats(frame)
    out: list[float] = []
    for r in cw.rows():
        w: float = r.weight
        out.append(w)
    for f in fert.rows():
        n: int = f.n_docs
        out.append(float(n))
    return out


def check_round6_prototype_facades(
    frame: DataFrame[Emb], centroids: list[list[float]]
) -> list[float]:
    scores: DataFrame[typed.PrototypeScores] = typed.prototypicality(
        frame, centroids
    )
    _ = scores.filter(typed.PrototypeScores.proto_dist > 0.0)
    kept: DataFrame[Emb] = typed.prototype_prune_select(
        frame, centroids, 0.5, mode="keep_hard"
    )
    _ = kept.filter(Emb.vec_id > 0)
    out: list[float] = []
    for r in scores.rows():
        d: float = r.proto_dist
        out.append(d)
    return out


def check_round6_diagnostics_facades(frame: DataFrame[Corpus]) -> list[float]:
    mat: DataFrame[typed.SourceOverlapRows] = typed.source_overlap_matrix(
        frame, group_col="lang"
    )
    _ = mat.filter(typed.SourceOverlapRows.jaccard > 0.5)
    psi: DataFrame[typed.DriftPsiRows] = typed.length_drift_psi(
        frame, new=frame, value_col="doc_id", edges=(10, 20)
    )
    _ = psi.filter(typed.DriftPsiRows.psi_term > 0.0)
    out: list[float] = []
    for r in mat.rows():
        out.append(r.jaccard)
    for p in psi.rows():
        out.append(p.psi_term)
    return out


def check_round6_split_code_facades(frame: DataFrame[Corpus]) -> list[int]:
    val: DataFrame[Corpus] = typed.stratified_split_select(
        frame, {"train": 0.9, "val": 0.1}, "lang", keep="val"
    )
    _ = val.filter(Corpus.doc_id > 0)
    cq: DataFrame[typed.CodeQualityRows] = typed.code_quality_signals(frame)
    _ = cq.filter(typed.CodeQualityRows.keep == True)  # noqa: E712
    out: list[int] = []
    for r in cq.rows():
        n: int = r.n_lines
        out.append(n)
    return out


def check_round6_blend_facade(frame: DataFrame[Corpus]) -> list[float]:
    blend: DataFrame[typed.BlendedQualityRows] = typed.blend_quality_scores(
        frame, {"doc_id": 1.0}, domain_col="lang"
    )
    _ = blend.filter(typed.BlendedQualityRows.blended_score > 0.5)
    out: list[float] = []
    for r in blend.rows():
        s: float = r.blended_score
        out.append(s)
    return out


def check_round6_surgical_facade(
    frame: DataFrame[Corpus], bench: DataFrame[Corpus]
) -> DataFrame[Corpus]:
    clean: DataFrame[Corpus] = typed.remove_contaminated_spans(
        frame, bench, n=13
    )
    return clean.filter(Corpus.doc_id > 0)


def check_round6_funnel_facade(
    frame: DataFrame[Corpus], gate: DataFrame[Corpus]
) -> list[int]:
    funnel: DataFrame[typed.FunnelRows] = typed.curation_funnel(
        frame, {"gate": gate}
    )
    _ = funnel.filter(typed.FunnelRows.drop_frac > 0.5)
    out: list[int] = []
    for r in funnel.rows():
        n: int = r.n_dropped
        out.append(n)
    return out


def check_round7_frozen_facades(
    frame: DataFrame[Corpus], counts: list[int], quantiles: list[dict]
) -> list[float]:
    frozen: DataFrame[typed.SoftDedupWeights] = typed.commonness_score_frozen(
        frame, counts, n=3
    )
    _ = frozen.filter(typed.SoftDedupWeights.weight < 0.5)
    blend: DataFrame[typed.BlendedQualityRows] = typed.blend_quality_frozen(
        frame, {"doc_id": 1.0}, quantiles, domain_col="lang"
    )
    _ = blend.filter(typed.BlendedQualityRows.blended_score > 0.5)
    out: list[float] = []
    for r in frozen.rows():
        w: float = r.weight
        out.append(w)
    for b in blend.rows():
        out.append(b.blended_score)
    return out


def check_round7_attribution_facade(
    frame: DataFrame[Corpus], gate: DataFrame[Corpus]
) -> list[int]:
    attr: DataFrame[typed.AttributionRows] = typed.curation_attribution(
        frame, {"gate": gate}
    )
    _ = attr.filter(typed.AttributionRows.stage_idx == 0)
    out: list[int] = []
    for r in attr.rows():
        i: int = r.stage_idx
        out.append(i)
    return out


def check_round7_maintained_readers(spark: object) -> list[float]:
    fert: DataFrame[typed.FertilityRows] = typed.merge_fertility_table(
        spark, "/tmp/fert"
    )
    _ = fert.filter(typed.FertilityRows.fertility > 1.0)
    funnel: DataFrame[typed.FunnelRows] = typed.merge_funnel_counts(
        spark, "/tmp/funnel"
    )
    _ = funnel.filter(typed.FunnelRows.n_dropped > 0)
    out: list[float] = []
    for r in fert.rows():
        f: float = r.bytes_per_token
        out.append(f)
    return out
