"""Large-scale data-pipeline operators (extensions beyond reference parity):

- ``dedup``: exact / fingerprint / MinHash-LSH / SimHash / n-gram Jaccard /
  bounded edit-distance (length-band blocked; LSH verifier mode)
- ``similarity``: brute-force + LSH + IVF cosine top-k, embedding near-dups
- ``text``: tokenization, quality scoring, language ID, fingerprints
- ``quality``: repetition stats, top-token stats, Gopher rule filters,
  unigram log-likelihood scoring (perplexity proxy)
- ``chunking`` / ``packing``: token-window chunks → shard-local budget bins
- ``sampling``: deterministic hash sampling, splits, stratified and
  weighted sampling, domain-mixture resampling
- ``redact``: PII redaction, URL/domain extraction
- ``embeddings``: L2 normalize, fixed-centroid cluster assignment
- ``decontaminate``: benchmark decontamination (shared-n-gram rule +
  semantic cosine screening vs broadcast eval embeddings)
- ``tfidf``: smoothed TF-IDF weights, top-k terms per document
- ``funnel``: ordered-funnel analysis over event streams
- ``graph``: connected components (duplicate-cluster resolution)
- ``canonical``: per-cluster canonical selection (keep the highest-
  quality member of each duplicate family, map the rest to it)
- ``sessions``: gap-based sessionization (batch + streaming state)
- ``asof``: as-of joins
- ``intervals``: bin-blocked point-in-interval (range) joins
- ``skew``: salted joins
- ``spans``: exact sub-document dedup — duplicated token spans (Lee et
  al. 2022) and corpus-wide boilerplate line removal
- ``classifier``: hashed-feature linear quality scoring (fastText-style)
- ``cooccur``: adjacent-bigram counts + PMI collocation statistics
- ``cms``: mergeable count-min sketch frequency tables
- ``multimodal``: binary media columns + Arrow-batched decode plumbing
- ``sketches``: mergeable HLL sketch tables (batch build + streaming
  foreachBatch maintenance, lossless union rollups)
- ``clustering``: reproducible Lloyd's k-means (exact integer centroid
  sums; deterministic k-means++ init)
- ``semdedup``: cluster-then-prune semantic dedup (SemDeDup, Abbas et
  al. 2023) — within-cluster cosine pruning, deterministic keep rule
- ``importance``: DSIR importance weighting over hashed n-gram features
  (Xie et al. 2023) + deterministic Gumbel-top-k resampling
- ``pq``: product quantization (Jegou et al. 2011) — integer-space
  encode, ADC top-k over compact codes, IVF-PQ composition
- ``mining``: contrastive-pair mining — hard negatives (most-similar
  cross-label) and hard positives (least-similar in-label)
- ``typed``: typed-frame facades over the above
"""

from colnade_spark.operators import (
    asof,
    canonical,
    chunking,
    classifier,
    clustering,
    cms,
    cooccur,
    decontaminate,
    dedup,
    embeddings,
    funnel,
    graph,
    importance,
    intervals,
    mining,
    multimodal,
    packing,
    pq,
    quality,
    redact,
    sampling,
    semdedup,
    sessions,
    similarity,
    sketches,
    skew,
    spans,
    text,
    tfidf,
)

__all__ = [
    "asof",
    "canonical",
    "chunking",
    "classifier",
    "clustering",
    "cms",
    "cooccur",
    "decontaminate",
    "dedup",
    "embeddings",
    "funnel",
    "graph",
    "importance",
    "intervals",
    "mining",
    "multimodal",
    "packing",
    "pq",
    "quality",
    "redact",
    "sampling",
    "semdedup",
    "sessions",
    "similarity",
    "sketches",
    "skew",
    "spans",
    "text",
    "tfidf",
]
