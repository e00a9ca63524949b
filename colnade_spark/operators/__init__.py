"""Large-scale data-pipeline operators (extensions beyond reference parity):

- ``dedup``: exact / fingerprint / MinHash-LSH / SimHash / n-gram Jaccard
- ``similarity``: brute-force + LSH + IVF cosine top-k, embedding near-dups
- ``text``: tokenization, quality scoring, language ID, fingerprints
- ``quality``: repetition stats, top-token stats, Gopher rule filters
- ``chunking`` / ``packing``: token-window chunks → shard-local budget bins
- ``sampling``: deterministic hash sampling, splits, stratified sampling
- ``redact``: PII redaction, URL/domain extraction
- ``embeddings``: L2 normalize, fixed-centroid cluster assignment
- ``decontaminate``: benchmark decontamination (shared-n-gram rule)
- ``tfidf``: smoothed TF-IDF weights, top-k terms per document
- ``funnel``: ordered-funnel analysis over event streams
- ``graph``: connected components (duplicate-cluster resolution)
- ``sessions``: gap-based sessionization (batch + streaming state)
- ``asof``: as-of joins
- ``intervals``: bin-blocked point-in-interval (range) joins
- ``skew``: salted joins
- ``multimodal``: binary media columns + Arrow-batched decode plumbing
- ``typed``: typed-frame facades over the above
"""

from colnade_spark.operators import (
    asof,
    chunking,
    clustering,
    decontaminate,
    dedup,
    embeddings,
    funnel,
    graph,
    intervals,
    multimodal,
    packing,
    quality,
    redact,
    sampling,
    sessions,
    similarity,
    sketches,
    skew,
    text,
    tfidf,
)

__all__ = [
    "asof",
    "chunking",
    "clustering",
    "decontaminate",
    "dedup",
    "embeddings",
    "funnel",
    "graph",
    "intervals",
    "multimodal",
    "packing",
    "quality",
    "redact",
    "sampling",
    "sessions",
    "similarity",
    "sketches",
    "skew",
    "text",
    "tfidf",
]
