"""Large-scale data-pipeline operators (extensions beyond reference parity):

- ``dedup``: exact / fingerprint / MinHash-LSH / SimHash / n-gram Jaccard
- ``similarity``: brute-force + LSH cosine top-k, embedding near-dups
- ``text``: tokenization, quality scoring, language ID, fingerprints
- ``multimodal``: binary media columns + Arrow-batched decode plumbing
"""

from colnade_spark.operators import dedup, multimodal, similarity, text

__all__ = ["dedup", "multimodal", "similarity", "text"]
