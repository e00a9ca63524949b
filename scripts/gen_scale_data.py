#!/usr/bin/env python3
"""Deterministic scale-measurement data generator (round 7, VERDICT #1).

The driver's fixtures stop at sf0.1 (5,000 docs / 2,000 vectors), so
every 100 TB claim in SCALE.md is a plan-shape argument. This generator
produces documents.parquet + embeddings.parquet at ARBITRARY scale with
the same statistics as the sf0.1 fixtures — measured from them, not
assumed:

- documents: n_words ~ Uniform[10, 100] (fixture avg 54.1), lang ~
  {en .41, de .14, zh .15, fr .15, es .15}, 20 sources, n_chars =
  len(text); ~4.9% of docs are near-copies of an earlier doc (1-2
  token edits — est. Jaccard stays >= ~0.8 at 5-shingles, the
  dedup_minhash threshold) and ~0.16% exact copies, matching the
  fixture's measured minhash drop rate (244/5000) and md5-duplicate
  count (8 pairs).

  VOCABULARY is the scale-realism knob (--vocab, default 2000): the
  fixture's 31-word vocabulary makes UNRELATED docs share most char
  5-grams, so minhash band-collision pairs grow ~n² (measured on the
  first round-7 board: 3.8k -> 372k -> 36.6M candidate pairs across
  5k/50k/500k docs — the operator docstring's "common-vocabulary
  corpora produce hot buckets" hazard, empirically confirmed). Real
  text has far higher shingle entropy; the default vocabulary keeps
  the fixture's 31 head words and adds a power-law long tail
  (p ∝ 1/(rank+10)) so unrelated docs have near-zero Jaccard while
  boilerplate remains head-heavy. --vocab 31 reproduces the stress
  case.
- embeddings: 64-dim unit-norm vectors around 10 cluster centers
  (labels balanced, fixture norms == 1.0); ~2% are near-copies of an
  earlier vector (matching emb_near_dup_pairs = 40/2000 at sf0.1).

Everything is seeded numpy — two runs produce byte-identical tables —
and scaling the row count scales the planted duplicate populations
linearly, so candidate-pair growth across scales reflects the banding,
not a drifting fixture. Output goes under the repo (.scaledata/), never
/root/testdata (read-only).

Usage: python scripts/gen_scale_data.py --docs 50000 --vecs 20000 \
           --out .scaledata/gen_sf1 [--seed 42]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_P = [0.41, 0.14, 0.15, 0.15, 0.15]
NEAR_DUP_FRAC = 0.049
EXACT_DUP_FRAC = 0.0016
EMB_NEAR_FRAC = 0.02
DIM = 64
N_LABELS = 10


def build_vocab(size: int) -> list[str]:
    """The fixture's 31 head words plus a synthetic long tail."""
    v = list(VOCAB)
    for i in range(max(0, size - len(v))):
        v.append(f"w{i:05d}")
    return v[:size]


def gen_documents(
    n: int, rng: np.random.Generator, vocab_size: int = 2000
) -> pa.Table:
    vocab = build_vocab(vocab_size)
    # head-heavy power law: boilerplate head words stay common (the
    # SoftDeDup / gram-count paths need real repetition), the tail
    # provides the shingle entropy real text has
    p = 1.0 / (np.arange(len(vocab)) + 10.0)
    p /= p.sum()
    langs = rng.choice(len(LANGS), size=n, p=LANG_P)
    sources = rng.integers(0, 20, size=n)
    n_words = rng.integers(10, 101, size=n)
    kind = rng.random(n)  # <NEAR -> near-dup, <NEAR+EXACT -> exact dup
    # one vectorized draw for every fresh doc's words
    flat = rng.choice(len(vocab), size=int(n_words.sum()), p=p)
    offs = np.concatenate(([0], np.cumsum(n_words)))
    texts: list[str] = []
    for i in range(n):
        if i > 0 and kind[i] < NEAR_DUP_FRAC:
            # near-copy of a random earlier doc: 1-2 token edits keep
            # 5-shingle Jaccard around the 0.8 gate
            src = int(rng.integers(0, i))
            words = texts[src].split(" ")
            for _ in range(int(rng.integers(1, 3))):
                pos = int(rng.integers(0, len(words)))
                words[pos] = vocab[int(rng.integers(0, len(vocab)))]
            texts.append(" ".join(words))
        elif i > 0 and kind[i] < NEAR_DUP_FRAC + EXACT_DUP_FRAC:
            texts.append(texts[int(rng.integers(0, i))])
        else:
            idx = flat[offs[i] : offs[i] + int(n_words[i])]
            texts.append(" ".join(vocab[j] for j in idx))
    del flat, offs  # ~22 GB of draw indices at the 50M tier
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array([LANGS[i] for i in langs], type=pa.string()),
            "source": pa.array(
                [f"src{int(s)}" for s in sources], type=pa.string()
            ),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64)
            ),
        }
    )


def gen_embedding_arrays(
    n: int, rng: np.random.Generator
) -> tuple[np.ndarray, np.ndarray]:
    """The seeded (vecs float32, labels) arrays shared by the one-shot
    and the chunked-writer paths — identical draws either way."""
    centers = rng.normal(size=(N_LABELS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, N_LABELS, size=n)
    vecs = centers[labels] * 2.0 + rng.normal(size=(n, DIM))
    # plant near-duplicate pairs: tiny perturbations of an earlier vector
    near = rng.random(n) < EMB_NEAR_FRAC
    for i in np.nonzero(near)[0]:
        if i == 0:
            continue
        src = int(rng.integers(0, i))
        vecs[i] = vecs[src] + rng.normal(scale=0.005, size=DIM)
        labels[i] = labels[src]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return vecs.astype(np.float32), labels


def gen_embeddings(n: int, rng: np.random.Generator) -> pa.Table:
    vecs, labels = gen_embedding_arrays(n, rng)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [v for v in vecs.tolist()], type=pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype(np.int32)),
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, required=True)
    ap.add_argument("--vecs", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument(
        "--vocab",
        type=int,
        default=2000,
        help="vocabulary size: fixture's 31 head words + power-law"
        " synthetic tail; 31 reproduces the small-vocab hot-bucket"
        " stress case",
    )
    ap.add_argument(
        "--row-group-docs",
        type=int,
        default=5000,
        help="parquet row-group size for documents: one row group per"
        " ~5k docs gives Spark real input splits at larger scales"
        " (the sf fixtures are one-file/one-split by construction)",
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    docs = gen_documents(args.docs, rng, args.vocab)
    pq.write_table(
        docs,
        os.path.join(args.out, "documents.parquet"),
        row_group_size=args.row_group_docs,
    )
    del docs  # free ~GBs before the embeddings pass at the 50M tier
    embs_path = os.path.join(args.out, "embeddings.parquet")
    if args.vecs <= 2_000_000:
        pq.write_table(
            gen_embeddings(args.vecs, rng),
            embs_path,
            row_group_size=args.row_group_docs,
        )
    else:
        # the one-shot path materializes vecs.tolist() — 64 Python
        # floats per row, ~30 GB at 20M vectors — so the 4th-decade
        # tier streams 1M-row slices through a ParquetWriter instead
        # (identical content and row-group layout; the float32 matrix
        # itself stays in memory for the near-copy back-references)
        vecs, labels = gen_embedding_arrays(args.vecs, rng)
        writer = None
        for i in range(0, args.vecs, 1_000_000):
            sl = slice(i, min(i + 1_000_000, args.vecs))
            t = pa.table(
                {
                    "vec_id": pa.array(
                        np.arange(sl.start, sl.stop, dtype=np.int64)
                    ),
                    "embedding": pa.array(
                        [v for v in vecs[sl].tolist()],
                        type=pa.list_(pa.float32()),
                    ),
                    "label": pa.array(labels[sl].astype(np.int32)),
                }
            )
            if writer is None:
                writer = pq.ParquetWriter(embs_path, t.schema)
            writer.write_table(t, row_group_size=args.row_group_docs)
        if writer is not None:
            writer.close()
    print(
        f"wrote {args.docs} docs + {args.vecs} vecs to {args.out}"
        f" (seed {args.seed})"
    )


if __name__ == "__main__":
    main()
