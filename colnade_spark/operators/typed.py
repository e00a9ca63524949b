"""Typed facades over the pipeline operators: run quality filters,
dedup, sampling, chunking and packing WITHOUT leaving the typed frame
surface (`DataFrame[S]` in → `DataFrame[S]`/`DataFrame[Chunks]` out,
boundary-validated like every other typed op).

Schema-preserving operators (filters, samplers) are generic in ``S``
and revalidate through ``with_raw`` — the typed layer's sanctioned
escape hatch (reference: dataframe.py:653-673). Schema-changing
operators (chunking, packing) pin their OUTPUT schemas here
(``Chunks`` / ``PackedChunks``) so downstream code gets typed column
refs and typed rows for the pipeline's intermediate tables too.
"""

from __future__ import annotations

from typing import TypeVar

from colnade_spark.dataframe import DataFrame, _boundary_validate
from colnade_spark.dtypes import Int64, Utf8
from colnade_spark.operators import chunking as _chunking
from colnade_spark.operators import dedup as _dedup
from colnade_spark.operators import packing as _packing
from colnade_spark.operators import quality as _quality
from colnade_spark.operators import sampling as _sampling
from colnade_spark.schema import Column, Schema

S = TypeVar("S", bound=Schema)

__all__ = [
    "Chunks",
    "PackedChunks",
    "gopher_filter",
    "hash_sample",
    "stratified_sample",
    "dedup_exact",
    "dedup_minhash",
    "chunk_by_tokens",
    "pack_chunks",
]


class Chunks(Schema):
    doc_id: Column[Int64]
    chunk_id: Column[Int64]
    chunk_start: Column[Int64]
    chunk_tokens: Column[Int64]
    chunk_text: Column[Utf8]


class PackedChunks(Schema):
    doc_id: Column[Int64]
    chunk_id: Column[Int64]
    chunk_tokens: Column[Int64]
    shard: Column[Int64]
    pack_offset: Column[Int64]
    pack_id: Column[Int64]


def _typed(data, schema: type[S]) -> DataFrame[S]:
    out = DataFrame(data, schema)
    _boundary_validate(out)
    return out


def gopher_filter(frame: DataFrame[S], **kwargs) -> DataFrame[S]:
    """Schema-preserving Gopher quality gate (operators.quality)."""
    return frame.with_raw(lambda d: _quality.gopher_filter(d, **kwargs))


def hash_sample(
    frame: DataFrame[S], frac: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame[S]:
    """Schema-preserving deterministic sample (operators.sampling)."""
    return frame.with_raw(lambda d: _sampling.hash_sample(d, frac, key_col, salt))


def stratified_sample(
    frame: DataFrame[S],
    group_col: str,
    k: int,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame[S]:
    """Schema-preserving exact-k-per-group sample (operators.sampling)."""
    return frame.with_raw(
        lambda d: _sampling.stratified_sample(d, group_col, k, key_col, salt)
    )


def dedup_exact(
    frame: DataFrame[S], id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame[S]:
    """Exact dedup keeping full surviving rows (payload joins back to the
    surviving-id set — ids ride the shuffle, not documents)."""

    def _apply(d):
        keep = _dedup.dedup_exact(d, id_col=id_col, text_col=text_col)
        return d.join(keep, id_col)

    return frame.with_raw(_apply)


def dedup_minhash(
    frame: DataFrame[S],
    id_col: str = "doc_id",
    text_col: str = "text",
    **kwargs,
) -> DataFrame[S]:
    """MinHash-LSH near-dedup keeping full surviving rows."""

    def _apply(d):
        keep = _dedup.dedup_minhash(d, id_col=id_col, text_col=text_col, **kwargs)
        return d.join(keep, id_col)

    return frame.with_raw(_apply)


def chunk_by_tokens(
    frame: DataFrame[S], chunk_size: int = 128, overlap: int = 0
) -> DataFrame[Chunks]:
    """Chunk a Documents-shaped frame into typed chunk rows."""
    out = _chunking.chunk_by_tokens(
        frame.native, chunk_size=chunk_size, overlap=overlap
    )
    return _typed(out, Chunks)


def pack_chunks(
    frame: DataFrame[Chunks],
    budget: int,
    n_shards: int = 8,
) -> DataFrame[PackedChunks]:
    """Pack typed chunks into token-offset bins (typed output drops the
    chunk text payload: packed manifests carry ids + offsets; the text
    joins back by (doc_id, chunk_id) at write time)."""
    out = _packing.pack_chunks(frame.native, budget=budget, n_shards=n_shards)
    return _typed(
        out.select(
            "doc_id", "chunk_id", "chunk_tokens", "shard", "pack_offset", "pack_id"
        ),
        PackedChunks,
    )
