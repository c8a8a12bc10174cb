"""S8 embedding stage (reference 09_embedding_transformation.py) as one plan:

articles(id, text) -> embeddings (V1) -> calibration (A6) -> int8 (V2)
                  -> binary (V3), all appended as columns.

V1's model is pluggable: the deterministic stub encoder hashes token n-grams
into a fixed-dim float vector and L2-normalizes (normalize_embeddings=True in
the reference, 09:13) — same iterator-pandas-UDF shape as a
sentence-transformers adapter (model constructed once per python worker,
Arrow batches in/out), so swapping in the real model is a one-line change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

EMBED_DIM = 64  # matches the synthetic embeddings table; reference uses 1024


def stub_encode_one(text: str, dim: int = EMBED_DIM) -> np.ndarray:
    """Deterministic text -> R^dim: token hash buckets + L2 normalization.
    A fake with real geometry: similar token multisets -> similar vectors."""
    v = np.zeros(dim, dtype=np.float64)
    for tok in (text or "").lower().split():
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        v[h % dim] += 1.0 if (h >> 8) % 2 else -1.0
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype(np.float32)


def make_encoder_udf(dim: int = EMBED_DIM, prompt: str = "passage: "):
    """Iterator pandas UDF (model built once per worker — V1 pattern).
    `prompt` mirrors the reference's encode(prompt='passage: ') (09:13)."""

    @F.pandas_udf(ArrayType(FloatType()))
    def encode(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # model "load" happens here, once per python worker
        for texts in batches:
            yield texts.map(
                lambda t: stub_encode_one(prompt + t if t else "", dim).tolist()
            )

    return encode


def embed_articles(articles: DataFrame, text_col: str = "text", dim: int = EMBED_DIM) -> DataFrame:
    """09:8-13: SELECT id, text -> encode -> embeddings column.  Column
    pruning keeps only (id, text) into the UDF stage."""
    enc = make_encoder_udf(dim)
    fan_out = articles.sparkSession.sparkContext.defaultParallelism
    return (
        articles.select("id", text_col)
        .repartition(fan_out)  # encoding is CPU-bound, not byte-bound
        .select("id", enc(F.col(text_col)).alias("embeddings"))
    )


def with_all_quantizations(emb: DataFrame, vec_col: str = "embeddings") -> DataFrame:
    """Full S8 output schema: embeddings + int8_embeddings (global
    calibration) + binary_embeddings (sign-pack), matching 09:23-27."""
    from commoncrawlnewsdataset_spark.operators.quantize import (
        calibration_ranges,
        pack_binary_bytes,
        quantize_int8,
    )

    lo, hi = calibration_ranges(emb, vec_col)
    return emb.withColumn(
        "int8_embeddings", quantize_int8(F.col(vec_col), lo, hi)
    ).withColumn("binary_embeddings", pack_binary_bytes(F.col(vec_col)))


def make_st_encoder_udf(
    model_name: str = "mixedbread-ai/deepset-mxbai-embed-de-large-v1",
    prompt: str = "passage: ",
    device: str | None = None,
    model_kwargs: dict | None = None,
):
    """Production V1: the reference's sentence-transformers call verbatim
    (09_embedding_transformation.py:11-13 — same model id, ctor
    device/model_kwargs, and encode(normalize_embeddings=True,
    prompt='passage: ')) in the iterator-UDF shape: the model is
    constructed ONCE per python worker and every Arrow batch is one
    encode() call (the reference encodes the whole table in one call on a
    GPU box; per-batch is the executor-memory-safe equivalent).  The import
    is deferred into the UDF body — executor-side dependency only.
    Contract-tested against a mock sentence_transformers module
    (tests/test_functions.py::test_st_encoder_adapter_contract); numeric
    parity with the real model is environment-bound."""

    @F.pandas_udf(ArrayType(FloatType()))
    def encode(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        from sentence_transformers import SentenceTransformer

        kw = {}
        if device is not None:
            kw["device"] = device
        if model_kwargs is not None:
            kw["model_kwargs"] = model_kwargs
        model = SentenceTransformer(model_name, **kw)  # once per worker
        for texts in batches:
            embs = model.encode(
                list(texts.fillna("")),
                normalize_embeddings=True,
                prompt=prompt,
            )
            yield pd.Series([np.asarray(e, dtype=np.float32).tolist() for e in embs])

    return encode
