"""OPQ: Optimized Product Quantization — a learned rotation in front of PQ.

PQ (pq.py) splits vectors into m contiguous subspaces; when the data's
variance is unevenly spread across (or correlated between) those slices, the
per-subspace codebooks waste codes.  OPQ learns an orthogonal rotation R that
redistributes variance so the subspace split quantizes better, then runs
plain PQ in the rotated space (Ge et al., "Optimized Product Quantization",
CVPR 2013 — the non-parametric alternating solver).

Scale shape (the standard production split):

- TRAINING is driver-side numpy over a bounded deterministic sample
  (``sample_size`` rows — OPQ/PQ codebooks are universally trained on a
  sample at any corpus size, so this is O(1) w.r.t. the corpus): alternate
  (a) local Lloyd PQ in the rotated space and (b) the orthogonal Procrustes
  update R = V U^T from the d x d SVD of X^T X_hat.  Only d x d matrices and
  the sample ever live on the driver.
- APPLICATION is distributed: ``rotate`` is an Arrow-batched pandas UDF
  doing one (batch x d) @ R^T matmul per batch — vectorized numpy, never
  per-row Python — after which the existing pq_encode / pq_topk column
  expressions (JVM-side) operate unchanged on the rotated vectors.

Reference parity note: the reference has no PQ/OPQ (its vector surface is
f32/int8/binary flat search, 09_embedding_transformation.py); this extends
the quantization family for the 10^9-vector regime the graft targets.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType


def _local_pq_train(
    X: np.ndarray, m: int, k: int, n_iter: int = 8
) -> list[np.ndarray]:
    """Plain per-subspace Lloyd k-means (numpy, deterministic first-k seeds —
    the same seeding contract as pq.pq_train).  Returns m arrays of (k, dsub)."""
    n, d = X.shape
    dsub = d // m
    books = []
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = S[:k].copy()
        for _ in range(n_iter):
            # assign by max cosine (matches pq.py's cosine assignment)
            Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
            Sn = S / np.maximum(np.linalg.norm(S, axis=1, keepdims=True), 1e-12)
            a = np.argmax(Sn @ Cn.T, axis=1)
            for c in range(k):
                sel = S[a == c]
                if len(sel):
                    C[c] = sel.mean(axis=0)
        books.append(C)
    return books


def _local_pq_reconstruct(X: np.ndarray, books: list[np.ndarray]) -> np.ndarray:
    m = len(books)
    dsub = books[0].shape[1]
    out = np.empty_like(X)
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = books[j]
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        Sn = S / np.maximum(np.linalg.norm(S, axis=1, keepdims=True), 1e-12)
        a = np.argmax(Sn @ Cn.T, axis=1)
        out[:, j * dsub : (j + 1) * dsub] = C[a]
    return out


def opq_train(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    n_iter: int = 5,
    sample_size: int = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, list[list[list[float]]]]:
    """Learn (R, codebooks) by alternating Procrustes/PQ on a deterministic
    min-id sample.  Returns R (d x d, orthogonal, applied as x' = x @ R.T)
    and codebooks in pq.py's list format (m x k x dsub), trained in the
    ROTATED space — feed ``rotate(df, R)`` into pq_encode with them.

    Procrustes step: minimize ||X R^T - X_hat||_F over orthogonal R
    -> maximize trace(R A), A = X^T X_hat -> R = V U^T from A = U S V^T."""
    rows = (
        emb.orderBy(id_col).select(vec_col).limit(sample_size).collect()
    )  # bounded deterministic sample; only this touches the driver
    X = np.asarray([list(map(float, r[vec_col])) for r in rows], dtype=np.float64)
    d = X.shape[1]
    R = np.eye(d)
    books: list[np.ndarray] = []
    for _ in range(n_iter):
        Xr = X @ R.T
        books = _local_pq_train(Xr, m, k)
        Xhat = _local_pq_reconstruct(Xr, books)
        A = X.T @ Xhat
        U, _s, Vt = np.linalg.svd(A)
        R = (U @ Vt).T  # maximizes trace(R A); rows rotate x -> R x
    return R, [[list(map(float, c)) for c in B] for B in books]


def rotate(
    emb: DataFrame,
    R: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, embedding) with embedding' = R @ embedding — one Arrow-batched
    numpy matmul per batch (the dense-matmul case where a vectorized pandas
    UDF genuinely beats inlining d^2 multiply terms into codegen)."""
    Rt = R.T.copy()

    @F.pandas_udf(ArrayType(DoubleType()))
    def _rot(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            M = np.asarray([np.asarray(v, dtype=np.float64) for v in s])
            out = M @ Rt
            yield pd.Series(list(out))

    return emb.select(F.col(id_col), _rot(F.col(vec_col)).alias(vec_col))


def quantization_error(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Mean 1 - cos(subvector, assigned code) across all subspaces — the
    objective OPQ lowers vs plain PQ; computed distributed (exploded agg)."""
    from commoncrawlnewsdataset_spark.operators.pq import _cos_lit

    m = len(codebooks)
    dsub = len(codebooks[0][0])
    v = F.col(vec_col).cast("array<double>")
    per_sub = []
    for j in range(m):
        sv = F.slice(v, j * dsub + 1, dsub)
        best = F.greatest(
            *[F.round(_cos_lit(sv, codebooks[j][c]), 9) for c in range(len(codebooks[j]))]
        )
        per_sub.append(F.lit(1.0) - best)
    total = per_sub[0]
    for t in per_sub[1:]:
        total = total + t
    row = emb.select((total / m).alias("err")).agg(F.avg("err").alias("e")).first()
    return float(row["e"])
