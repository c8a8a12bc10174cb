"""Product quantization (PQ): codebook training, encoding, ADC search.

Completes the quantization family (int8 affine, binary sign — quantize.py)
with the codebook variant real vector stores use at 10^9+ scale: split each
vector into ``m`` contiguous subvectors, k-means a tiny codebook per
subspace, store each vector as ``m`` byte-sized codes (dim x 4 bytes ->
m bytes), and score queries against codes via ADC (asymmetric distance
computation: a per-query lookup table of subspace dot products).

Scale shape:

- training: ONE shuffle per Lloyd iteration for ALL subspaces — the vector
  explodes to (subspace_id, subvector) rows, one groupBy(subspace, code)
  computes every codebook's means together (not m separate jobs);
- encoding: pure column expressions (argmax over k per subspace — struct
  array_max, JVM-side), no Python;
- search: the query's m x k lookup table folds into literal arrays; score =
  sum of m element_at lookups per row + TakeOrderedAndProject.  Scanned
  bytes per vector: m codes instead of dim floats.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot_py(a: list[float], b: list[float]) -> float:
    return sum(x * y for x, y in zip(a, b))


def pq_train(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> list[list[list[float]]]:
    """Per-subspace codebooks (m x k x dim/m), Lloyd-refined from min-id
    seeds.  Each iteration is ONE exploded groupBy over (subspace, code)."""
    if dim is None:
        dim = len(emb.select(vec_col).head()[0])
    dsub = dim // m
    v = F.col(vec_col).cast("array<double>")
    sub_rows = emb.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.slice(v, j * dsub + 1, dsub).alias("sv"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("s"),
    ).select("id", "s.j", "s.sv")

    seed_rows = emb.orderBy(id_col).select(vec_col).limit(k).collect()
    seeds = [[float(x) for x in r[vec_col]] for r in seed_rows]
    books = [
        [seeds[c][j * dsub : (j + 1) * dsub] for c in range(len(seeds))]
        for j in range(m)
    ]

    def assign_expr(bks) -> Column:
        # per exploded row: argmax_c cos(sv, bks[j][c]); CASE chain keeps the
        # non-matching subspaces' score arrays unevaluated
        expr = None
        for j in range(m):
            scored = F.array(
                *[
                    F.struct(
                        F.round(_cos_lit(F.col("sv"), bks[j][c]), 9).alias("s"),
                        F.lit(-c).alias("neg"),
                    )
                    for c in range(len(bks[j]))
                ]
            )
            best = (-F.array_max(scored)["neg"]).cast("int")
            expr = F.when(F.col("j") == j, best) if expr is None else expr.when(
                F.col("j") == j, best
            )
        return expr

    for _ in range(n_iter):
        assigned = sub_rows.withColumn("code", assign_expr(books))
        # rounded means: see kmeans_refine — keeps codebooks
        # bit-reproducible regardless of partial-aggregation order
        means = assigned.groupBy("j", "code").agg(
            *[F.round(F.avg(F.element_at("sv", i + 1)), 6).alias(f"m{i}") for i in range(dsub)]
        ).collect()
        new = {(r["j"], r["code"]): [float(r[f"m{i}"]) for i in range(dsub)] for r in means}
        books = [
            [new.get((j, c), books[j][c]) for c in range(len(books[j]))]
            for j in range(m)
        ]
    return books


def _cos_lit(sv: Column, center: list[float]) -> Column:
    c = F.array(*[F.lit(float(x)) for x in center])
    dot = F.aggregate(F.zip_with(sv, c, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    na = F.sqrt(F.aggregate(F.transform(sv, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    nb = math.sqrt(sum(x * x for x in center)) or 1.0
    return dot / (F.when(na > 0, na).otherwise(F.lit(1.0)) * F.lit(nb))


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes: array<int>) — m argmax column expressions, no Python."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    v = F.col(vec_col).cast("array<double>")
    codes = []
    for j in range(m):
        sv = F.slice(v, j * dsub + 1, dsub)
        scored = F.array(
            *[
                F.struct(
                    F.round(_cos_lit(sv, codebooks[j][c]), 9).alias("s"),
                    F.lit(-c).alias("neg"),
                )
                for c in range(len(codebooks[j]))
            ]
        )
        codes.append((-F.array_max(scored)["neg"]).cast("int"))
    return emb.select(F.col(id_col), F.array(*codes).alias("codes"))


def adc_lut(
    query_vec: list[float], codebooks: list[list[list[float]]]
) -> list[list[float]]:
    """The per-query ADC lookup table lut[j][c] = dot(query_sub_j,
    codebook[j][c]) / |query| — exposed separately so an external replay
    (the composed-ANN DuckDB oracle) can consume the exact floats the scan
    expression folds in."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    qnorm = math.sqrt(sum(x * x for x in query_vec)) or 1.0
    return [
        [float(_dot_py(query_vec[j * dsub : (j + 1) * dsub], c) / qnorm) for c in codebooks[j]]
        for j in range(m)
    ]


def adc_score_expr(
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    codes_col: str = "codes",
) -> Column:
    """ADC score as a Column: the ``adc_lut`` table folded into literal
    arrays; a row's score is m element_at lookups — the scan never touches
    float vectors.  Shared by pq_topk and the composed AnnIndex coarse
    stage."""
    score = None
    for j, lut_j in enumerate(adc_lut(query_vec, codebooks)):
        lut = F.array(*[F.lit(v) for v in lut_j])
        term = F.element_at(lut, F.element_at(codes_col, j + 1) + 1)
        score = term if score is None else score + term
    return score


def pq_topk(
    codes: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC search over PQ codes (adc_score_expr) + top-k."""
    score = adc_score_expr(query_vec, codebooks)
    return (
        codes.select(F.col(id_col), F.round(score, 4).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )
