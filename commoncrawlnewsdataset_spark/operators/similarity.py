"""Similarity search over embedding columns.

Re-expresses the reference's USearch ANN queries
(Example_Usage/Semantic_search_{f32,int8,binary}.py) as DataFrame plans:

- ``brute_force_topk`` — exact top-k by cosine against a query vector:
  distance column + orderBy + limit (TakeOrderedAndProject; no full sort).
  This is the correctness baseline (reference O3, Semantic_search_f32.py:21-27)
  and fixes J7's positional-distance-attach bug structurally: the distance is
  carried as a column through the metadata join.
- ``lsh_buckets`` / ``lsh_topk`` — the scale path: sign-random-projection
  buckets (deterministic hyperplanes from a seed), candidates from matching
  buckets only, exact re-rank on candidates.  At 10^9 vectors the bucket join
  touches a small fraction of the corpus instead of all of it.
- Hamming / dot-product variants for the binary / int8 indexes
  (10_vector_database.py:14-30).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from commoncrawlnewsdataset_spark.operators.dedup import cosine_sim


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def brute_force_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k: similarity column + orderBy(desc, id) + limit.

    The literal query vector folds into the plan (no join, no shuffle);
    orderBy+limit compiles to TakeOrderedAndProject — each partition keeps a
    k-heap, the driver merges k*numPartitions rows, never a global sort."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col).cast("array<double>")
    sim = cosine_sim(v, q) if metric == "cosine" else dot(v, q)
    return (
        emb.select(F.col(id_col), F.round(sim, 4).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 13) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (pure fn of seed) for sign-LSH."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket_expr(vec_col: Column, planes: list[list[float]]) -> Column:
    """Bucket id = bitstring of sign(vec · plane_j) — JVM-side arithmetic."""
    bits = []
    for j, p in enumerate(planes):
        pj = F.array(*[F.lit(float(x)) for x in p])
        bits.append(
            F.when(dot(vec_col.cast("array<double>"), pj) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        )
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return total.cast("int")


def lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    probe_hamming: int = 1,
    seed: int = 13,
) -> DataFrame:
    """ANN: restrict to vectors whose sign-LSH bucket is within
    `probe_hamming` bits of the query's bucket, then exact re-rank.

    At scale the bucket column is precomputed and the table is partitioned by
    it, so the probe is a partition-pruned scan; here the filter is a cheap
    bit_count over a derived column."""
    planes = hyperplanes(len(query_vec), n_planes, seed)
    qbits = 0
    for j, p in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, p)) > 0:
            qbits |= 1 << j
    bucketed = emb.withColumn("_bkt", lsh_bucket_expr(F.col(vec_col), planes))
    probed = bucketed.filter(
        F.bit_count(F.col("_bkt").bitwiseXOR(F.lit(qbits))) <= probe_hamming
    )
    return brute_force_topk(probed, query_vec, k, id_col, vec_col)


def cosine_py(a: list[float], b: list[float]) -> float:
    """Driver-side cosine (query-vs-centroid scoring) — one definition so
    every probe-selection site shares the same zero-norm guard."""
    import math

    dd = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a)) or 1.0
    nb = math.sqrt(sum(x * x for x in b)) or 1.0
    return dd / (na * nb)


def nearest_lists(
    query_vec: list[float], centroids: list[list[float]], n_probe: int
) -> list[int]:
    """The n_probe inverted lists nearest the query (cosine desc, ties to
    the lowest index) — shared by ivf_topk / ivf_probe_read / AnnIndex."""
    return sorted(
        range(len(centroids)),
        key=lambda i: (-cosine_py(query_vec, centroids[i]), i),
    )[:n_probe]


def pick_centroids(
    emb: DataFrame, n_centroids: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[list[float]]:
    """Deterministic centroid seed: the vectors of the n smallest ids.
    Production would refine with k-means (mapPartitions Lloyd iterations);
    IVF's plan shape — assign, partition by list, probe few lists — is
    identical either way."""
    rows = emb.orderBy(id_col).select(vec_col).limit(n_centroids).collect()
    return [[float(x) for x in r[vec_col]] for r in rows]


def kmeans_refine(
    emb: DataFrame,
    centroids: list[list[float]],
    n_iter: int = 2,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd k-means iterations as DataFrame aggregates: assign each vector
    to its nearest centroid (ivf_assign — JVM-side argmax), then recompute
    each centroid as the per-dimension mean of its members.  One shuffle per
    iteration (a single groupBy with `dim` avg aggregates, map-side partial
    aggregation included); only n_centroids tiny rows reach the driver per
    iteration.  Empty clusters keep their previous centroid.  Deterministic:
    ties in assignment break to the lowest index."""
    dim = len(centroids[0])
    cents = [list(map(float, c)) for c in centroids]
    for _ in range(n_iter):
        assigned = ivf_assign(emb, cents, vec_col)
        v = F.col(vec_col).cast("array<double>")
        # round the means: double partial-aggregation ORDER can vary with
        # partitioning, and unrounded centroids could flip boundary
        # assignments between otherwise-identical runs — 6dp is orders
        # above the summation error and below any geometric difference, so
        # centroids (verified: whole built-index meta hashes) are
        # bit-reproducible across processes.
        means = assigned.groupBy("_list").agg(
            *[F.round(F.avg(F.element_at(v, i + 1)), 6).alias(f"m{i}") for i in range(dim)]
        ).collect()
        new = {r["_list"]: [float(r[f"m{i}"]) for i in range(dim)] for r in means}
        cents = [new.get(i, cents[i]) for i in range(len(cents))]
    return cents


def ivf_assign(
    emb: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Adds `_list`: index of the nearest centroid (cosine, ties -> lowest
    index).  argmax via array_max over (score, -idx) structs — struct
    comparison is lexicographic, all JVM-side."""
    v = F.col(vec_col).cast("array<double>")
    scored = F.array(
        *[
            F.struct(
                F.round(cosine_sim(v, F.array(*[F.lit(float(x)) for x in c])), 9).alias("s"),
                F.lit(-i).alias("neg_idx"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    best = F.array_max(scored)
    return emb.withColumn("_list", (-best["neg_idx"]).cast("int"))


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: probe the `n_probe` inverted lists nearest the query,
    exact re-rank inside them.  At scale `_list` is a precomputed partition
    column, so the probe is a partition-pruned scan of n_probe/n_centroids
    of the corpus."""
    probe = nearest_lists(query_vec, centroids, n_probe)
    assigned = ivf_assign(emb, centroids, vec_col)
    candidates = assigned.filter(F.col("_list").isin(probe)).drop("_list")
    return brute_force_topk(candidates, query_vec, k, id_col, vec_col)


def write_ivf_index(
    emb: DataFrame, path: str, centroids: list[list[float]],
    vec_col: str = "embedding", mode: str = "overwrite",
) -> None:
    """Materialize the IVF layout: parquet partitioned by the inverted-list
    id.  A probe then reads only n_probe/n_centroids of the files —
    partition pruning IS the index (plan-asserted in tests)."""
    ivf_assign(emb, centroids, vec_col).withColumnRenamed("_list", "list").write.mode(
        mode
    ).partitionBy("list").parquet(path)


def ivf_append(
    emb_new: DataFrame, path: str, centroids: list[list[float]],
    vec_col: str = "embedding",
) -> None:
    """Incremental index maintenance: assign ONLY the new vectors against the
    EXISTING centroids and append their rows to the list-partitioned layout —
    no rebuild, and probes see old + new vectors through the same
    partition-pruned read (Iceberg analog: a partitioned append commit).
    Centroid drift from sustained appends is handled by periodic re-train +
    full rewrite, exactly like compaction in the wave log."""
    write_ivf_index(emb_new, path, centroids, vec_col, mode="append")


def ivf_probe_read(
    spark, path: str, query_vec: list[float], centroids: list[list[float]],
    k: int = 10, n_probe: int = 2, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Partition-pruned IVF probe over a written index: the `list` filter is
    resolved against parquet PARTITION DIRECTORIES, so unprobed lists are
    never opened."""
    probe = nearest_lists(query_vec, centroids, n_probe)
    candidates = spark.read.parquet(path).filter(F.col("list").isin(probe))
    return brute_force_topk(candidates, query_vec, k, id_col, vec_col)


# bump when the IVF layout or build algorithm changes meaning (same contract
# as ann_index.INDEX_FORMAT_VERSION)
IVF_FORMAT_VERSION = 1


def ivf_cache_root() -> str:
    """Shared plain-IVF index cache root (signature-addressed entries, same
    scheme as ann_index.index_cache_root) — the ivf_ann_topk replay oracle
    interpolates THIS function, so engine and oracle paths cannot drift."""
    import os

    from commoncrawlnewsdataset_spark.cache import cache_root

    return os.path.join(cache_root(), "ivfix")


def ensure_shared_ivf(
    spark,
    sf_dir: str,
    n_lists: int = 8,
    kmeans_iter: int = 2,
    root: str | None = None,
) -> tuple[str, list[list[float]]]:
    """Deterministic per-dataset plain IVF index (kmeans-refined centroids +
    list-partitioned parquet) under the immutable signature-addressed cache
    — (rows_path, centroids).  Replaces the mkdtemp-per-run build that
    leaked one index dir per q_ivf_ann_topk invocation, and gives the
    DuckDB replay oracle a stable artifact to re-derive the probe + exact
    rescore from (VERDICT r6 #4).  Centroids are bit-reproducible
    (6dp-rounded means), so the cached index is a pure function of the
    signature: source abspath + exact content hash + geometry + format."""
    import json
    import os

    from commoncrawlnewsdataset_spark.cache import ensure_cached_dir, sig_hash

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    sig_row = emb.agg(
        F.count("*").alias("n"),
        F.bit_xor(
            F.xxhash64(F.col("vec_id"), F.col("embedding").cast("string"))
        ).alias("xh"),
    ).first()
    if int(sig_row["n"]) == 0:
        raise ValueError(
            f"embeddings table in {sf_dir!r} is empty — cannot build an IVF index"
        )
    sig = {
        "src": os.path.abspath(os.path.normpath(sf_dir)),
        "n": int(sig_row["n"]),
        "xh": int(sig_row["xh"]),
        "n_lists": int(n_lists),
        "kmeans_iter": int(kmeans_iter),
        "fmt": IVF_FORMAT_VERSION,
    }
    entry = f"sfkey={os.path.basename(os.path.normpath(sf_dir))}-{sig_hash(sig)}"

    def _build(tmp: str) -> None:
        cents = kmeans_refine(emb, pick_centroids(emb, n_lists), kmeans_iter)
        write_ivf_index(emb, os.path.join(tmp, "rows"), cents)
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump({"centroids": cents, "source_sig": sig}, f)

    path = ensure_cached_dir(root or ivf_cache_root(), entry, _build)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return os.path.join(path, "rows"), [
        [float(x) for x in c] for c in meta["centroids"]
    ]


def hamming_topk(
    df: DataFrame, query_sig: int, k: int, id_col: str, sig_col: str
) -> DataFrame:
    """Binary-embedding search: Hamming distance via bit_count(xor) —
    the 128-d binary USearch index's metric (10_vector_database.py:19-23)."""
    return (
        df.select(
            F.col(id_col),
            F.bit_count(F.col(sig_col).bitwiseXOR(F.lit(query_sig))).alias("hamming"),
        )
        .orderBy("hamming", F.col(id_col))
        .limit(k)
    )


def topk_with_metadata(
    topk: DataFrame, articles: DataFrame, on: str, cols: list[str]
) -> DataFrame:
    """J5: ANN result ⋈ metadata. The k-row side is broadcast — the reference
    instead round-tripped an IN-list through SQLite and re-attached distances
    positionally (Semantic_search_f32.py:39-50, buggy J7); carrying the score
    as a column makes that bug impossible."""
    return articles.select(on, *cols).join(F.broadcast(topk), on=on, how="inner")


# ---------------------------------------------------------------------------
# two-stage coarse-scan + exact-rescore search (VERDICT r3 #3: the >=0.9
# recall operating point) — the reference's own deployment pattern: its
# binary/int8 USearch indexes exist to SHORTLIST cheaply, with the f32
# vectors kept around to rescore (10_vector_database.py:14-30).
# ---------------------------------------------------------------------------

def pack_sign_words(vec: Column, bits_per_word: int = 32) -> Column:
    """Sign bits packed ``bits_per_word`` per long -> array<long>, MSB-first
    (dim=64 -> 2 words = 8 bytes/vector vs 256 for f32).  32 bits/word keeps
    the fold in non-overflowing long arithmetic (64 would carry into the
    sign bit, which ANSI mode rejects); the array is meant to be a STORED
    column so the coarse scan reads only these bytes (column pruning)."""
    raw = F.transform(vec, lambda x: F.when(x > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"))
    n_words = F.ceil(F.size(raw) / bits_per_word).cast("int")
    # Zero-pad the final partial word (dim % bits_per_word != 0): F.slice
    # would silently truncate, folding the tail bits into the LOW positions
    # of the last word while the driver-side twin sign_words_of left-aligns
    # them — bit-misaligned distances, recall collapse (ADVICE r4 medium).
    bits = F.concat(
        raw, F.array_repeat(F.lit(0).cast("long"), n_words * bits_per_word - F.size(raw))
    )
    return F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda w: F.aggregate(
            F.slice(bits, w * bits_per_word + 1, bits_per_word),
            F.lit(0).cast("long"),
            lambda acc, b: acc * 2 + b,
        ),
    )


def sign_words_of(vec: list[float], bits_per_word: int = 32) -> list[int]:
    """Driver-side twin of pack_sign_words for the query vector."""
    bits = [1 if x > 0 else 0 for x in vec]
    while len(bits) % bits_per_word:
        bits.append(0)
    out = []
    for w in range(0, len(bits), bits_per_word):
        acc = 0
        for b in bits[w : w + bits_per_word]:
            acc = acc * 2 + b
        out.append(acc)
    return out


def hamming_words(a: Column, b: Column) -> Column:
    """Hamming distance between two array<long> sign-bit words (JVM-side:
    zip_with + bit_count(xor), whole-stage codegen)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def rescore_exact(
    emb: DataFrame,
    shortlist: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Stage 2: exact cosine over the shortlist ids only — the shortlist is
    tiny and broadcasts, so the rescore is a broadcast semi-join + top-k."""
    cand = emb.join(F.broadcast(shortlist.select(id_col)), id_col)
    return brute_force_topk(cand, query_vec, k, id_col=id_col, vec_col=vec_col)


def binary_rescore_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    shortlist: int = 400,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sig_col: str | None = None,
) -> DataFrame:
    """Binary coarse scan (Hamming over packed sign words, dim/8 bytes per
    vector) -> top-``shortlist`` candidates (TakeOrderedAndProject, no full
    sort) -> exact cosine rescore.  With ``sig_col`` stored, stage 1 reads
    32x fewer bytes than the f32 scan at dim=64; recall is governed by
    ``shortlist`` (see BENCH/ANN.md for the measured recall/cost curve)."""
    if sig_col is None:
        df = emb.withColumn("_sig", pack_sign_words(F.col(vec_col)))
        sig_col = "_sig"
    else:
        df = emb
    qw = F.array(*[F.lit(int(w)) for w in sign_words_of(query_vec)])
    cand = (
        df.select(F.col(id_col), hamming_words(F.col(sig_col), qw).alias("hd"))
        .orderBy("hd", F.col(id_col))
        .limit(shortlist)
    )
    return rescore_exact(emb, cand, query_vec, k, id_col, vec_col)


def int8_rescore_topk(
    emb: DataFrame,
    query_vec: list[float],
    lo: list[float],
    hi: list[float],
    k: int = 10,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q8_col: str | None = None,
) -> DataFrame:
    """int8 coarse scan (integer inner product over calibrated int8 codes,
    dim bytes per vector = 4x fewer than f32) -> top-``shortlist`` -> exact
    cosine rescore.  Matches the reference's int8-index + f32-rescore
    deployment (Semantic_search_int8.py); int8 ranking error is tiny, so
    recall@10 is ~1.0 at small shortlists (measured in BENCH/ANN.md)."""
    from commoncrawlnewsdataset_spark.operators.quantize import quantize_int8

    if q8_col is None:
        df = emb.withColumn("_q8", quantize_int8(F.col(vec_col), lo, hi))
        q8_col = "_q8"
    else:
        df = emb

    def _q(x: float, l: float, h: float) -> int:
        return int((x - l) / (h - l) * 255.0 - 128.0) if h != l else -128

    q8 = F.array(*[F.lit(_q(x, l, h)) for x, l, h in zip(query_vec, lo, hi)])
    ip = F.aggregate(
        F.zip_with(F.col(q8_col), q8, lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cand = (
        df.select(F.col(id_col), ip.alias("ip"))
        .orderBy(F.desc("ip"), F.col(id_col))
        .limit(shortlist)
    )
    return rescore_exact(emb, cand, query_vec, k, id_col, vec_col)


def query_bits(query_vec: list[float], planes: list[list[float]]) -> int:
    """Driver-side twin of lsh_bucket_expr for the query vector."""
    qbits = 0
    for j, p in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, p)) > 0:
            qbits |= 1 << j
    return qbits


def lsh_multi_table_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_tables: int = 4,
    n_planes: int = 8,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_prefix: str | None = None,
    seed: int = 13,
) -> DataFrame:
    """Multi-table sign-LSH (the classic recall amplification): T
    independent hyperplane tables, candidates = UNION of per-table
    Hamming-ball bucket matches, exact cosine rerank on the union.  If a
    single table catches a true neighbor with probability p, T tables miss
    it with (1-p)^T — recall climbs geometrically while probe cost grows
    only with the union's size (overlapping balls don't double-pay: the
    filter is one OR over T bit_counts in a single scan, and at 10^9+
    vectors each stored bucket column partitions the table so the union is
    a T-way partition-pruned read).  ``bucket_prefix``: name prefix of T
    precomputed bucket columns (deployment shape — table t's planes use
    seed + 101*t); None derives them in-plan (bench/test convenience)."""
    df = emb
    cond = None
    for t in range(n_tables):
        planes = hyperplanes(len(query_vec), n_planes, seed + 101 * t)
        col = f"{bucket_prefix}{t}" if bucket_prefix else f"_mbkt{t}"
        if not bucket_prefix:
            df = df.withColumn(col, lsh_bucket_expr(F.col(vec_col), planes))
        term = (
            F.bit_count(F.col(col).bitwiseXOR(F.lit(query_bits(query_vec, planes))))
            <= probe_hamming
        )
        cond = term if cond is None else (cond | term)
    return brute_force_topk(df.filter(cond), query_vec, k, id_col, vec_col)
