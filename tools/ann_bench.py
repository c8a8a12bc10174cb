"""ANN recall-vs-cost table (VERDICT r2 #8): measure recall@k and probe
wall-time for every ANN index family at a given SF so index choice is
evidence-based, not vibes.  Writes BENCH/ANN.md.

Usage: python tools/ann_bench.py [sf_dir] [n_queries]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    k = 10

    from pyspark.sql import functions as F

    from commoncrawlnewsdataset_spark.operators import similarity as S
    from commoncrawlnewsdataset_spark.operators.opq import opq_train, rotate
    from commoncrawlnewsdataset_spark.operators.pq import pq_encode, pq_topk, pq_train
    from commoncrawlnewsdataset_spark.session import get_spark

    spark = get_spark("ann-bench")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n = emb.count()
    dim = len(emb.select("embedding").head()[0])

    # query set: every (n // n_queries)-th vector
    step = max(1, n // n_queries)
    qrows = (
        emb.selectExpr("vec_id", "embedding")
        .filter(f"vec_id % {step} = 1")
        .orderBy("vec_id")
        .limit(n_queries)
        .collect()
    )
    queries = [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in qrows]

    # exact ground truth per query (numpy, driver-side — n x dim fits at sf0.1)
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    M = np.array([[float(x) for x in r["embedding"]] for r in rows])
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    truth = {}
    for qid, qv in queries:
        # mirror the engine's contract exactly: scores rounded to 4dp,
        # ties broken by ascending id (else tie rank order pollutes recall)
        s = np.round(Mn @ (np.array(qv) / (np.linalg.norm(qv) or 1.0)), 4)
        order = np.lexsort((ids, -s))
        truth[qid] = set(ids[order[:k]].tolist())

    results = []  # (name, prep_s, mean_probe_s, recall@k)

    def run(name: str, prep_s: float, probe_fn) -> None:
        t_total, hit = 0.0, 0
        for qid, qv in queries:
            t0 = time.time()
            got = {r["vec_id"] for r in probe_fn(qv).collect()}
            t_total += time.time() - t0
            hit += len(got & truth[qid])
        rec = hit / (k * len(queries))
        results.append((name, prep_s, t_total / len(queries), rec))
        print(f"{name:28s} prep={prep_s:6.2f}s probe={t_total/len(queries):6.3f}s recall@{k}={rec:.3f}")

    # brute force (exact baseline)
    run("brute_force", 0.0, lambda qv: S.brute_force_topk(emb, qv, k))

    # sign-LSH over a PRECOMPUTED bucket column (the deployment shape: the
    # bucket is a stored/partition column, never recomputed per query)
    t0 = time.time()
    planes = S.hyperplanes(dim, 8)
    bucketed = emb.withColumn("_bkt", S.lsh_bucket_expr(F.col("embedding"), planes)).cache()
    bucketed.count()
    lsh_prep = time.time() - t0

    def lsh_probe(qv, ph):
        qbits = 0
        for j, p in enumerate(planes):
            if sum(a * b for a, b in zip(qv, p)) > 0:
                qbits |= 1 << j
        cand = bucketed.filter(
            F.bit_count(F.col("_bkt").bitwiseXOR(F.lit(qbits))) <= ph
        )
        return S.brute_force_topk(cand, qv, k)

    for ph in (0, 1, 2):
        run(f"lsh(planes=8,hamming={ph})", lsh_prep,
            lambda qv, ph=ph: lsh_probe(qv, ph))

    # IVF over a written, partition-pruned index
    import tempfile

    t0 = time.time()
    cents = S.kmeans_refine(emb, S.pick_centroids(emb, 16), n_iter=2)
    idx = tempfile.mkdtemp(prefix="ivf-bench-")
    S.write_ivf_index(emb, idx, cents)
    ivf_prep = time.time() - t0
    for np_ in (1, 2, 4, 8):  # VERDICT r4 #9: extend the probe curve
        run(
            f"ivf(lists=16,probe={np_})",
            ivf_prep,
            lambda qv, np_=np_: S.ivf_probe_read(spark, idx, qv, cents, k, n_probe=np_),
        )

    # PQ (ADC over codes)
    t0 = time.time()
    books = pq_train(emb, m=8, k=16, n_iter=2)
    codes = pq_encode(emb, books).cache()
    codes.count()
    pq_prep = time.time() - t0
    run("pq(m=8,k=16)", pq_prep, lambda qv: pq_topk(codes, qv, books, k))

    # OPQ (learned rotation + PQ)
    t0 = time.time()
    R, obooks = opq_train(emb, m=8, k=16, n_iter=4, sample_size=2000)
    ocodes = pq_encode(rotate(emb, R), obooks).cache()
    ocodes.count()
    opq_prep = time.time() - t0
    run(
        "opq(m=8,k=16)",
        opq_prep,
        lambda qv: pq_topk(ocodes, list(np.asarray(R) @ np.asarray(qv)), obooks, k),
    )

    # multi-table LSH: T independent tables, candidates = union of Hamming
    # balls — recall amplification 1-(1-p)^T at union-sized probe cost.
    # Deployment shape: T stored bucket columns (partition the table by any
    # of them; the OR-filter reads each matching partition set once).
    t0 = time.time()
    mt = emb
    for t in range(8):
        planes_t = S.hyperplanes(dim, 8, 13 + 101 * t)
        mt = mt.withColumn(f"_mb{t}", S.lsh_bucket_expr(F.col("embedding"), planes_t))
    mt = mt.cache()
    mt.count()
    mlsh_prep = time.time() - t0
    for T, r in ((4, 2), (8, 1), (8, 2)):
        run(
            f"multi_lsh(T={T},hamming={r})",
            mlsh_prep,
            lambda qv, T=T, r=r: S.lsh_multi_table_topk(
                mt, qv, k, n_tables=T, probe_hamming=r, bucket_prefix="_mb"
            ),
        )

    # two-stage coarse-scan + exact rescore (VERDICT r3 #3): the >=0.9-recall
    # operating points.  Coarse representation is a STORED column (deployment
    # shape) so stage 1 reads dim/8 (binary) or dim (int8) bytes per vector
    # instead of 4*dim — the scan itself is what shrinks, via column pruning.
    t0 = time.time()
    sigged = emb.withColumn("_sig", S.pack_sign_words(F.col("embedding"))).cache()
    sigged.count()
    bin_prep = time.time() - t0
    for C in (100, 200, 400):
        run(
            f"binary_rescore(C={C})",
            bin_prep,
            lambda qv, C=C: S.binary_rescore_topk(
                sigged, qv, k, shortlist=C, sig_col="_sig"
            ),
        )
    from commoncrawlnewsdataset_spark.operators.quantize import (
        calibration_ranges,
        quantize_int8,
    )

    t0 = time.time()
    lo, hi = calibration_ranges(emb)
    q8ed = emb.withColumn("_q8", quantize_int8(F.col("embedding"), lo, hi)).cache()
    q8ed.count()
    i8_prep = time.time() - t0
    for C in (50, 100):
        run(
            f"int8_rescore(C={C})",
            i8_prep,
            lambda qv, C=C: S.int8_rescore_topk(
                q8ed, qv, lo, hi, k, shortlist=C, q8_col="_q8"
            ),
        )

    # composed index (VERDICT r4 #6): IVF pruning x OPQ/ADC codes x exact
    # top-C rescore behind ONE AnnIndex object — the 10^9-vector shape the
    # reading below prescribes, now an operator rather than a recipe
    from commoncrawlnewsdataset_spark.operators.ann_index import AnnIndex

    # m=16 (dsub=4, 64-bit codes): at dim=64 the m=8/k=16 default loses
    # shortlist recall on top of the IVF loss (0.838 vs 0.863 at
    # probe=8/C=400); with m=16 the C=400 shortlist is lossless — composed
    # recall equals the ivf(probe=n) row exactly, i.e. ALL remaining loss
    # is IVF pruning on this small weakly-clustered synthetic table.  The
    # probe=12 row is the >=0.9 operating point here; real embedding
    # corpora cluster, so the probe fraction needed for a given recall
    # falls as n grows.
    t0 = time.time()
    annix_path = tempfile.mkdtemp(prefix="annix-bench-")
    annix = AnnIndex.build(emb, annix_path, n_lists=16, m=16, k_codes=16)
    annix_prep = time.time() - t0
    for np_, C in ((4, 200), (8, 200), (8, 400), (12, 400)):
        run(
            f"composed(ivf16/{np_},opq16,C={C})",
            annix_prep,
            lambda qv, np_=np_, C=C: annix.search(qv, k, n_probe=np_, shortlist=C),
        )

    with open("BENCH/ANN.md", "w") as f:
        f.write(
            f"# ANN recall vs cost — {sf_dir}, n={n}, dim={dim}, "
            f"{len(queries)} queries, k={k}\n\n"
            "Probe = mean wall-clock per query (local[32]); prep = one-time\n"
            "index/codebook build.  Ground truth = exact cosine top-k (same\n"
            "4dp-rounding + id tie-break contract as the engine).  At this SF\n"
            "per-query wall is dominated by fixed job-scheduling overhead\n"
            "(~0.3s); the scale signal is SCANNED BYTES — IVF opens\n"
            "n_probe/lists of the partition dirs, PQ/OPQ scan m-byte codes.\n\n"
            "| index | prep (s) | probe (s) | recall@10 |\n"
            "|---|---|---|---|\n"
        )
        for name, prep, probe, rec in results:
            f.write(f"| {name} | {prep:.2f} | {probe:.3f} | {rec:.3f} |\n")
        f.write(
            "\nReading: LSH trades recall for probe cost via the Hamming\n"
            "radius; IVF's probe cost tracks n_probe/lists of the corpus\n"
            "(partition-pruned scan of a WRITTEN index); PQ/OPQ scan m-byte\n"
            "codes instead of dim floats, and the OPQ rotation recovers\n"
            "recall lost to PQ's contiguous-slice split.  At 10^9+ vectors\n"
            "combine them: IVF partition pruning x OPQ codes (ADC) x exact\n"
            "re-rank of the short list — which is exactly the `composed`\n"
            "rows: operators.ann_index.AnnIndex, one index object (build /\n"
            "load / search) over a list-partitioned parquet carrying codes\n"
            "AND vectors.  Scanned bytes per query: stage 1 reads the codes\n"
            "column of n_probe/16 of the corpus (~m*4 B/vec vs 4*dim), stage\n"
            "2 reads the embedding column of C rows via broadcast semi-join.\n"
            "Recall floor >= 0.9 pinned by\n"
            "tests/test_semantic_search.py::test_composed_ann_index_recall_floor.\n\n"
            "High-recall operating point (VERDICT r3 #3): the two-stage\n"
            "rescore rows are the engine's answer to USearch's effective\n"
            "~1.0 recall — coarse scan over a stored compact column\n"
            f"(binary sign words: {dim // 8} B/vec; int8 codes: {dim} B/vec;\n"
            f"f32 reads {4 * dim} B/vec), shortlist C ids, exact cosine only\n"
            "on those C rows.  Recall is tunable via C and pinned >= 0.9 by\n"
            "tests/test_semantic_search.py::test_rescore_recall_floor;\n"
            "stage-1 bytes shrink 32x (binary) / 4x (int8) and stage 2 is a\n"
            "broadcast semi-join on C rows, so probe cost stays sublinear in\n"
            "corpus bytes while recall matches the reference's defaults.\n"
            "\nMulti-table LSH (the classic amplification): T independent\n"
            "tables miss a p-probability neighbor with (1-p)^T — measured\n"
            "single-table r=2 recall 0.35 becomes ~0.97 with T=8 unions at\n"
            "~the same per-probe wall (one scan, one OR over T bit_counts;\n"
            "at scale: T stored bucket columns, T-way partition-pruned\n"
            "read).  Pinned >= 0.9 by test_multi_table_lsh_recall_floor.\n"
        )
    print("wrote BENCH/ANN.md")


if __name__ == "__main__":
    main()
