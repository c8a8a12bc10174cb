"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query (reference pipeline spine on synthetic pages).
queries()     -> every implemented operator from SURVEY §2 as (spark, sf_dir)
                 callables; backed by commoncrawlnewsdataset_spark.plans.queries.
oracle_sql()  -> DuckDB-equivalent SQL for each oracle-checkable query.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _synth_pages(spark: SparkSession, n: int = 600) -> DataFrame:
    from commoncrawlnewsdataset_spark.schemas import PAGES_SCHEMA
    from commoncrawlnewsdataset_spark.synth import make_pages_pdf

    return spark.createDataFrame(make_pages_pdf(n), PAGES_SCHEMA)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's E2E spine (03→04→05→06) as one lazy plan —
    extract UDF → quality-metrics UDF → F4 filter → NER enrichment."""
    from commoncrawlnewsdataset_spark.functions.extract import extract_articles
    from commoncrawlnewsdataset_spark.functions.textmetrics import with_quality_metrics
    from commoncrawlnewsdataset_spark.ner import with_ner
    from commoncrawlnewsdataset_spark.operators.filters import filter_quality

    pages = _synth_pages(spark)
    articles = extract_articles(pages)
    scored = with_quality_metrics(articles)
    filtered = filter_quality(scored)
    return with_ner(filtered).select(
        "url", "hostname", "title", "word_count", "sentences_count", "loc", "loc_normal"
    )


# --- rows-only queries (non-SQL-expressible: Arrow UDF pipelines, ANN probe) ---

def q_extract_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full UDF spine on synthetic pages (byte-identical text invariant is
    pytest-checked; here the driver validates schema + row stability)."""
    return entry(spark)


def q_quality_metrics_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 bit-exact metrics UDF over the documents table (the Python
    str.isalpha semantics are not SQL-expressible; parity is pytest-checked
    against the reference function)."""
    from commoncrawlnewsdataset_spark.functions.textmetrics import with_quality_metrics

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return with_quality_metrics(docs.select("doc_id", "text")).drop("text")


def q_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN (scale path of cosine_topk; recall<1 by design,
    so there is deliberately no SQL oracle)."""
    from commoncrawlnewsdataset_spark.operators.similarity import lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    row = emb.orderBy("vec_id").select("embedding").first()
    qv = [float(x) for x in row["embedding"]]
    return lsh_topk(emb, qv, k=20, n_planes=8, probe_hamming=2)


def q_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF inverted-list ANN (scale path #2; recall<1 by design, no oracle):
    assign to nearest centroid list, probe 2 of 8 lists, exact re-rank."""
    from commoncrawlnewsdataset_spark.operators.similarity import (
        ivf_topk,
        pick_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = pick_centroids(emb, 8)
    row = emb.orderBy("vec_id").select("embedding").first()
    qv = [float(x) for x in row["embedding"]]
    return ivf_topk(emb, qv, cents, k=20, n_probe=2)


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payload -> mapInPandas feature extraction
    (decode stubbed deterministically; Spark-side schema/batching real)."""
    from commoncrawlnewsdataset_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_media_features,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    media = docs.select(
        F.concat(F.lit("m"), F.col("doc_id").cast("string")).alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.lit(1000).cast("long").alias("duration_ms"),
    )
    return extract_media_features(media)


def q_frontier_waves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two full crawl waves (politeness + bloom URL-seen + robots + link
    discovery + snapshot commit + resume read) on a synthetic open frontier;
    returns the final frontier state.  Side effects confined to a temp dir."""
    import tempfile

    from pyspark.sql import functions as FF

    from commoncrawlnewsdataset_spark.frontier.waves import WaveRunner
    from commoncrawlnewsdataset_spark.schemas import SEEDS_SCHEMA
    from commoncrawlnewsdataset_spark.synth import make_robots_pdf, make_seeds_pdf

    def expander(fetched):
        return fetched.select(
            FF.concat(FF.col("url"), FF.lit("/next")).alias("url"),
            FF.lit(0.25).alias("priority"),
            FF.col("discovered_ts"),
        )

    state_dir = tempfile.mkdtemp(prefix="frontier-q-")
    runner = WaveRunner(
        spark, state_dir, per_host_budget=8, nsalt=4,
        robots_rules=spark.createDataFrame(make_robots_pdf()),
        wave_seconds=30.0, link_expander=expander,
    )
    runner.load_seeds(spark.createDataFrame(make_seeds_pdf(300), SEEDS_SCHEMA))
    runner.run_wave()
    runner.run_wave()
    return runner.state().select("url", "host", "status", "wave", "attempts")


def q_ner_gazetteer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V5 NER stage (iterator pandas UDF, model loaded once per worker)."""
    from commoncrawlnewsdataset_spark.ner import with_ner

    pages = _synth_pages(spark, 400)
    return with_ner(pages.filter(F.col("text").isNotNull())).select(
        "url", "loc", "loc_normal"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from commoncrawlnewsdataset_spark.plans.queries import spark_queries

    qs = dict(spark_queries())
    qs.update(
        {
            "extract_pipeline": q_extract_pipeline,
            "quality_metrics_udf": q_quality_metrics_udf,
            "lsh_ann_topk": q_lsh_ann_topk,
            "ivf_ann_topk": q_ivf_ann_topk,
            "media_features": q_media_features,
            "ner_gazetteer": q_ner_gazetteer,
            "frontier_waves": q_frontier_waves,
        }
    )
    return qs


def oracle_sql() -> dict[str, str]:
    from commoncrawlnewsdataset_spark.plans.queries import oracle_sqls

    return dict(oracle_sqls())
