"""TF-IDF top terms per document — pure DataFrame plan, oracle-checkable.

Corpus analytics a training-data pipeline runs constantly (what is this
document about / which terms dominate a source).  Shape at scale:

- explode tokens (map-side), groupBy (doc, term) for tf — 1 shuffle;
- groupBy term for document frequency — 1 shuffle of term keys only;
- N (corpus size) is a 1-row aggregate, broadcast by AQE into the join;
- per-doc top-k via window over (doc) — shuffle on doc id.

The idf uses the sklearn-style smooth form ln((N+1)/(df+1)) + 1, computed in
double on both engines (DuckDB mirrors ln/round exactly at 4 dp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from commoncrawlnewsdataset_spark.operators.dedup import tokens


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k terms per doc by tf-idf (ties: term asc), rounded to 4 dp."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.countDistinct(id_col).alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * (F.log((F.col("n") + 1) / (F.col("df") + 1)) + 1), 4
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("doc_id", "term", F.col("tf").cast("long").alias("tf"), "tfidf", "rn")
    )


def unigram_nll_scores(
    df: DataFrame, id_col: str, text_col: str, alpha: float = 1.0
) -> DataFrame:
    """CCNet-style LM quality scoring, unigram form: score each document by
    the mean negative log-probability of its tokens under the corpus's OWN
    add-alpha-smoothed unigram distribution — unusually high NLL flags
    gibberish / OOV-heavy text, unusually low flags boilerplate-frequent
    wording (CCNet buckets on exactly this kind of LM score; the unigram
    form needs no model artifact and stays fully relational, hence
    oracle-checkable).

        p(t) = (c_t + alpha) / (N + alpha * V)
        nll  = -mean_t log p(t) over the document's tokens

    Plan: one explode + one groupBy for the vocabulary, a 1-row corpus
    total broadcast (kept IN-PLAN via cross join), one join back, one
    per-doc aggregate.  The token join keys on the token string for oracle
    parity; at 100 TB key it on xxhash64(token) (8-byte shuffle keys, same
    trick as ngram_jaccard_pairs)."""
    from commoncrawlnewsdataset_spark.operators.dedup import tokens

    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("c"))
    totals = vocab.agg(
        F.sum("c").cast("double").alias("N"), F.count("*").cast("double").alias("V")
    )
    lp = -F.log(
        (F.col("c") + F.lit(alpha)) / (F.col("N") + F.lit(alpha) * F.col("V"))
    )
    return (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(totals))
        .select("doc_id", lp.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(F.avg("lp"), 4).alias("nll"),
        )
    )
