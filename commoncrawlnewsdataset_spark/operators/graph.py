"""Link-graph operators for frontier prioritization.

The north-star scheduler ranks pending URLs by a priority column; real
crawlers derive that priority from the link graph (importance-first
crawling).  ``pagerank`` is the canonical scorer, expressed as DataFrame
joins/aggregates so it runs where the frontier lives:

- per iteration: contributions = edges ⋈ ranks ⋈ out-degree, one
  groupBy(dst).sum — 2 shuffles; dangling-node mass is redistributed
  uniformly via a 1-row broadcast cross join (kept IN-PLAN, no driver
  collect per round);
- ranks are rounded to 10 dp each iteration so a fixed-iteration run is
  bit-reproducible across engines (float addition is non-associative and
  groupBy sum order is nondeterministic; the per-iteration round snaps
  both engines to the same value, which the DuckDB oracle's unrolled CTEs
  mirror exactly);
- lineage is cut per round (localCheckpoint) like dup_clusters, and the
  same durable-checkpoint upgrade applies if a production run needs
  hundreds of iterations (crawl re-prioritization uses a handful).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over (src, dst) edges (parallel edges are
    deduplicated).  Returns (node, rank) with ranks rounded to 6 dp;
    sum(rank) == 1 up to rounding.  Deterministic for a given edge set."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()  # reused every iteration
    )
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count("*").alias("deg")).localCheckpoint()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        dangling = (
            ranks.join(deg.withColumnRenamed("src", "node"), "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                F.round(
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("s"), F.lit(0.0)) + F.col("dm") / n),
                    10,
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select("node", F.round("rank", 6).alias("rank"))
