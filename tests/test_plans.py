"""Physical-plan shape assertions: the optimizations the engine claims must
actually appear in the executed plan (pushdown, broadcast, top-k operator,
column pruning, no cartesian products)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from commoncrawlnewsdataset_spark.plans import queries as Q

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_pricing_summary_pushes_filter_to_scan(spark):
    df = Q.q_pricing_summary(spark, SF)
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan must not read unused money columns like l_tax
    scan = plan[plan.index("ReadSchema"):]
    assert "l_tax" not in scan.split("\n")[0]
    assert "HashAggregate" in plan  # partial+final agg, no sort-agg fallback


def test_star_join_broadcasts_dims(spark):
    plan = plan_of(Q.q_star_join_topn(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2  # nation + region at minimum
    assert "CartesianProduct" not in plan


def test_topk_uses_take_ordered(spark):
    plan = plan_of(Q.q_value_counts_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan  # no global sort for ORDER+LIMIT


def test_anti_join_is_broadcast(spark):
    plan = plan_of(Q.q_doc_source_antijoin(spark, SF))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_extract_prunes_html_before_shuffle(spark):
    """The wide binary column must stay inside the scan stage: the dedup
    exchange partitions on (text, hostname) and must not carry `html`."""
    from commoncrawlnewsdataset_spark.functions.extract import extract_articles
    from commoncrawlnewsdataset_spark.schemas import PAGES_SCHEMA
    from commoncrawlnewsdataset_spark.synth import make_pages_pdf

    pages = spark.createDataFrame(make_pages_pdf(50), PAGES_SCHEMA)
    plan = plan_of(extract_articles(pages))
    exchange = [ln for ln in plan.split("\n") if "Exchange hashpartitioning" in ln]
    assert exchange and all("html" not in ln for ln in exchange)


def test_politeness_no_global_window(spark):
    """The wave selection must never contain a partition-less window
    (single-partition bottleneck)."""
    plan = plan_of(Q.q_politeness_wave(spark, SF))
    import re

    for m in re.finditer(r"Window \[[^\]]*\], \[\]", plan):
        pytest.fail(f"global (unpartitioned) window in plan: {m.group(0)}")


def test_text_stats_stay_jvm_side(spark):
    """The SQL text stats are pure Column expressions: no Python evaluation
    node (row-at-a-time or Arrow) may appear in the plan."""
    plan = plan_of(Q.q_text_stats(spark, SF))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_frontier_select_no_cartesian(spark, tmp_path):
    from commoncrawlnewsdataset_spark.frontier.waves import WaveRunner
    from commoncrawlnewsdataset_spark.schemas import SEEDS_SCHEMA
    from commoncrawlnewsdataset_spark.synth import make_robots_pdf, make_seeds_pdf

    runner = WaveRunner(
        spark, str(tmp_path / "s"), per_host_budget=5,
        robots_rules=spark.createDataFrame(make_robots_pdf()),
    )
    runner.load_seeds(spark.createDataFrame(make_seeds_pdf(100), SEEDS_SCHEMA))
    plan = plan_of(runner.select_wave(runner.state()))
    assert "CartesianProduct" not in plan
    # robots gating is a broadcast anti-join, not a shuffled join
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
