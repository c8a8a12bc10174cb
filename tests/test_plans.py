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


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Co-located join contract (the 100 TB repeat-join economics): two
    tables bucketed+sorted on the join key with the same bucket count join
    as a SortMergeJoin with NO Exchange and NO Sort on either side — the
    shuffle is paid once at write time.  Also locks the negative: the same
    join over plain parquet DOES exchange, so the assertion can't pass
    vacuously."""
    import contextlib
    import io

    from commoncrawlnewsdataset_spark.sources.bucketed import (
        read_table,
        write_bucketed_table,
    )

    # warehouse dir is a static conf; managed tables land in the session
    # default and are dropped (with data) in the finally below
    urls = spark.range(0, 5000).selectExpr(
        "concat('https://h', id % 50, '.example.org/p/', id) AS url",
        "id % 7 AS depth",
    )
    meta = spark.range(0, 5000).selectExpr(
        "concat('https://h', id % 50, '.example.org/p/', id) AS url",
        "id * 10 AS fetch_ms",
    )
    write_bucketed_table(urls, "t_frontier_b", "url", n_buckets=8)
    write_bucketed_table(meta, "t_meta_b", "url", n_buckets=8)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        joined = read_table(spark, "t_frontier_b").join(
            read_table(spark, "t_meta_b"), "url"
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles:\n" + plan
        assert joined.count() == 5000  # and it's the right join

        plain = urls.join(meta, "url")
        buf2 = io.StringIO()
        with contextlib.redirect_stdout(buf2):
            plain.explain("formatted")
        assert "Exchange" in buf2.getvalue()  # negative control
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_frontier_b")
        spark.sql("DROP TABLE IF EXISTS t_meta_b")


def test_decontaminate_broadcasts_eval_side(spark):
    """The eval shingle set must broadcast (tiny vs corpus): the overlap
    join is a BroadcastHashJoin, never a SortMergeJoin shuffling exploded
    corpus shingles against the eval side."""
    plan = plan_of(Q.q_decontaminate(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pii_redact_is_pure_codegen(spark):
    """PII redaction must stay JVM-side: regex counts + replacements in
    Projects, zero python UDF evaluation in the plan (the only Exchange is
    the deliberate CPU fan-out repartition for the regex-bound stage)."""
    plan = plan_of(Q.q_pii_redact(spark, SF))
    assert "regexp_replace" in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan
