"""Spark layout stage tests on the synthetic lines table."""

from __future__ import annotations

from pyspark.sql import functions as F

from pero_ocr_spark.operators import layout


def test_lines_table_halves(spark, sf_dir):
    lines = layout.lines_table(spark, sf_dir)
    one = lines.filter(F.col("ord") % 5 == 4)
    assert one.count() > 0
    assert one.filter(~F.col("line_id").rlike("[ab]$")).count() == 0
    # keys unique
    assert (
        lines.groupBy("doc_id", "line_id").count().filter("count > 1").count() == 0
    )


def test_merge_restores_ord_count(spark, sf_dir):
    lines = layout.lines_table(spark, sf_dir).filter(F.col("doc_id") < 20)
    merged = layout.merge_lines_stage(lines)
    want = lines.select("doc_id", "region_id", "ord").distinct().count()
    assert merged.count() == want


def test_assign_no_duplicates_and_clipping(spark, sf_dir):
    lines = layout.lines_table(spark, sf_dir).filter(F.col("doc_id") < 20)
    regions = layout.regions_table(spark, sf_dir).filter(F.col("doc_id") < 20)
    shrunk = regions.select(
        "doc_id",
        "region_id",
        "rx0",
        (F.col("rx0") + 0.8 * (F.col("rx1") - F.col("rx0"))).alias("rx1"),
        "ry0",
        "ry1",
    )
    out = layout.assign_lines_to_regions(lines, shrunk)
    assert out.groupBy("doc_id", "line_id", "region_id").count().filter(
        "count > 1"
    ).count() == 0
    # some lines actually got clipped (cx1 < original x1)
    joined = out.join(
        lines.select("doc_id", "line_id", "x1"), ["doc_id", "line_id"]
    )
    assert joined.filter(F.col("cx1") < F.col("x1")).count() > 0


def test_assign_join_stays_broadcast(spark, sf_dir):
    """Plan-shape guard (round-3 verdict item 3): the lines↔regions
    candidate join must be a broadcast hash join — the regions side is
    per-doc-small by construction and an autoBroadcastJoinThreshold
    change or lineage refactor silently degrading it to sort-merge
    would make this the dominant shuffle at scale."""
    lines = layout.lines_table(spark, sf_dir)
    regions = layout.regions_table(spark, sf_dir)
    plan = layout.assign_lines_to_regions(lines, regions)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]
