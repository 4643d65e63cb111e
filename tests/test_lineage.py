"""Resume-after-failure semantics of the lineage-checkpointed extraction."""

from __future__ import annotations

import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pero_ocr_spark import corpus
from pero_ocr_spark.operators import extract, lineage


@pytest.fixture()
def out_dir():
    with tempfile.TemporaryDirectory() as d:
        yield d


def _full_reference(spark, sf_dir) -> pd.DataFrame:
    out = extract.extract_spans(corpus.spans_table(spark, sf_dir)).toPandas()
    return out.sort_values(["doc_id", "ord"]).reset_index(drop=True)


def test_crash_then_resume_produces_exact_full_output(spark, sf_dir, out_dir):
    with pytest.raises(RuntimeError, match="injected failure"):
        lineage.run_extraction_with_lineage(
            spark, sf_dir, out_dir, n_buckets=8, fail_after_buckets=3
        )
    manifest = spark.read.parquet(f"{out_dir}/_lineage")
    assert manifest.count() == 3
    assert manifest.filter(F.col("status") == "done").count() == 3
    assert manifest.filter(F.col("spans_per_sec") > 0).count() == 3

    # resume: completes the remaining 5 buckets only
    result = lineage.run_extraction_with_lineage(spark, sf_dir, out_dir, n_buckets=8)
    manifest2 = spark.read.parquet(f"{out_dir}/_lineage")
    assert manifest2.count() == 8

    got = (
        result.select("doc_id", "kind", "text", "media_ref", "ord")
        .toPandas()
        .sort_values(["doc_id", "ord"])
        .reset_index(drop=True)
    )
    want = _full_reference(spark, sf_dir)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rerun_after_completion_is_noop(spark, sf_dir, out_dir):
    lineage.run_extraction_with_lineage(spark, sf_dir, out_dir, n_buckets=4)
    n1 = spark.read.parquet(f"{out_dir}/spans").count()
    m1 = spark.read.parquet(f"{out_dir}/_lineage").count()
    lineage.run_extraction_with_lineage(spark, sf_dir, out_dir, n_buckets=4)
    assert spark.read.parquet(f"{out_dir}/spans").count() == n1  # no duplicates
    assert spark.read.parquet(f"{out_dir}/_lineage").count() == m1


def test_repartition_weighted_bounds_partition_weight(spark):
    docs = spark.createDataFrame(
        [(i, 1000 if i % 10 == 0 else 10) for i in range(100)],
        ["doc_id", "weight"],
    )
    packed = lineage.repartition_weighted(docs, "weight", target_weight=1500.0)
    sizes = (
        packed.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.sum("weight").alias("w"))
        .collect()
    )
    # no partition materially exceeds target + one max row
    assert max(r["w"] for r in sizes) <= 1500 + 1000
    assert len(sizes) >= 5
