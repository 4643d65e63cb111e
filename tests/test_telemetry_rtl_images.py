"""Telemetry observe metrics, RTL reorder, binary image scan/sink."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from pero_ocr_spark import corpus
from pero_ocr_spark.operators import ctc, extract, rtl, telemetry
from pero_ocr_spark.sources import images


def test_observe_spans_metrics(spark, sf_dir):
    spans = extract.extract_spans(corpus.spans_table(spark, sf_dir))
    observed, obs = telemetry.observe_spans(spans)
    n = observed.count()
    got = obs.get
    assert got["n_spans"] == n
    assert got["n_docs"] > 0
    assert got["n_chars"] > 0


def test_observe_decode_metrics(spark, sf_dir):
    logits = ctc.logits_table(spark, sf_dir, max_lines=100)
    decoded, obs = telemetry.observe_decode(ctc.decode_greedy(logits))
    decoded.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["n_lines"] == 100
    assert got["avg_confidence"] == pytest.approx(1.0, abs=1e-3)
    assert got["n_low_confidence"] == 0


class TestRtl:
    def test_pure_ltr_unchanged(self):
        assert rtl.reorder_line("hello world") == "hello world"

    def test_rtl_run_reversed(self):
        assert rtl.reorder_line("אבג") == "גבא"

    def test_mixed_runs(self):
        s = "ab אב cd"
        assert rtl.reorder_line(s) == "ab בא cd"

    def test_involution(self):
        s = "xالسyאבz"
        assert rtl.reorder_line(rtl.reorder_line(s)) == s

    def test_is_mostly_rtl(self):
        assert rtl.is_mostly_rtl("السلام")
        assert not rtl.is_mostly_rtl("hello")

    def test_spark_stage(self, spark):
        df = spark.createDataFrame(
            [(1, "ab אבג")], ["doc_id", "text"]
        )
        out = rtl.reorder_rtl(df).collect()[0]
        assert out["text"] == "ab גבא"


def test_binary_scan_and_crop_sink(spark, sf_dir):
    with tempfile.TemporaryDirectory() as d:
        # S1: folder of binary payloads
        for i in range(5):
            with open(os.path.join(d, f"doc-{i}.bin"), "wb") as f:
                f.write(b"IMG" + bytes([i]) * 10)
        scanned = images.scan_image_folder(spark, d)
        rows = {r["file_id"]: r for r in scanned.collect()}
        assert set(rows) == {f"doc-{i}" for i in range(5)}
        assert all(r["n_bytes"] == 13 for r in rows.values())
        assert bytes(rows["doc-3"]["payload"])[:3] == b"IMG"

        # S8: crop sink round trip
        spans = extract.extract_spans(
            corpus.spans_table(spark, sf_dir)
        ).filter(F.col("doc_id") < 10)
        crops = images.fake_crops(spans)
        out = os.path.join(d, "crops")
        images.write_line_crops(crops, out, n_buckets=4)
        back = images.read_line_crops(spark, out)
        assert back.count() == crops.count()
        joined = back.join(
            crops.select("doc_id", "line_id", F.col("crop").alias("orig")),
            ["doc_id", "line_id"],
        )
        assert joined.filter(F.col("crop") != F.col("orig")).count() == 0
        assert back.select("bucket").distinct().count() <= 4
