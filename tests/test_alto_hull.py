"""ALTO word-box export (S6) and convex-hull region retrace (L16)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pero_ocr_spark import corpus
from pero_ocr_spark.functions import geometry as G
from pero_ocr_spark.operators import extract
from pero_ocr_spark.sources import alto


class TestWordBoxes:
    def test_single_word(self):
        boxes = alto.word_boxes("spark")
        assert len(boxes) == 1
        assert boxes[0]["content"] == "spark"
        assert boxes[0]["hpos"] == 0
        assert boxes[0]["width"] > 0
        assert 0.9 < boxes[0]["confidence"] <= 1.0

    def test_two_words_non_overlapping(self):
        boxes = alto.word_boxes("ab cd")
        assert [b["content"] for b in boxes] == ["ab", "cd"]
        assert boxes[1]["hpos"] >= boxes[0]["hpos"] + boxes[0]["width"]

    def test_empty(self):
        assert alto.word_boxes("") == []
        assert alto.word_boxes("   ") == []


def test_export_alto(spark, sf_dir):
    spans = extract.extract_spans(corpus.spans_table(spark, sf_dir)).filter(
        F.col("doc_id") < 5
    )
    out = {r["doc_id"]: r["xml"] for r in alto.export_alto(spans).collect()}
    assert len(out) == 5
    x = out[1]
    assert x.startswith('<?xml version="1.0"')
    assert "<String CONTENT=" in x and 'WC="' in x
    # deterministic
    out2 = {r["doc_id"]: r["xml"] for r in alto.export_alto(spans).collect()}
    assert out == out2


class TestConvexHull:
    def test_square(self):
        pts = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [1, 1]])
        hull = G.convex_hull(pts)
        assert len(hull) == 4
        assert {tuple(p) for p in hull} == {(0, 0), (2, 0), (2, 2), (0, 2)}

    def test_collinear(self):
        pts = np.array([[0, 0], [1, 1], [2, 2]])
        hull = G.convex_hull(pts)
        assert len(hull) <= 2 or G.polygon_area(hull) == 0

    def test_retrace_region_covers_lines(self):
        l1 = G.baseline_to_textline(np.array([[0.0, 20.0], [50.0, 20.0]]), 10, 4)
        l2 = G.baseline_to_textline(np.array([[5.0, 50.0], [60.0, 50.0]]), 10, 4)
        region = G.retrace_region([l1, l2])
        x0, y0, x1, y1 = G.bbox(region)
        assert abs(x0) < 1e-9 and x1 == 60.0
        assert y0 == 10.0 and y1 == 54.0
        assert G.polygon_area(region) > 0
