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


class TestAlphaShape:
    """L7: concave region retrace (layout_helpers.py:126-181 semantics)."""

    def _l_shaped_lines(self):
        # two stacks of textlines forming an L: a tall left column and a
        # short bottom bar reaching right
        lines = []
        for i in range(6):  # left column x:[0,40], y rows 0..170
            y = i * 30
            lines.append(np.array(
                [[0, y], [40, y], [40, y + 14], [0, y + 14]], dtype=float))
        for j in range(3):  # bottom bar x:[40,160], only lowest rows
            x = 40 + j * 40
            lines.append(np.array(
                [[x, 150], [x + 40, 150], [x + 40, 164], [x, 164]], dtype=float))
        return lines

    def test_concave_retrace_excludes_notch(self):
        lines = self._l_shaped_lines()
        poly = G.retrace_region(lines, concave=True)
        hull = G.retrace_region(lines)
        # the notch (upper right, far from any line) is inside the hull
        # but outside the alpha shape
        assert G.point_in_polygon(100.0, 90.0, hull)
        assert not G.point_in_polygon(100.0, 90.0, poly)
        # every textline vertex is covered
        for p in lines:
            for v in p:
                assert G.point_in_polygon(v[0], v[1], poly)
        # area strictly between the union floor and the hull
        assert G.polygon_area(poly) < G.polygon_area(hull)

    def test_small_cloud_falls_back_to_hull(self):
        pts = np.array([[0.0, 0.0], [10.0, 0.0], [5.0, 8.0]])
        poly = G.alpha_shape(pts, alpha=100.0)
        assert len(poly) == 3

    def test_tight_alpha_falls_back_to_hull(self):
        lines = self._l_shaped_lines()
        pts = np.concatenate(lines)
        # alpha smaller than any circumradius -> no kept triangles -> hull
        poly = G.alpha_shape(pts, alpha=0.5)
        assert G.polygon_area(poly) == G.polygon_area(G.convex_hull(pts))

    def test_delaunay_covers_cloud(self):
        rng = np.random.default_rng(3)
        pts = rng.uniform(0, 100, size=(40, 2))
        tris = G.delaunay(pts)
        # triangulation area == hull area (a Delaunay triangulation
        # tiles the convex hull exactly)
        t = pts[tris]
        area = np.abs(
            (t[:, 1, 0] - t[:, 0, 0]) * (t[:, 2, 1] - t[:, 0, 1])
            - (t[:, 1, 1] - t[:, 0, 1]) * (t[:, 2, 0] - t[:, 0, 0])
        ).sum() / 2
        assert abs(area - G.polygon_area(G.convex_hull(pts))) < 1e-6
