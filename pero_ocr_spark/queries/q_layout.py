"""Layout-engine queries (SURVEY §2.2): detection, clustering, geometry, reading order.

Split out of the monolithic queries.py (round 5); the package
__init__ imports tier modules in dependency order, so registration
order is deterministic and the registry machinery lives in _base.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pero_ocr_spark import corpus
from pero_ocr_spark.operators import extract
from pero_ocr_spark.queries._base import (  # noqa: F401
    QueryFn, _EXTRACTED_CTE, _REGISTRY, _scratch, _t, register,
)
from pero_ocr_spark.queries._ctes import _LINES_CTE  # noqa: F401


@register(
    "layout_textline_polygons",
    _LINES_CTE
    + """
SELECT doc_id, line_id, x0 AS px0, y - 10 AS py0, x1 AS px1, y + 4 AS py1
FROM lines
""",
)
def q_layout_textline_polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import layout

    return layout.textline_polygons(layout.lines_table(spark, sf_dir))


@register(
    "layout_region_retrace",
    _LINES_CTE
    + """
SELECT doc_id, region_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(min(x0), 4) AS x0, round(min(y) - 10, 4) AS y0,
       round(max(x1), 4) AS x1, round(max(y) + 4, 4) AS y1
FROM lines WHERE ord < 60 AND doc_id % 4 = 0
GROUP BY doc_id, region_id
""",
)
def q_layout_region_retrace(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L16/L7 through the external gate: the alpha-shape region retrace
    # runs for real in the Arrow stage, and the oracle checks its
    # closed-form invariant — the retraced polygon's vertices are a
    # subset of the textline vertices while covering all of them, so
    # its bbox must equal the member-rectangle bbox exactly. Interior
    # shape is pinned by the geometry pytests (Delaunay alpha shape vs
    # the executed reference on fixtures).
    from pero_ocr_spark.operators import layout

    # ord < 60 bounds lines-per-region (same fixture bound as
    # layout_cluster_lines): the 64x-skewed docs would otherwise hand
    # the O(n^2) Delaunay kernel 10k+-point regions — at scale the
    # operator runs AFTER region segmentation, where region size is
    # physically bounded by the page
    # doc_id % 4 = 0: a deterministic quarter of the corpus — the
    # external invariant check doesn't need every page, the kernel's
    # correctness is page-local
    return layout.retrace_regions(
        layout.lines_table(spark, sf_dir).filter(
            (F.col("ord") < 60) & (F.col("doc_id") % 4 == 0)
        )
    )


@register(
    "layout_merge_lines",
    _LINES_CTE
    + """
, widths AS (
  SELECT doc_id, region_id, ord, max(x1) - min(x0) AS w
  FROM lines GROUP BY doc_id, region_id, ord)
SELECT doc_id, region_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(sum(w), 4) AS total_width
FROM widths GROUP BY doc_id, region_id
""",
)
def q_layout_merge_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import layout

    merged = layout.merge_lines_stage(layout.lines_table(spark, sf_dir))
    return merged.groupBy("doc_id", "region_id").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.round(F.sum(F.col("x1") - F.col("x0")), 4).alias("total_width"),
    )


@register(
    "layout_assign_lines",
    _LINES_CTE
    + """
, regions AS (
  SELECT doc_id, region_id AS rid,
         min(x0) AS rx0,
         min(x0) + 0.8 * (max(x1) - min(x0)) AS rx1,
         min(y) - 15 AS ry0, max(y) + 15 AS ry1
  FROM lines GROUP BY doc_id, region_id)
SELECT l.doc_id, l.line_id, r.rid AS region_id,
       round(greatest(l.x0, r.rx0), 4) AS cx0,
       round(least(l.x1, r.rx1), 4) AS cx1,
       l.y
FROM lines l JOIN regions r
  ON l.doc_id = r.doc_id
 AND l.x0 < r.rx1 AND r.rx0 < l.x1
 AND l.y - 10 < r.ry1 AND r.ry0 < l.y + 4
WHERE least(l.x1, r.rx1) > greatest(l.x0, r.rx0)
""",
)
def q_layout_assign_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import layout

    lines = layout.lines_table(spark, sf_dir)
    regions = layout.regions_table(spark, sf_dir).select(
        "doc_id",
        "region_id",
        "rx0",
        (F.col("rx0") + 0.8 * (F.col("rx1") - F.col("rx0"))).alias("rx1"),
        "ry0",
        "ry1",
    )
    out = layout.assign_lines_to_regions(lines, regions)
    return out.select(
        "doc_id",
        "line_id",
        "region_id",
        F.round("cx0", 4).alias("cx0"),
        F.round("cx1", 4).alias("cx1"),
        "y",
    )


_REGION_ORDER_ORACLE = (
    _LINES_CTE
    + """
, regions AS (
  SELECT doc_id, region_id, min(y) - 15 AS ry0
  FROM lines GROUP BY doc_id, region_id)
SELECT doc_id, region_id,
       CAST(row_number() OVER (
         PARTITION BY doc_id ORDER BY ry0, region_id) - 1 AS BIGINT)
         AS reading_order
FROM regions
"""
)


@register("layout_reading_order_bands", _REGION_ORDER_ORACLE)
def q_layout_reading_order_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import layout

    return layout.region_reading_order(
        layout.regions_table(spark, sf_dir), mode="band"
    )


@register("layout_reading_order_xycut", _REGION_ORDER_ORACLE)
def q_layout_reading_order_xycut(spark: SparkSession, sf_dir: str) -> DataFrame:
    # full SmartRegionSorter semantics (round-5): coupling order via
    # geometry.smart_sort_order + the dominant-baseline-tilt
    # pre-rotation estimated per doc from the lines frame (0 on this
    # corpus's flat synthetic baselines, so the oracle — untilted
    # reading order — still pins the result; the tilted path is
    # pinned by tests/test_geometry.py::TestSmartSortOrder)
    from pero_ocr_spark.operators import layout

    return layout.region_reading_order(
        layout.regions_table(spark, sf_dir),
        mode="xycut",
        lines=layout.lines_table(spark, sf_dir),
    )


# ---------------------------------------------------------------------------
# L8 — projection-profile line detection over RENDERED page bitmaps
# (simple_baseline_engine.py:13-101 in numpy): threshold → row-ink
# projection → autocorrelation period → −diff peaks = baselines →
# stride-3 component scan heights. The renderer draws a 10-row ink band
# above each baseline, so the detector's output is closed-form: baseline
# at y spanning the region bbox, heights [12, 3].
# ---------------------------------------------------------------------------


@register(
    "layout_detect_lines",
    _LINES_CTE
    + """
, page AS (SELECT * FROM lines WHERE ord < 60)
, regions AS (
  SELECT doc_id, region_id, min(x0) AS rx0, max(x1) AS rx1
  FROM page GROUP BY doc_id, region_id)
SELECT DISTINCT l.doc_id, l.region_id,
       r.rx0 AS bx0, r.rx1 AS bx1, l.y,
       12.0 AS height_up, 6.0 AS height_down
FROM page l
JOIN regions r ON l.doc_id = r.doc_id AND l.region_id = r.region_id
""",
)
def q_layout_detect_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one physical "page" = the first 60 ords of a document (synthetic
    # docs can have 1000+ spans; a raster that tall is not a page and
    # needlessly shuffles tens of MB per row)
    from pero_ocr_spark.operators import layout, linedet

    # fused render+detect: the raster and the per-region bboxes both
    # derive from the same lines frame inside ONE per-doc Arrow stage —
    # no bitmap transfer, no second pipeline run, no persist needed.
    # downsample 2: the reference engines run downsampled by default;
    # the stride-3 height scans quantize to [12, 6] at this resolution
    lines = layout.lines_table(spark, sf_dir).filter(F.col("ord") < 60)
    return linedet.render_detect_lines(lines, downsample=2)


# ---------------------------------------------------------------------------
# L2 — CV region segmentation over the same bitmaps (threshold →
# vertical close → margin dilation → connected components,
# simple_region_engine.py:48-137 in numpy). Closed form: one component
# per text column with bbox = ink bbox ± margin (5), close restoring
# exact vertical extents. L18 — snap jittered baselines to the smoothed
# y-gradient (adjust_baselines_to_intensity): on a 0/255 render the
# blurred edge gradient peaks one row below the last ink row, so every
# baseline lands at y+1 regardless of jitter.
# ---------------------------------------------------------------------------


@register(
    "layout_parse_maps",
    _LINES_CTE
    + """
, page AS (
  SELECT doc_id,
         CAST(x0 AS BIGINT) // 2 AS x0d,
         CAST(x1 AS BIGINT) // 2 AS x1d, y
  FROM lines WHERE ord < 60)
SELECT doc_id,
       2.0 * (x0d - 2) AS bx0,
       2.0 * (x1d + 1) AS bx1,
       y - 2 AS y,
       10.0 AS height_up, 4.0 AS height_down,
       CAST(greatest(least(10, (x1d - x0d) // 10), 2) AS BIGINT) AS n_points
FROM page
WHERE x1d - x0d >= 2
""",
)
def q_layout_parse_maps(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L5: ParseNet-map parsing (NMS → threshold → dilate → 8-conn CC →
    # subsampled baselines + median heights) over maps synthesized at
    # downsample 2. Closed form: baseline spans [2(x0//2 - 2),
    # 2(x1//2 + 1)] at y-2 (3-row smoothed band, first-occurrence row),
    # heights [10, 4], components below 2 downsampled columns dropped
    # by the reference's >5-pixel floor.
    from pero_ocr_spark.operators import layout, linedet

    lines = layout.lines_table(spark, sf_dir).filter(F.col("ord") < 60)
    return linedet.parse_lines_from_maps(
        lines.select("doc_id", "x0", "x1", "y")
    )


@register(
    "layout_refine_baselines",
    _LINES_CTE
    + """
, page AS (
  SELECT doc_id, line_id, ord, x0, x1, y
  FROM lines WHERE ord < 60 AND ord % 5 <> 4)
SELECT doc_id, line_id,
       x0 AS x_first,
       x1 - 2 AS x_last,
       round(y + (3 * (ord % 5) + 1) / 31.0, 6) AS y_refined,
       CAST(least(10, CAST(round(greatest(2.0, ((x1 - x0) / 2 - 1) / 7.0))
                           AS BIGINT)) AS BIGINT) AS n_points
FROM page
""",
)
def q_layout_refine_baselines(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L13: jittered baselines (y ± 2 by ord, like the snap query) refit
    # against the synthesized detection channel. Closed form on the
    # synthetic maps (ds=2, heights 10/4 → crop tolerance 3.5, 32-row
    # crop): the weighted deg-3 fit collapses to the response's
    # positional-weighted mean row, so the refined y lands at
    # y + (3·(ord%5)+1)/31 for jitter j=ord%5-2, the refined x spans
    # [x0, x1-2] (the crop grid's exact endpoints), and the point count
    # is the reference's min(10, round(max(2, line_length/(2·tol)))).
    # Split halves (ord%5==4) are excluded: their half-integer
    # downsampled x bounds make the crop's column phase line-specific
    # (not SQL-expressible); the snap/crop queries cover those lines.
    from pero_ocr_spark.operators import layout, linedet

    lines = layout.lines_table(spark, sf_dir).filter(
        (F.col("ord") < 60) & (F.col("ord") % 5 != 4)
    )
    jittered = lines.select(
        "doc_id",
        "line_id",
        "x0",
        "x1",
        "y",
        "asc",
        "desc",
        (F.col("y") + (F.col("ord") % 5) - 2).alias("y_in"),
    )
    refined = linedet.refine_lines_from_maps(jittered, downsample=2)
    return refined.select(
        "doc_id",
        "line_id",
        "x_first",
        "x_last",
        F.round("y_refined", 6).alias("y_refined"),
        "n_points",
    )


@register(
    "layout_detect_multi_orientation",
    _LINES_CTE
    + """
, hseg AS (
  SELECT doc_id, x0 AS a0, x1 AS a1, y AS pos
  FROM lines WHERE ord < 60 AND region_id = 'r0')
, vseg AS (
  SELECT doc_id, x0 - 500 AS a0, x1 - 500 AS a1,
         530 + (ord // 2) * 30 AS pos
  FROM lines WHERE ord < 30 AND region_id = 'r1')
, hr AS (SELECT doc_id, min(a0) AS mn, max(a1) AS mx FROM hseg GROUP BY doc_id)
, vr AS (SELECT doc_id, min(a0) AS mn, max(a1) AS mx FROM vseg GROUP BY doc_id)
SELECT h.doc_id, 'h' AS region_id, CAST(0 AS BIGINT) AS orientation,
       r.mn AS bx0, h.pos AS by0, r.mx AS bx1, h.pos AS by1,
       12.0 AS height_up, 6.0 AS height_down
FROM (SELECT DISTINCT doc_id, pos FROM hseg) h
JOIN hr r ON h.doc_id = r.doc_id
UNION ALL
SELECT v.doc_id, 'v' AS region_id, CAST(1 AS BIGINT) AS orientation,
       v.pos AS bx0, r.mn AS by0, v.pos AS bx1, r.mx AS by1,
       12.0 AS height_up, 6.0 AS height_down
FROM (SELECT DISTINCT doc_id, pos FROM vseg) v
JOIN vr r ON v.doc_id = r.doc_id
""",
)
def q_layout_detect_multi_orientation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L10: one page carries horizontal text (r0 columns) AND vertical
    # text (r1 lines re-laid as vertical bands at cols >= 510); the
    # union of the orientation-0 and orientation-1 (transposed-frame)
    # detection passes recovers both sets in page coordinates.
    from pero_ocr_spark.operators import layout, linedet

    lines = layout.lines_table(spark, sf_dir)
    hseg = lines.filter((F.col("ord") < 60) & (F.col("region_id") == "r0")).select(
        "doc_id",
        F.lit(0).cast("long").alias("orientation"),
        F.col("x0").alias("a0"),
        F.col("x1").alias("a1"),
        F.col("y").alias("pos"),
    )
    vseg = lines.filter((F.col("ord") < 30) & (F.col("region_id") == "r1")).select(
        "doc_id",
        F.lit(1).cast("long").alias("orientation"),
        (F.col("x0") - 500).alias("a0"),
        (F.col("x1") - 500).alias("a1"),
        (F.lit(530) + (F.col("ord") / 2).cast("long") * 30)
        .cast("double")
        .alias("pos"),
    )
    # fused render+detect (both orientation passes in one Arrow stage;
    # per-orientation bboxes derive from the segments in-stage)
    segments = hseg.unionByName(vseg)
    return linedet.render_detect_multi_orientation(segments, downsample=2)


@register(
    "layout_cluster_lines",
    _LINES_CTE
    + """
, keep AS (
  SELECT * FROM lines
  WHERE ord < 60 AND line_id NOT LIKE '%a' AND line_id NOT LIKE '%b')
, seq AS (
  SELECT doc_id, region_id, line_id, y,
         lag(y) OVER (PARTITION BY doc_id, region_id ORDER BY y) AS py
  FROM keep)
, isl AS (
  -- components break where rows are non-consecutive (candidate
  -- dilation can't bridge a 60px gap) or a separator row sits in the
  -- checked band (rows with index % 4 == 3 emit one 20px below)
  SELECT doc_id, region_id, line_id, y,
         sum(CASE WHEN py IS NULL OR y - py <> 30
                    OR CAST((py - 20) / 30 AS BIGINT) % 4 = 3
             THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id, region_id ORDER BY y) AS island
  FROM seq)
SELECT i.doc_id, i.line_id, m.y0 AS cluster_y0, m.sz AS cluster_size
FROM isl i
JOIN (SELECT doc_id, region_id, island, min(y) AS y0,
             CAST(count(*) AS BIGINT) AS sz
      FROM isl GROUP BY doc_id, region_id, island) m
  ON i.doc_id = m.doc_id AND i.region_id = m.region_id
 AND i.island = m.island
""",
)
def q_layout_cluster_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L6 graph variant: dilated-bbox candidates + separator-map
    # penalties + connected components; split-line halves are excluded
    # (zero x-overlap with each other would isolate single-row islands
    # nondeterministically vs the SQL island model)
    from pero_ocr_spark.operators import layout, linedet

    lines = layout.lines_table(spark, sf_dir).filter(
        (F.col("ord") < 60)
        & ~F.col("line_id").endswith("a")
        & ~F.col("line_id").endswith("b")
    )
    return linedet.cluster_lines_graph(lines)


@register(
    "line_crops",
    _LINES_CTE
    + """
SELECT doc_id, line_id,
       CAST(32 AS BIGINT) AS crop_h,
       CAST(floor((x1 - x0 - 1) * (32.0 / 14.0)) AS BIGINT) AS crop_w
FROM lines WHERE ord < 60
""",
)
def q_line_crops(spark: SparkSession, sf_dir: str) -> DataFrame:
    # R1: real numpy rectification warp over the page rasters; the
    # oracle checks the crop geometry (arc length × height scale);
    # pixel content is pytest-verified (tests/test_cropper.py)
    from pero_ocr_spark.operators import layout, linedet

    lines = layout.lines_table(spark, sf_dir).filter(F.col("ord") < 60)
    # fused render+warp; with_pixels=False keeps the crop strips inside
    # the stage (this query checks geometry only)
    return linedet.render_crop_lines(lines, with_pixels=False).select(
        "doc_id", "line_id", "crop_h", "crop_w"
    )


@register(
    "layout_segment_regions",
    _LINES_CTE
    + """
, page AS (SELECT * FROM lines WHERE ord < 60)
, ys AS (
  SELECT doc_id, region_id, y,
         lag(y) OVER (PARTITION BY doc_id, region_id ORDER BY y) AS prev_y
  FROM (SELECT DISTINCT doc_id, region_id, y FROM page))
, isl AS (
  -- gaps-and-islands: ink bands merge iff the next baseline is within
  -- 37 rows (band gap <= 2*close_gap = 26; larger gaps are unbridged
  -- since the margin dilation only spans 10)
  SELECT doc_id, region_id, y,
         sum(CASE WHEN prev_y IS NULL OR y - prev_y > 37 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id, region_id ORDER BY y) AS island
  FROM ys)
, comp AS (
  -- working resolution ds=2: close_gap 7 / margin 3 on img[::2,::2];
  -- bboxes scale back by 2 (x bounds snap to the even-pixel grid)
  SELECT p.doc_id,
         2 * ((CAST(min(p.x0) AS BIGINT) + 1) // 2 - 3) AS rx0,
         min(p.y) - 16 AS ry0,
         2 * ((CAST(max(p.x1) AS BIGINT) - 1) // 2 + 3) AS rx1,
         max(p.y) + 6 AS ry1
  FROM page p
  JOIN isl i ON p.doc_id = i.doc_id
            AND p.region_id = i.region_id AND p.y = i.y
  GROUP BY p.doc_id, p.region_id, i.island)
SELECT doc_id,
       CAST(row_number() OVER (
         PARTITION BY doc_id ORDER BY rx0, ry0) - 1 AS BIGINT) AS region_idx,
       CAST(rx0 AS BIGINT) AS rx0, CAST(ry0 AS BIGINT) AS ry0,
       CAST(rx1 AS BIGINT) AS rx1, CAST(ry1 AS BIGINT) AS ry1
FROM comp
""",
)
def q_layout_segment_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import layout, linedet

    lines = layout.lines_table(spark, sf_dir).filter(F.col("ord") < 60)
    # fused render+segment — the raster never leaves the Arrow stage
    return linedet.render_segment_regions(
        lines, close_gap=7, margin=3, min_pixels=25, downsample=2
    )


@register(
    "layout_snap_baselines",
    _LINES_CTE
    + """
SELECT doc_id, line_id, y + 1.0 AS y_snapped
FROM lines WHERE ord < 60
""",
)
def q_layout_snap_baselines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import layout, linedet

    lines = layout.lines_table(spark, sf_dir).filter(F.col("ord") < 60)
    # fused render+snap: the raster renders from the TRUE y, the
    # vectorized batch kernel snaps the jittered y — one Arrow stage
    jittered = lines.select(
        "doc_id",
        "line_id",
        "x0",
        "x1",
        "y",
        (F.col("y") + (F.col("ord") % 5) - 2).alias("y_jit"),
    )
    return linedet.render_snap_baselines(jittered)


@register(
    "layout_postprocess",
    _LINES_CTE
    + """
, r AS (
  SELECT doc_id, region_id, min(x0) AS rx0, max(x1) AS rx1
  FROM lines GROUP BY doc_id, region_id)
SELECT l.doc_id, l.line_id,
       greatest(r.rx0, l.x0 - 20) AS sx0,
       least(r.rx1, l.x1 + 20) AS sx1,
       round(greatest(r.rx0, l.x0 - 20)
             + 4 * (least(r.rx1, l.x1 + 20)
                    - greatest(r.rx0, l.x0 - 20)) / 9.0, 6) AS x_p5,
       l.y AS y,
       CAST(10 AS BIGINT) AS n_pts,
       row_number() OVER (
         PARTITION BY l.doc_id, l.region_id
         ORDER BY l.x1 - l.x0 DESC, l.y, l.x0) = 1 AS is_dominant
FROM lines l
JOIN r ON l.doc_id = r.doc_id AND l.region_id = r.region_id
""",
)
def q_layout_postprocess(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L15 resample + L17 stretch/dominant through the REAL numpy
    # kernels; the oracle is the closed form for straight baselines
    # (stretch clamps to region bounds, deg-1 resample keeps y, the
    # 5th of 10 linspace points sits at sx0 + 4/9 of the span)
    from pero_ocr_spark.operators import layout

    return layout.postprocess_lines(layout.lines_table(spark, sf_dir))


@register(
    "image_folder_scan",
    """
SELECT CAST(doc_id AS VARCHAR) AS file_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes
FROM documents WHERE doc_id < 64
""",
)
def q_image_folder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S1: spark.read.format("binaryFile") folder scan round trip over a
    # BOUNDED deterministic sample (64 files — the operator's unit is
    # the folder scan, not corpus scale; the corpus-scale path is the
    # parquet/iceberg table). Payload = utf-8 text; the oracle's
    # strlen() is DuckDB's byte length, exact for any content.
    import os

    from pero_ocr_spark.sources import images

    folder = _scratch("image_folder")
    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 64)
        .select("doc_id", "text")
        .collect()
    )
    for r in docs:
        with open(os.path.join(folder, f"{r['doc_id']}.bin"), "wb") as f:
            f.write(r["text"].encode("utf-8"))
    return images.scan_image_folder(spark, folder, glob="*.bin").select(
        "file_id", "n_bytes"
    )


@register(
    "layout_adaptive_downsample",
    """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0
              THEN CAST(160 + (doc_id % 3) * 40 AS DOUBLE)
              ELSE CAST(20 + (doc_id % 7) * 8 AS DOUBLE) END AS h,
         CASE WHEN doc_id % 13 = 0 THEN 8.0 ELSE 4.0 END AS ds0,
         doc_id % 11 = 0 AS sparse
  FROM documents),
c AS (
  SELECT doc_id, h, ds0, sparse,
         h / ds0 AS med,
         greatest(1.0, least(8.0, ds0 * ((h / ds0) / 12.0))) AS ds2
  FROM d)
SELECT doc_id,
       CASE WHEN sparse THEN ds0
            WHEN med >= 9 AND med <= 15 THEN ds0
            WHEN ds2 / ds0 < 0.8 OR ds2 / ds0 > 1.2 THEN round(ds2, 6)
            ELSE ds0 END AS ds,
       CAST(CASE WHEN sparse THEN 1
                 WHEN med >= 9 AND med <= 15 THEN 1
                 WHEN ds2 / ds0 < 0.8 OR ds2 / ds0 > 1.2 THEN 2
                 ELSE 1 END AS BIGINT) AS n_runs
FROM c
""",
)
def q_layout_adaptive_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L4: the control loop converges per doc. Heights 20..68 at ds0=4:
    # in-band (36-60) keep the first pass, out-of-band rerun at h/12
    # (clamped, ±20% gate). doc_id % 13 == 0 docs start at ds0=8 with
    # h >= 160 (med > 15): the correction clamps to max_downsample=8,
    # ratio 1.0 — the gate KEEPS the first pass, so deleting the gate
    # flips these to 2 runs and fails the oracle. Sparse maps
    # (doc_id % 11 == 0) skip adaptation entirely.
    from pero_ocr_spark.operators import linedet

    big = F.col("doc_id") % 13 == 0
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(big, 160 + (F.col("doc_id") % 3) * 40)
        .otherwise(20 + (F.col("doc_id") % 7) * 8)
        .cast("double")
        .alias("line_h"),
        (F.col("doc_id") % 11 == 0).alias("sparse"),
        F.when(big, 8.0).otherwise(4.0).alias("ds0"),
    )
    return linedet.adaptive_resolution_stage(d)
