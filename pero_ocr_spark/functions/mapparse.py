"""ParseNet output-map parsing (L5, plus the L12-adjacent height
medians): baseline/height probability maps → line baselines + heights.

Re-expresses ``layout_engines/cnn_layout_engine.py:126-196`` (the
``parse`` method) with numpy-only kernels from ``imageproc``:

  channel layout (cnn_layout_engine.py:129-133):
    0 ascender-height map, 1 descender-height map, 2 baseline
    probability, 3 baseline endpoints, 4 region boundaries;

  chain: grey-dilate the height channels vertically (win 5) →
  optional 3×3 box smoothing of the baseline channel → VERTICAL
  non-maxima suppression (win 5) → threshold with endpoint penalty →
  vertical binary dilation (connection range) → 8-connected labeling
  masked back to the thin detections → per component: unique sorted x
  positions, ≤10 evenly-subsampled baseline points with ±2 endpoint
  compensation, per-channel median heights — everything scaled by the
  map's downsample factor.

The net itself is out of scope in this container; maps are
synthesized from geometry by the operator layer, which makes the
parsing chain (the part the reference implements in numpy/ndimage
too) exactly testable.
"""

from __future__ import annotations

import numpy as np

from pero_ocr_spark.functions import imageproc


def nonmaxima_suppression(x: np.ndarray, win: int = 5) -> np.ndarray:
    """Vertical NMS (cnn_layout_engine.py:374-386): keep values equal
    to their windowed column max."""
    return x * (x == imageproc.rolling_max(x, win, axis=0))


def parse_baseline_map(
    out_map: np.ndarray,
    downsample: int = 1,
    line_end_weight: float = 1.0,
    detection_threshold: float = 0.2,
    vertical_line_connection_range: int = 5,
    smooth_line_predictions: bool = True,
) -> tuple[list[np.ndarray], list[list[float]]]:
    """(H, W, 5) map → (baselines, heights) in full-resolution coords
    (cnn_layout_engine.py:126-196 semantics)."""
    heights_map = np.maximum(
        np.stack(
            [
                imageproc.rolling_max(out_map[:, :, 0], 5, axis=0),
                imageproc.rolling_max(out_map[:, :, 1], 5, axis=0),
            ],
            axis=2,
        ),
        0,
    )
    baselines_map = out_map[:, :, 2].astype(np.float64)
    if smooth_line_predictions:
        baselines_map = (
            imageproc._window_sum(imageproc._window_sum(baselines_map, 1, 0), 1, 1)
            / 9.0
        )
    baselines_map = nonmaxima_suppression(baselines_map, 5)
    detected = (
        baselines_map - line_end_weight * out_map[:, :, 3]
    ) > detection_threshold

    # structure = connection_range rows × 3 cols of ones
    dilated = imageproc._rolling_or(
        imageproc._rolling_or(detected, vertical_line_connection_range // 2, 0),
        1,
        1,
    )
    labels, n = imageproc.label_components(dilated, connectivity=8)
    labels = labels * detected

    b_list: list[np.ndarray] = []
    h_list: list[list[float]] = []
    ys, xs = np.nonzero(labels)
    labs = labels[ys, xs]
    order = np.argsort(labs, kind="stable")
    ys, xs, labs = ys[order], xs[order], labs[order]
    bounds = np.searchsorted(labs, np.arange(1, n + 2))
    for i in range(n):
        lo, hi = bounds[i], bounds[i + 1]
        if hi - lo <= 5:
            continue
        cy, cx = ys[lo:hi], xs[lo:hi]
        # first occurrence per unique x in row-major (y, x) scan order
        # — matches np.unique(pos_all[:, 0], return_index=True) on the
        # nonzero output (cnn_layout_engine.py:165-169); cy/cx kept
        # y-major by the stable label sort
        order_x = np.argsort(cx, kind="stable")
        ux, first = np.unique(cx[order_x], return_index=True)
        pos = np.stack(
            [ux.astype(np.float64), cy[order_x][first].astype(np.float64)],
            axis=1,
        )
        target = min(10, pos.shape[0] // 10)
        target = max(target, 2)
        sel = np.linspace(0, pos.shape[0] - 1, target).astype(np.int64)
        pos = pos[sel, :]
        pos[0, 0] -= 2  # endpoint-detection compensation
        pos[-1, 0] += 2
        hp = heights_map[cy, cx, :]
        h = [
            float(np.percentile(hp[:, 0], 50)),
            float(np.percentile(hp[:, 1], 50)),
        ]
        b_list.append(downsample * pos)
        h_list.append([downsample * h[0], downsample * h[1]])
    return b_list, h_list
