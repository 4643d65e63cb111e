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


def median_line_height(out_map: np.ndarray, detection_threshold: float = 0.2) -> float:
    """Median ascender height over detected baseline pixels
    (torch_parsenet.get_med_height:95-101)."""
    heights = (
        out_map[:, :, 2] > detection_threshold
    ).astype(float) * out_map[:, :, 0]
    vals = heights[heights > 0]
    return float(np.median(vals)) if len(vals) else 0.0


def get_maps_with_optimal_resolution(
    map_fn,
    img_shape: tuple[int, int],
    downsample: float = 4,
    max_megapixels: float = 5,
    detection_threshold: float = 0.2,
    adaptive_downsample: bool = True,
    pixel_adapt_threshold: int = 100,
    min_line_height: float = 9,
    max_line_height: float = 15,
    optimal_line_height: float = 12,
    min_downsample: float = 1,
    max_downsample: float = 8,
) -> tuple[np.ndarray, float]:
    """L4: memory-safe adaptive downsampling
    (torch_parsenet.get_maps_with_optimal_resolution:60-93): run at
    the default/memory-capped factor, measure the median detected line
    height, and re-run at a corrected factor when heights fall outside
    the net's sweet spot (a >±20% change gate avoids needless reruns).
    ``map_fn(downsample) -> (H, W, 5) map`` abstracts the net forward
    pass (or the synthetic map renderer here)."""
    mp_floor = np.sqrt((img_shape[0] * img_shape[1]) / (max_megapixels * 10e5))
    first = max(downsample, mp_floor)
    out_map = map_fn(first)
    if not adaptive_downsample:
        return out_map, first
    if (out_map[:, :, 2] > detection_threshold).sum() > pixel_adapt_threshold:
        med = median_line_height(out_map, detection_threshold)
        if med > max_line_height or med < min_line_height:
            second = first * (med / optimal_line_height)
            second = min(max(second, min_downsample), max_downsample)
            second = max(second, mp_floor)
            if second / first < 0.8 or second / first > 1.2:
                return map_fn(second), second
    return out_map, first


_POSITIONAL_CACHE: dict = {}


def _positional_prior(bs_pos: int, target_height: int) -> np.ndarray:
    """Memoized triangular positional prior (up-ramp to the expected
    baseline row, down-ramp after) — constant per (bs_pos,
    target_height), rebuilt per line otherwise. Read-only."""
    key = (bs_pos, target_height)
    p = _POSITIONAL_CACHE.get(key)
    if p is None:
        p = np.concatenate(
            [
                np.linspace(0, 1.0, bs_pos),
                np.linspace(1.0, 0, target_height - bs_pos),
            ]
        )
        p.flags.writeable = False
        if len(_POSITIONAL_CACHE) < 4096:
            _POSITIONAL_CACHE[key] = p
    return p


def refine_baseline(
    baseline: np.ndarray,
    heights: tuple[float, float],
    out_map: np.ndarray,
    downsample: float = 1,
    target_height: int = 32,
    detection_threshold: float = 0.3,
) -> np.ndarray:
    """L13: refine a baseline against the baseline-detection channel
    (``layout_engines/baseline_refiner.py:8-68`` semantics, numpy-only):

      crop the detection map (channel 2) along the input line with
      vertical tolerance (asc+desc)/(2·ds) using the rectification
      grid → zero sub-threshold responses → fit a deg-3 polynomial to
      the response pixels, weighted by response × a triangular
      positional prior peaking at the expected baseline row → trim to
      the x-range where the fitted curve still sits on response ≥
      threshold (±10 px slack) → re-emit ≤10 points along the fit,
      mapped back to page coordinates through the crop's forward grid.

    Any failure (empty crop, degenerate fit) returns the input
    baseline unchanged, like the reference's except-branch.
    """
    from pero_ocr_spark.functions import cropper

    bl_in = np.asarray(baseline, dtype=np.float64)
    # accept either the full (H, W, 5) map or just the detection
    # channel — callers refining many lines should pass a float64 2-D
    # channel once (per-line full-map conversions dominate otherwise)
    det = out_map if out_map.ndim == 2 else out_map[:, :, 2]
    try:
        bl = bl_in / downsample
        tol = (heights[0] + heights[1]) / (2 * downsample)
        grid = cropper.get_crop_inputs(bl, (tol, tol), target_height)
        line_crop = cropper.bilinear_remap_float(det, grid)
        line_crop[line_crop < detection_threshold] = 0
        rows, cols = np.where(line_crop)
        if len(rows) == 0:
            return bl_in

        bs_pos = int(
            np.round(target_height * heights[0] / (heights[0] + heights[1]))
        )
        positional = _positional_prior(bs_pos, target_height)
        weights = line_crop[rows, cols] * positional[rows]
        fit = np.poly1d(np.polyfit(cols, rows, 3, w=weights))

        xs = np.arange(line_crop.shape[1])
        ys = np.round(
            np.clip(fit(xs), 0, line_crop.shape[0] - 1)
        ).astype(int)
        on_line = line_crop[ys, xs] >= detection_threshold
        xs = xs[on_line]
        if len(xs) == 0:
            return bl_in
        min_x = max(int(xs.min()) - 10, 0)
        max_x = min(int(xs.max()) + 10, line_crop.shape[1] - 1)

        line_length = (
            grid[bs_pos, np.clip(max_x, 0, grid.shape[1] - 1), 0]
            - grid[bs_pos, np.clip(min_x, 0, grid.shape[1] - 1), 0]
        )
        num_steps = int(
            np.minimum(
                10, int(np.round(np.maximum(2, line_length / (tol * 2))))
            )
        )
        new_x = np.linspace(min_x, max_x, num_steps)
        new_y = np.round(fit(new_x)).astype(int)
        new_x = np.round(new_x).astype(int)
        new_y = np.clip(new_y, 0, grid.shape[0] - 1)
        new_x = np.clip(new_x, 0, grid.shape[1] - 1)
        return (
            np.stack([grid[new_y, new_x, 0], grid[new_y, new_x, 1]], axis=1)
            * downsample
        )
    except (ValueError, IndexError, ZeroDivisionError, np.linalg.LinAlgError):
        return bl_in


def _median50(a: np.ndarray) -> float:
    """Exactly np.percentile(a, 50, method='linear') — a[lo] +
    0.5*(a[hi]-a[lo]) on the sorted values — without the generic
    percentile machinery, whose per-call overhead dominates when it
    runs twice per connected component on a page. The even case
    replicates numpy's _lerp branch for t >= 0.5 — b - (b-a)·0.5, NOT
    a + (b-a)·0.5 — which is what np.percentile actually evaluates at
    the midpoint (fuzz-pinned bit-equal on float32 and float64)."""
    a = np.sort(a)
    n = a.size
    lo = (n - 1) // 2
    if n % 2:
        return float(a[lo])
    b_, a_ = a[lo + 1], a[lo]
    return float(b_ - (b_ - a_) * 0.5)


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
        h = [_median50(hp[:, 0]), _median50(hp[:, 1])]
        b_list.append(downsample * pos)
        h_list.append([downsample * h[0], downsample * h[1]])
    return b_list, h_list
