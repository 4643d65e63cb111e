"""Line-crop rectification (R1) — numpy only.

Re-expresses the reference's EngineLineCropper
(``core/crop_engine.py:16-121``): build a (target_height, W, 2)
source-coordinate grid along the (possibly tilted/curved) baseline —
rotate to the baseline frame, interpolate the baseline, arc-length
resample, walk the normals over the height range, rotate back — then
sample the page image bilinearly at the grid (the cv2.remap step).

Deviations (documented): baseline interpolation is linear (np.interp)
instead of scipy cubic — identical for the 2-point baselines that
dominate, and the reference itself falls back to linear for short
baselines (crop_engine.py:68-70); remap border handling is
clamp-to-edge.
"""

from __future__ import annotations

import math

import numpy as np


_V_CACHE: dict = {}


def _height_steps(heights: tuple[float, float], target_height: int) -> np.ndarray:
    """Memoized np.linspace(-asc, desc, target_height) column — constant
    per (heights, target_height), rebuilt per line otherwise (a measured
    ~10% of the refine kernel). Read-only so sharing is safe."""
    key = (float(heights[0]), float(heights[1]), target_height)
    v = _V_CACHE.get(key)
    if v is None:
        v = np.linspace(-heights[0], heights[1], target_height).reshape(-1, 1)
        v.flags.writeable = False
        if len(_V_CACHE) < 4096:
            _V_CACHE[key] = v
    return v


def get_crop_inputs(
    baseline: np.ndarray, heights: tuple[float, float], target_height: int
) -> np.ndarray:
    """(target_height, W, 2) source-pixel coordinate grid
    (crop_engine.py:54-101 semantics, linear interpolation).

    Straight 2-point baselines on dyadic half-integer coordinates (the
    dominant case everywhere in the engine: page coords are integers,
    the refiner divides by downsample 2) take a closed-form fast path
    that is BIT-IDENTICAL to the general pipeline: with alfa == 0 the
    interpolated line is exactly horizontal (zero slope makes every
    np.interp result the exact endpoint value), every arc segment is
    exactly 1.0, the tangent is exactly (0.1, 0) so nx == -0.0 and
    ny == 1.0, and out_x == left + t bit-for-bit BECAUSE left + j is
    exact for half-integer left (np.interp computes (left+j) + (t-j),
    both addends exact — Sterbenz for t−j — so both forms round the
    same exact sum once). Fuzz-pinned against the retained general
    path (:func:`_crop_grid_general`) by tests/test_cropper.py."""
    coords = np.asarray(baseline).copy().astype(float)
    if coords.shape[0] == 2:
        x0, y0 = coords[0, 0], coords[0, 1]
        x1, y1 = coords[1, 0], coords[1, 1]
        span = x1 - x0
        if (
            y0 == y1
            and span >= 2
            and float(2 * x0).is_integer()
            and float(2 * span).is_integer()
            and float(2 * y0).is_integer()
        ):
            n_line = int(math.ceil(span))  # len(np.arange(x0, x1))
            scale = target_height / (heights[0] + heights[1])
            n_cols = int(float(n_line - 1) * scale)
            if n_cols < 1:
                n_cols = 1
            t = np.linspace(0, float(n_line - 1), n_cols)
            out_x = x0 + t
            v = _height_steps(heights, target_height)
            grid_x = np.broadcast_to(out_x, (target_height, n_cols))
            grid_y = np.broadcast_to(v + y0, (target_height, n_cols))
            return np.stack([grid_x, grid_y], axis=2)
    return _crop_grid_general(coords, heights, target_height)


def _crop_grid_general(
    coords: np.ndarray, heights: tuple[float, float], target_height: int
) -> np.ndarray:
    """The general rectification-grid pipeline — the semantics
    reference the straight-line fast path is fuzz-pinned against."""
    alfa = math.atan2(
        coords[-1, 1] - coords[0, 1], coords[-1, 0] - coords[0, 0]
    )
    # alfa == 0 (horizontal baseline, the dominant case): rot is the
    # exact identity — both rotations are exact no-ops (g·1 + g'·0 ==
    # g bit-for-bit), so skip the two full-grid matmuls and the inv
    straight = alfa == 0.0
    rot = np.array(
        [[np.cos(alfa), np.sin(alfa)], [-np.sin(alfa), np.cos(alfa)]]
    )
    if not straight:
        coords = coords @ np.linalg.inv(rot)
    order = np.argsort(coords[:, 0])
    cx, cy = coords[order, 0], coords[order, 1]

    left, right = cx.min(), cx.max()
    line_x = np.arange(left, right)
    line_y = np.interp(line_x, cx, cy)
    seg = np.hypot(np.diff(line_x), np.diff(line_y))
    x_to_pos = np.concatenate([[0.0], np.cumsum(seg)])  # source x → arc t
    scale = target_height / (heights[0] + heights[1])
    n_cols = int(x_to_pos[-1] * scale)
    if n_cols < 1:
        n_cols = 1
    t = np.linspace(0, x_to_pos[-1], n_cols)
    # reverse mapping t → source x (crop_engine.py:103-121 is this
    # linear-search interpolation; np.interp computes it exactly)
    out_x = np.interp(t, x_to_pos, line_x)
    out_y = np.interp(out_x, cx, cy)
    # normals from the local tangent
    d_y = out_y - np.interp(out_x + 0.1, cx, cy)
    d_x = np.full_like(out_x, 0.1)
    norm = np.hypot(d_x, d_y)
    nx, ny = -d_y / norm, d_x / norm
    v = _height_steps(heights, target_height)
    grid_x = nx.reshape(1, -1) * v + out_x.reshape(1, -1)
    grid_y = ny.reshape(1, -1) * v + out_y.reshape(1, -1)
    grid = np.stack([grid_x, grid_y], axis=2)
    if straight:
        return grid.astype(np.float64, copy=False)
    return (grid @ rot).astype(np.float64, copy=False)


def bilinear_remap(
    img: np.ndarray, grid: np.ndarray, out_dtype=None
) -> np.ndarray:
    """Sample img at the (H, W, 2) x/y grid with bilinear weights,
    clamp-to-edge (the cv2.remap INTER_LINEAR step). Pass a float64
    ``img`` + explicit ``out_dtype`` when cropping many lines from one
    page — converting the full raster per line is the dominant cost
    otherwise (the gather touches only the crop's pixels; the astype
    touches every pixel)."""
    return np.round(bilinear_remap_float(img, grid)).astype(
        out_dtype or img.dtype
    )


def bilinear_remap_float(img: np.ndarray, grid: np.ndarray) -> np.ndarray:
    """Float-preserving remap (no rounding/dtype cast) — for sampling
    probability maps rather than pixel rasters."""
    h, w = img.shape[:2]
    x = np.clip(grid[:, :, 0], 0, w - 1)
    y = np.clip(grid[:, :, 1], 0, h - 1)
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx, fy = x - x0, y - y0
    img_f = img if img.dtype == np.float64 else img.astype(np.float64)
    if not img_f.flags.c_contiguous:
        # a channel-slice view would COPY the whole raster on reshape;
        # plain fancy indexing gathers only the crop's pixels
        return (
            img_f[y0, x0] * (1 - fy) * (1 - fx)
            + img_f[y0, x1] * (1 - fy) * fx
            + img_f[y1, x0] * fy * (1 - fx)
            + img_f[y1, x1] * fy * fx
        )
    # flat-index takes gather the identical samples as 2-D fancy
    # indexing but skip its per-call index broadcasting/checking; the
    # in-place products evaluate the SAME left-associated expression
    # v·a·b per corner, in the same order, without a dozen full-size
    # temporaries (the remap is bandwidth-bound at crop sizes)
    flat = img_f.reshape(-1)
    one_m_fy = 1.0 - fy
    one_m_fx = 1.0 - fx
    b0 = y0 * w
    b1 = y1 * w
    i00 = b0 + x0
    b0 += x1  # b0 is now the (y0, x1) flat index
    i10 = b1 + x0
    b1 += x1  # b1 is now the (y1, x1) flat index
    acc = flat.take(i00)
    acc *= one_m_fy
    acc *= one_m_fx
    t = flat.take(b0)
    t *= one_m_fy
    t *= fx
    acc += t
    t = flat.take(i10)
    t *= fy
    t *= one_m_fx
    acc += t
    t = flat.take(b1)
    t *= fy
    t *= fx
    acc += t
    return acc


def crop_line(
    img: np.ndarray,
    baseline: np.ndarray,
    heights: tuple[float, float],
    target_height: int = 32,
    out_dtype=None,
) -> np.ndarray:
    """Rectified line crop (crop_engine.py:16-30): baseline-following
    resample of the page raster to a fixed-height strip. Degenerate
    baselines (rotated x-extent < 1 px — e.g. a repeated point from an
    external PAGE file) return a blank target_height×32 strip instead
    of failing the task, like the reference's except branch
    (crop_engine.py:20-23). Pass a pre-float64 ``img`` + ``out_dtype``
    when cropping a whole page's lines (see bilinear_remap)."""
    dtype = out_dtype or img.dtype
    try:
        grid = get_crop_inputs(baseline, heights, target_height)
        return bilinear_remap(img, grid, out_dtype=dtype)
    except (ValueError, IndexError, ZeroDivisionError):
        return np.zeros((target_height, 32), dtype=dtype)
