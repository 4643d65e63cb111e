"""Pure-numpy image-processing kernels for layout detection (L8).

Re-expresses the reference's projection-profile line detector
(``layout_engines/simple_baseline_engine.py:13-101``) without its
cv2/scipy/skimage dependencies:

  * adaptive mean threshold  -> integral-image box mean compare
    (cv2.adaptiveThreshold ADAPTIVE_THRESH_MEAN_C semantics);
  * connected components     -> two-pass run-based union-find
    (ndimage.label, 4-connectivity);
  * find_peaks               -> local maxima with plateau midpoints +
    greedy min-distance selection (scipy.signal.find_peaks semantics
    for the prominence=0 case used by the reference);
  * polygon clip             -> segment/polygon intersection from
    page_utils.

Everything here runs inside Arrow batches on the executors; no Spark
imports.
"""

from __future__ import annotations

import numpy as np

from pero_ocr_spark.functions import page_utils as U


def box_mean(img: np.ndarray, block: int) -> np.ndarray:
    """Local mean over a block×block window with replicated borders —
    the cv2.boxFilter underneath ADAPTIVE_THRESH_MEAN_C."""
    r = block // 2
    padded = np.pad(img.astype(np.float64), r, mode="edge")
    ii = np.zeros((padded.shape[0] + 1, padded.shape[1] + 1))
    ii[1:, 1:] = padded.cumsum(0).cumsum(1)
    h, w = img.shape
    s = (
        ii[block : block + h, block : block + w]
        - ii[block : block + h, 0:w]
        - ii[0:h, block : block + w]
        + ii[0:h, 0:w]
    )
    return s / (block * block)


def adaptive_threshold_mask(img: np.ndarray, block: int = 21, c: float = 91) -> np.ndarray:
    """Ink mask: pixel <= local_mean - C (the reference thresholds with
    cv2.adaptiveThreshold(..., MEAN_C, BINARY, block, C) == 0,
    simple_baseline_engine.py:47-48)."""
    return img <= box_mean(img, block) - c


def label_components(mask: np.ndarray) -> tuple[np.ndarray, int]:
    """4-connected component labeling (ndimage.label semantics):
    row-run union-find, two passes. Returns (labels, n_components);
    labels are 1..n, background 0."""
    h, w = mask.shape
    labels = np.zeros((h, w), dtype=np.int32)
    parent: list[int] = [0]

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    prev_runs: list[tuple[int, int, int]] = []  # (start, end_excl, label)
    for y in range(h):
        row = mask[y]
        if not row.any():
            prev_runs = []
            continue
        edges = np.flatnonzero(np.diff(np.concatenate(([False], row, [False]))))
        runs = []
        for s, e in zip(edges[::2], edges[1::2]):
            lab = 0
            for ps, pe, pl in prev_runs:
                if ps < e and s < pe:  # 4-connectivity column overlap
                    root = find(pl)
                    if lab == 0:
                        lab = root
                    elif root != lab:
                        parent[root] = find(lab)
            if lab == 0:
                parent.append(len(parent))
                lab = len(parent) - 1
            labels[y, s:e] = lab
            runs.append((int(s), int(e), lab))
        prev_runs = runs
    # second pass: compress to dense 1..n
    roots = {}
    remap = np.zeros(len(parent), dtype=np.int32)
    for i in range(1, len(parent)):
        r = find(i)
        if r not in roots:
            roots[r] = len(roots) + 1
        remap[i] = roots[r]
    return remap[labels], len(roots)


def find_peaks(x: np.ndarray, distance: int = 1) -> np.ndarray:
    """Indices of local maxima (plateau midpoint), then greedy
    min-distance thinning by descending height — the
    scipy.signal.find_peaks subset the reference uses."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    peaks = []
    i = 1
    while i < n - 1:
        if x[i] > x[i - 1]:
            j = i
            while j < n - 1 and x[j + 1] == x[j]:
                j += 1
            if j < n - 1 and x[j + 1] < x[j]:
                peaks.append((i + j) // 2)
                i = j + 1
                continue
        i += 1
    if distance <= 1 or len(peaks) < 2:
        return np.asarray(peaks, dtype=np.int64)
    order = sorted(peaks, key=lambda p: -x[p])
    keep: list[int] = []
    for p in order:
        if all(abs(p - q) >= distance for q in keep):
            keep.append(p)
    return np.asarray(sorted(keep), dtype=np.int64)


def autocorr_period(proj: np.ndarray) -> float:
    """Dominant line period: lag of the first autocorrelation local
    max (simple_baseline_engine.py:54-60; 1 when no peak exists)."""
    corr = np.correlate(proj, proj, mode="full")[proj.shape[0]:]
    peaks = find_peaks(corr, distance=1)
    return float(peaks[0]) if len(peaks) else 1.0


def detect_lines_in_region(
    img: np.ndarray,
    region: np.ndarray,
    adaptive_threshold: float = 91,
    block_size: int = 21,
    minimum_length: int = 6,
) -> tuple[list[np.ndarray], list[list[int]]]:
    """Projection-profile line detection in one region
    (simple_baseline_engine.py:21-101 semantics, numpy-only):
    threshold -> per-row ink projection -> autocorrelation period ->
    peaks of the negative projection derivative = baselines ->
    stride-3 connected-component scan for per-line heights ->
    baseline segment clipped to the region polygon.

    Deviation (documented): the region mask's horizontal border
    erosion is applied as an x-range shrink of the crop mask; the
    full-width baseline is still clipped against the ORIGINAL polygon
    like the reference.

    Returns (baselines, heights): baseline = [[x, y], [x, y]] page
    coords, heights = [up, down].
    """
    region = np.asarray(region)
    x1 = int(np.clip(region[:, 0].min(), 0, img.shape[1]))
    x2 = int(np.clip(region[:, 0].max(), 0, img.shape[1]))
    y1 = int(np.clip(region[:, 1].min(), 0, img.shape[0]))
    y2 = int(np.clip(region[:, 1].max(), 0, img.shape[0]))
    if x1 == x2 or y1 == y2:
        return [], []
    column_height = y2 - y1

    ink = adaptive_threshold_mask(
        img[y1:y2, x1:x2], block=block_size, c=adaptive_threshold
    )
    labeled, _ = label_components(ink)
    proj = ink.sum(axis=1).astype(np.float64)
    period = autocorr_period(proj)
    target = -np.diff(proj)
    target[target < 0] = 0

    baseline_coords = find_peaks(target, distance=int(round(0.85 * period)))

    baselines: list[np.ndarray] = []
    heights: list[list[int]] = []
    used: set[int] = set()
    for bc in baseline_coords[::-1]:
        bc = int(bc)
        probe_row = max(bc - 10, 0)
        objs = np.unique(labeled[probe_row, :])
        objs = objs[objs > 0]
        if len(objs) == 0:
            continue
        valid = not any(int(o) in used for o in objs)
        used.update(int(o) for o in objs)

        yb1 = bc
        for yb1 in range(bc, 0, -3):
            if not np.any(np.isin(labeled[yb1, :], objs)):
                break
        yb2 = bc
        for yb2 in range(bc, column_height, 3):
            if not np.any(np.isin(labeled[yb2, :], objs)):
                break

        if x2 - x1 < minimum_length:
            valid = False
        if not valid:
            continue
        # clip the full-width baseline segment to the region polygon
        p0 = (float(x1), float(y1 + bc))
        p1 = (float(x2), float(y1 + bc))
        hits = U._segment_intersections(p0, p1, region.astype(np.float64))
        if len(hits) < 2:
            continue
        xs = sorted(h[0] for h in hits)
        baselines.append(
            np.asarray([[xs[0], y1 + bc], [xs[-1], y1 + bc]], dtype=np.float64)
        )
        heights.append([bc - yb1, yb2 - bc])
    return baselines, heights
