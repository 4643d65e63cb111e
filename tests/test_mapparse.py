"""L5 ParseNet-map parsing kernels and the fused Spark stage."""

import numpy as np
import pytest

from pero_ocr_spark.functions import imageproc, mapparse


def _map(lines, h=60, w=80, asc=5.0, desc=2.0):
    m = np.zeros((h, w, 5), dtype=np.float32)
    m[:, :, 0] = asc
    m[:, :, 1] = desc
    for yd, x0, x1 in lines:
        m[yd, x0:x1, 2] = 1.0
    return m


class TestParseKernels:
    def test_rolling_max(self):
        a = np.array([[0.0], [1.0], [0.0], [0.0], [5.0], [0.0]])
        out = imageproc.rolling_max(a, 3, axis=0)
        assert out[:, 0].tolist() == [1.0, 1.0, 1.0, 5.0, 5.0, 5.0]

    def test_nms_keeps_column_maxima(self):
        x = np.zeros((9, 3))
        x[4, :] = 1.0
        x[2, 0] = 0.5
        out = mapparse.nonmaxima_suppression(x, 5)
        assert out[4, 0] == 1.0
        assert out[2, 0] == 0.0  # suppressed: 1.0 within its window

    def test_label_components_8_connectivity(self):
        mask = np.zeros((4, 4), dtype=bool)
        mask[0, 0] = mask[1, 1] = True  # diagonal touch
        _, n4 = imageproc.label_components(mask, connectivity=4)
        _, n8 = imageproc.label_components(mask, connectivity=8)
        assert (n4, n8) == (2, 1)

    def test_parse_closed_form(self):
        m = _map([(10, 5, 55), (25, 5, 55)])
        bls, hts = mapparse.parse_baseline_map(m, downsample=2)
        assert len(bls) == 2
        for bl, h in zip(bls, hts):
            assert bl[0][0] == 6.0 and bl[-1][0] == 112.0  # ±2 comp ×2
            assert h == [10.0, 4.0]
            assert len(bl) == 5  # max(min(10, 50//10), 2)
        assert sorted(bl[0][1] for bl in bls) == [18.0, 48.0]  # 2·(yd−1)

    def test_parse_drops_tiny_components(self):
        m = _map([(10, 5, 6)])  # 1 column → 3 pixels ≤ 5
        bls, _ = mapparse.parse_baseline_map(m, downsample=2)
        assert bls == []

    def test_parse_separates_same_row_segments(self):
        m = _map([(10, 5, 20), (10, 30, 45)])
        bls, _ = mapparse.parse_baseline_map(m, downsample=1)
        assert len(bls) == 2

    def test_endpoint_penalty_splits_line(self):
        m = _map([(10, 5, 55)])
        # endpoint signal spanning the smoothed 3-row band: kills the
        # whole column range, splitting the line (a single-pixel
        # endpoint only punches a hole — the penalty applies to the
        # RAW endpoint channel, cnn_layout_engine.py:148)
        m[9:12, 29:32, 3] = 1.0
        bls, _ = mapparse.parse_baseline_map(m, downsample=1)
        assert len(bls) == 2

    def test_adaptive_downsample_reruns_when_lines_too_tall(self):
        calls = []

        def map_fn(ds):
            calls.append(ds)
            m = np.zeros((100, 100, 5), dtype=np.float32)
            m[:, :, 0] = 120.0 / ds  # true ascender 120 px
            m[40, 10:90, 2] = 1.0
            m[70, 10:90, 2] = 1.0
            return m

        out, ds = mapparse.get_maps_with_optimal_resolution(
            map_fn, (4000, 4000), downsample=4
        )
        # med height at ds=4 is 30 > 15 → rerun at 4·30/12 = 10 → cap 8
        assert calls == [4, 8.0]
        assert ds == 8.0

    def test_adaptive_downsample_keeps_sweet_spot(self):
        calls = []

        def map_fn(ds):
            calls.append(ds)
            m = np.zeros((100, 100, 5), dtype=np.float32)
            m[:, :, 0] = 12.0
            m[40, 10:90, 2] = 1.0
            m[70, 10:90, 2] = 1.0
            return m

        _, ds = mapparse.get_maps_with_optimal_resolution(
            map_fn, (1000, 1000), downsample=4
        )
        assert calls == [4] and ds == 4

    def test_adaptive_downsample_skips_sparse_pages(self):
        calls = []

        def map_fn(ds):
            calls.append(ds)
            m = np.zeros((100, 100, 5), dtype=np.float32)
            m[:, :, 0] = 100.0
            m[40, 10:30, 2] = 1.0  # only 20 detected pixels
            return m

        _, ds = mapparse.get_maps_with_optimal_resolution(
            map_fn, (1000, 1000), downsample=4
        )
        assert calls == [4] and ds == 4

    def test_megapixel_floor(self):
        def map_fn(ds):
            return np.zeros((10, 10, 5), dtype=np.float32)

        _, ds = mapparse.get_maps_with_optimal_resolution(
            map_fn, (20000, 20000), downsample=1
        )
        assert ds == pytest.approx(np.sqrt(20000 * 20000 / 5e6))

    def test_spark_fused_stage(self, spark):
        from pero_ocr_spark.operators import linedet

        rows = [
            (1, 10.0, 110.0, 20.0),
            (1, 10.0, 110.0, 50.0),
            (2, 510.0, 530.0, 20.0),
        ]
        lines = spark.createDataFrame(
            rows, "doc_id long, x0 double, x1 double, y double"
        )
        out = linedet.parse_lines_from_maps(lines).collect()
        got = {(r["doc_id"], r["y"]): r for r in out}
        assert set(got) == {(1, 18.0), (1, 48.0), (2, 18.0)}
        r = got[(1, 18.0)]
        assert (r["bx0"], r["bx1"]) == (2.0 * (5 - 2), 2.0 * (55 + 1))
        assert (r["height_up"], r["height_down"]) == (10.0, 4.0)


class TestRefineBaseline:
    """L13 (baseline_refiner.py:8-68 semantics) against synthetic maps."""

    def test_recovers_jittered_baseline(self):
        # ink row 20, detection spans cols 10..70; input jittered +3
        m = _map([(20, 10, 70)], h=60, w=80)
        bl_in = np.array([[20.0, 46.0], [140.0, 46.0]])  # page coords, ds=2
        out = mapparse.refine_baseline(bl_in, (10.0, 4.0), m, downsample=2)
        # refined y returns to the detection row (±1 crop-grid quantum)
        assert np.all(np.abs(out[:, 1] - 40.0) < 1.0)
        assert out[0, 0] == 20.0 and out[-1, 0] == 138.0
        assert 2 <= len(out) <= 10

    def test_point_count_follows_line_length(self):
        m = _map([(20, 10, 70)], h=60, w=80)
        short = mapparse.refine_baseline(
            np.array([[20.0, 40.0], [52.0, 40.0]]), (10.0, 4.0), m, downsample=2
        )
        longl = mapparse.refine_baseline(
            np.array([[20.0, 40.0], [140.0, 40.0]]), (10.0, 4.0), m, downsample=2
        )
        assert len(short) < len(longl) <= 10

    def test_empty_map_returns_input(self):
        m = _map([], h=60, w=80)
        bl_in = np.array([[20.0, 40.0], [140.0, 40.0]])
        out = mapparse.refine_baseline(bl_in, (10.0, 4.0), m, downsample=2)
        assert np.array_equal(out, bl_in)

    def test_curved_detection_refits(self):
        # detection rows step 18→22 across x: the deg-3 fit follows
        m = np.zeros((60, 120, 5), dtype=np.float32)
        for i, (x0, x1) in enumerate([(5, 35), (35, 75), (75, 115)]):
            m[18 + 2 * i, x0:x1, 2] = 1.0
        bl_in = np.array([[10.0, 40.0], [230.0, 40.0]])
        out = mapparse.refine_baseline(bl_in, (10.0, 4.0), m, downsample=2)
        # refined ys trend downward following the stepped detections
        assert out[0, 1] < out[-1, 1]
        assert 36.0 - 3 < out[:, 1].min() and out[:, 1].max() < 44.0 + 3


class TestVectorizedKernelEquivalence:
    """r6 optimization guards: the vectorized rewrites of the shared
    image kernels must stay BITWISE equal to the formulations they
    replaced (the oracle pins only the synthetic corpus; these fuzz
    general inputs)."""

    def test_median50_matches_np_percentile(self):
        rng = np.random.default_rng(11)
        for trial in range(400):
            n = int(rng.integers(1, 60))
            dt = np.float32 if trial % 2 else np.float64
            a = (rng.standard_normal(n) * 7).astype(dt)
            assert mapparse._median50(a) == float(np.percentile(a, 50))

    def test_rolling_max_matches_shift_fold(self):
        from pero_ocr_spark.functions import imageproc

        def old(a, win, axis=0):
            lo = -(win // 2)
            hi = win - 1 + lo
            out = None
            for k in range(lo, hi + 1):
                sh = np.roll(a, -k, axis=axis)
                if axis != 0:
                    sh = np.swapaxes(sh, 0, axis)
                if k > 0:
                    sh[-k:] = -np.inf
                elif k < 0:
                    sh[:-k] = -np.inf
                if axis != 0:
                    sh = np.swapaxes(sh, 0, axis)
                out = sh if out is None else np.maximum(out, sh)
            return out

        rng = np.random.default_rng(12)
        for trial in range(300):
            h, w = rng.integers(1, 30, 2)
            win = int(rng.integers(1, 8))
            axis = int(rng.integers(0, 2))
            dt = np.float32 if trial % 2 else np.float64
            a = (rng.standard_normal((h, w)) * 3).astype(dt)
            got = imageproc.rolling_max(a, win, axis)
            exp = old(a, win, axis)
            assert got.dtype == exp.dtype
            assert np.array_equal(got, exp)

    def test_window_sum_matches_clipped_gather(self):
        from pero_ocr_spark.functions import imageproc

        def old(a, radius, axis):
            n = a.shape[axis]
            shape = list(a.shape)
            shape[axis] = n + 1
            dtype = (
                np.float64
                if np.issubdtype(a.dtype, np.floating)
                else np.int32
            )
            p = np.zeros(shape, dtype=dtype)
            sl = [slice(None)] * a.ndim
            sl[axis] = slice(1, None)
            np.cumsum(a, axis=axis, out=p[tuple(sl)])
            hi = np.minimum(np.arange(n) + radius + 1, n)
            lo = np.maximum(np.arange(n) - radius, 0)
            return np.take(p, hi, axis=axis) - np.take(p, lo, axis=axis)

        rng = np.random.default_rng(13)
        for trial in range(400):
            h, w = rng.integers(1, 28, 2)
            r = int(rng.integers(1, 13))
            axis = int(rng.integers(0, 2))
            a = (
                rng.standard_normal((h, w)) * 5
                if trial % 2
                else rng.integers(0, 3, (h, w)).astype(bool)
            )
            got = imageproc._window_sum(a, r, axis)
            exp = old(a, r, axis)
            assert got.dtype == exp.dtype
            assert np.array_equal(got, exp)
