"""L6 graph-based line clustering kernels."""

import numpy as np

from pero_ocr_spark.functions import lineclust


def _line(x0, x1, y):
    return np.array([[float(x0), float(y)], [float(x1), float(y)]])


H = (10.0, 4.0)


class TestPenalty:
    def test_zero_without_separator(self):
        sep = np.zeros((100, 200), dtype=np.float32)
        p = lineclust.pair_penalty(_line(10, 150, 50), H, _line(10, 150, 20), H, sep)
        assert p == 0.0

    def test_separator_in_band_scores(self):
        sep = np.zeros((100, 200), dtype=np.float32)
        sep[40, :] = 1.0  # in the lower line's ascender band (50-10±1)
        p = lineclust.pair_penalty(_line(10, 150, 50), H, _line(10, 150, 20), H, sep)
        assert p >= 1.0

    def test_no_x_overlap_is_one(self):
        sep = np.zeros((100, 400), dtype=np.float32)
        p = lineclust.pair_penalty(_line(10, 100, 50), H, _line(200, 300, 50), H, sep)
        assert p == 1.0


class TestClusters:
    def test_adjacent_rows_merge_separator_splits(self):
        sep = np.zeros((200, 300), dtype=np.float32)
        sep[100, :] = 1.0  # between rows at y=80 and y=110
        baselines = [_line(10, 250, y) for y in (20, 50, 80, 110, 140)]
        labels = lineclust.cluster_lines(baselines, [H] * 5, sep)
        assert labels[0] == labels[1] == labels[2]
        assert labels[3] == labels[4]
        assert labels[0] != labels[3]

    def test_distant_rows_stay_separate(self):
        sep = np.zeros((300, 300), dtype=np.float32)
        baselines = [_line(10, 250, 20), _line(10, 250, 110)]  # 90px gap
        labels = lineclust.cluster_lines(baselines, [H, H], sep)
        assert labels[0] != labels[1]

    def test_columns_stay_separate(self):
        sep = np.zeros((100, 1000), dtype=np.float32)
        baselines = [_line(10, 480, 50), _line(510, 980, 50)]
        labels = lineclust.cluster_lines(baselines, [H, H], sep)
        assert labels[0] != labels[1]

    def test_empty(self):
        assert lineclust.cluster_lines([], [], np.zeros((5, 5))).size == 0
