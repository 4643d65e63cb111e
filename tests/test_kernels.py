"""Kernel unit tests on hand-built fixtures — semantic parity with the
reference's decoder tests (test/test_decoding/test_decoders.py) and
error-summary/alignment tests, independently implemented.

Charset for the tiny fixtures: a, b, c, <BLANK> (blank last).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from pero_ocr_spark.functions import kernels

ABC = ["a", "b", "c", kernels.BLANK]
N80 = -80.0


def beam(logits, k=2, **kw):
    hyps, _ = kernels.ctc_beam_search(np.asarray(logits, dtype=float), ABC, beam_size=k, **kw)
    return hyps


class TestGreedy:
    def test_single_frame(self):
        text, _ = kernels.greedy_decode(np.asarray([[0.0, N80, N80, N80]]), ABC)
        assert text == "a"

    def test_collapse_and_blank(self):
        logits = np.asarray(
            [[0.0, N80, N80, N80], [0.0, N80, N80, N80], [N80, N80, N80, 0.0]]
        )
        text, score = kernels.greedy_decode(logits, ABC)
        assert text == "a"
        assert score == pytest.approx(math.log(3), abs=1e-6)

    def test_double_symbol(self):
        logits = np.asarray(
            [[0.0, N80, N80, N80], [N80, N80, N80, 0.0], [0.0, N80, N80, N80]]
        )
        assert kernels.greedy_decode(logits, ABC)[0] == "aa"

    def test_unnormalized_rejected(self):
        with pytest.raises(ValueError):
            kernels.greedy_decode(np.asarray([[-10.0, N80, N80, -10.0]]), ABC)


class TestBeam:
    def test_single_frame(self):
        assert beam([[0.0, N80, N80, N80]])[0][0] == "a"

    def test_single_blank_score(self):
        hyps = beam([[N80, N80, N80, -5.0]], max_deviation=np.inf)
        assert hyps[0][0] == ""
        assert hyps[0][1] == pytest.approx(-5.0)

    def test_trivial_two_frames(self):
        assert beam([[0.0, N80, N80, N80], [0.0, N80, N80, N80]])[0][0] == "a"

    def test_double_symbol(self):
        hyps = beam(
            [[0.0, N80, N80, N80], [N80, N80, N80, 0.0], [0.0, N80, N80, N80]]
        )
        assert hyps[0][0] == "aa"

    def test_two_symbols_immediate(self):
        assert beam([[0.0, N80, N80, N80], [N80, 0.0, N80, N80]])[0][0] == "ab"

    def test_continued_symbol(self):
        hyps = beam(
            [[0.0, N80, N80, N80], [0.0, N80, N80, N80], [N80, N80, N80, 0.0]]
        )
        assert hyps[0][0] == "a"

    def test_continued_symbol_regression(self):
        logits = [
            [-7e-2, N80, N80, -2.0],
            [-4e-4, N80, N80, -7.0],
            [-9e-1, N80, N80, -5e-1],
            [N80, N80, N80, 0.0],
        ]
        assert beam(logits, max_deviation=np.inf)[0][0] == "a"

    def test_prefix_joining_regression(self):
        # two surviving hypotheses must be exactly {'a', ''} — mass of
        # identical prefixes merged, not duplicated
        logits = [
            [-2.0, -10.0, N80, -2.0],
            [-4e-4, N80, N80, -7.0],
            [-9e-1, N80, N80, -5e-1],
            [N80, N80, N80, 0.0],
        ]
        hyps = beam(logits, k=2, max_deviation=np.inf)
        assert hyps[0][0] == "a"
        assert {h[0] for h in hyps} == {"a", ""}

    def test_unnormalized_rejected(self):
        with pytest.raises(ValueError):
            beam([[-10.0, N80, N80, -10.0]])

    def test_beam_corrects_greedy_on_split_mass(self):
        # P(a)=0.4, P(blank)=0.6 per frame over 2 frames: greedy's
        # frame-wise argmax yields '' but the summed path mass of 'a'
        # (aa, a·blank, blank·a = 0.64) beats '' (0.36) — the classic
        # justification for prefix beam search over greedy decoding
        lp = np.log(np.asarray([[0.4, 1e-9, 1e-9, 0.6]] * 2))
        lp = lp - np.log(np.sum(np.exp(lp), axis=1, keepdims=True))
        greedy_text, _ = kernels.greedy_decode(lp, ABC)
        assert greedy_text == ""
        hyps, _ = kernels.ctc_beam_search(lp, ABC, beam_size=4)
        assert hyps[0][0] == "a"
        assert hyps[0][1] == pytest.approx(math.log(0.64), abs=1e-6)

    def test_lm_fusion_prefers_boosted_bigram(self):
        # visual evidence is ambiguous between 'ab' and 'ac'; LM boosts a→b
        lm = kernels.NGramLM(ABC, boost={("a", "b"): 3.0})
        amb = math.log(0.5)
        logits = np.asarray(
            [[0.0, N80, N80, N80], [N80, amb, amb, N80]]
        )
        hyps, _ = kernels.ctc_beam_search(
            logits, ABC, beam_size=4, lm=lm, lm_scale=1.0, max_deviation=np.inf
        )
        assert hyps[0][0] == "ab"
        novis, _ = kernels.ctc_beam_search(
            logits, ABC, beam_size=4, max_deviation=np.inf
        )
        assert {h[0] for h in novis[:2]} == {"ab", "ac"}


class TestConfidence:
    def test_perfect_line(self):
        dense = np.asarray([[0.0, N80, N80, N80], [N80, N80, N80, 0.0]])
        assert kernels.line_confidence(dense) == pytest.approx(1.0, abs=1e-6)

    def test_worst_run_dominates(self):
        # second run ('b') has best prob ~0.5 → line confidence ~0.5
        half = math.log(0.5)
        dense = np.asarray(
            [[0.0, N80, N80, N80], [N80, half, half, N80], [N80, N80, N80, 0.0]]
        )
        conf = kernels.line_confidence(dense)
        assert conf == pytest.approx(0.5, abs=1e-3)

    def test_letter_confidences(self):
        dense = np.asarray(
            [[0.0, N80, N80, N80], [0.0, N80, N80, N80], [N80, N80, N80, 0.0]]
        )
        confs = kernels.letter_confidences(dense, np.asarray([0, 0, 3]), 3)
        assert len(confs) == 1
        assert confs[0] == pytest.approx(0.0, abs=1e-6)


class TestSparseCodec:
    def test_round_trip(self):
        rng = np.random.default_rng(7)
        dense = np.where(rng.random((9, 5)) > 0.6, 0.0, -80.0)
        data, indices, indptr = kernels.dense_to_sparse(dense, logit_threshold=-9.21)
        back = kernels.sparse_to_dense(data, indices, indptr, 9, 5, fill=-80.0)
        np.testing.assert_allclose(back, dense)

    def test_threshold_drops_small(self):
        dense = np.asarray([[0.0, -20.0], [-5.0, -80.0]])
        data, indices, indptr = kernels.dense_to_sparse(dense, logit_threshold=-9.21)
        back = kernels.sparse_to_dense(data, indices, indptr, 2, 2, fill=-80.0)
        assert back[0, 1] == -80.0
        assert back[1, 0] == -5.0


class TestEditStats:
    @pytest.mark.parametrize(
        "ref,hyp,dist,subs,ins,dels",
        [
            ("abc", "abc", 0, 0, 0, 0),
            ("abc", "axc", 1, 1, 0, 0),
            ("abc", "abxc", 1, 0, 1, 0),
            ("abc", "ac", 1, 0, 0, 1),
            ("", "ab", 2, 0, 2, 0),
            ("ab", "", 2, 0, 0, 2),
            ("kitten", "sitting", 3, 2, 1, 0),
        ],
    )
    def test_cases(self, ref, hyp, dist, subs, ins, dels):
        assert kernels.edit_stats(ref, hyp) == (dist, subs, ins, dels)

    def test_alignment_path(self):
        path = kernels.align_strings("abc", "axc")
        assert path == [("a", "a"), ("b", "x"), ("c", "c")]
        path = kernels.align_strings("abc", "ac")
        assert ("b", None) in path


class TestBestOverlapSentinel:
    def test_nul_in_text_does_not_break_overlap(self):
        from pero_ocr_spark.functions import kernels

        # the KMP sentinel must not be confusable with text content
        assert kernels.best_overlap("a\x00", "\x00a") <= 2
        assert kernels.best_overlap("\x00\x00", "\x00\x00") == 2
        assert kernels.best_overlap("xyab", "abxy") == 2
