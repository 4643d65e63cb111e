"""Corpus BLEU operator vs a serial pure-Python reference.

The reference implements Papineni et al. 2002 directly — clipped
modified n-gram precision, geometric mean, brevity penalty — with the
SAME rounding discipline as the operator (9-dp per log term, 6-dp
final), so the comparison is exact, not approximate.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F


def _serial_bleu(hyp: list[str], ref: list[str], max_n: int = 4):
    clips, tots = [], []
    for n in range(1, max_n + 1):
        hg = Counter(
            tuple(hyp[i : i + n]) for i in range(len(hyp) - n + 1)
        )
        rg = Counter(
            tuple(ref[i : i + n]) for i in range(len(ref) - n + 1)
        )
        clips.append(sum(min(c, rg[g]) for g, c in hg.items()))
        tots.append(max(len(hyp) - n + 1, 0))
    if len(hyp) < max_n or any(c == 0 for c in clips):
        return clips, 0.0
    logsum = 0.0
    for c, t in zip(clips, tots):
        logsum = logsum + round(math.log(c / t), 9)
    bp = min(0.0, 1.0 - len(ref) / len(hyp))
    return clips, round(math.exp(bp + (1.0 / max_n) * logsum), 6)


def _run(spark, rows):
    from pero_ocr_spark.operators import errors

    df = spark.createDataFrame(
        rows, "doc_id long, hyp_toks array<string>, ref_toks array<string>"
    )
    out = {
        r["doc_id"]: r
        for r in errors.corpus_bleu(df).collect()
    }
    for doc_id, hyp, ref in rows:
        clips, bleu = _serial_bleu(hyp, ref)
        got = out[doc_id]
        assert [got[f"clip{k}"] for k in (1, 2, 3, 4)] == clips, doc_id
        assert got["hyp_len"] == len(hyp) and got["ref_len"] == len(ref)
        assert got["bleu"] == pytest.approx(bleu, abs=1e-9), doc_id
    return out


class TestCorpusBleu:
    def test_identity_scores_one(self, spark):
        toks = "the quick brown fox jumps over the lazy dog".split()
        out = _run(spark, [(1, toks, toks)])
        assert out[1]["bleu"] == 1.0

    def test_hand_computed_substitution(self, spark):
        # one substitution at position 8 of 10: kills the 2 bigrams, 2
        # trigrams and 2 four-grams whose window covers it ->
        # p1=9/10, p2=7/9, p3=6/8, p4=5/7; lengths equal so BP=1
        ref = "a b c d e f g h i j".split()
        hyp = "a b c d e f g h X j".split()
        out = _run(spark, [(2, hyp, ref)])
        expected = math.exp(
            0.25
            * (
                round(math.log(9 / 10), 9)
                + round(math.log(7 / 9), 9)
                + round(math.log(6 / 8), 9)
                + round(math.log(5 / 7), 9)
            )
        )
        assert out[2]["bleu"] == pytest.approx(round(expected, 6), abs=1e-9)

    def test_clipping_caps_repeated_grams(self, spark):
        # hypothesis spams a word the reference has twice: unigram
        # matches clip at 2, not 5 (the Papineni cat-cat-cat example)
        ref = "the cat sat on the mat".split()
        hyp = ["the"] * 5
        out = _run(spark, [(3, hyp, ref)])
        assert out[3]["clip1"] == 2
        assert out[3]["bleu"] == 0.0  # no bigram survives

    def test_brevity_penalty_direction(self, spark):
        # same precisions, shorter hypothesis -> strictly lower score
        ref = "a b c d e f g h".split()
        full = _run(spark, [(4, ref, ref)])[4]["bleu"]
        short = _run(spark, [(5, ref[:6], ref)])[5]["bleu"]
        assert short < full
        # BP = exp(1 - 8/6) on an otherwise perfect 6-token prefix
        assert short == pytest.approx(round(math.exp(1 - 8 / 6), 6), abs=1e-9)

    def test_reorder_hurts_ngrams_not_unigrams(self, spark):
        ref = "a b c d e f".split()
        hyp = "f e d c b a".split()
        out = _run(spark, [(6, hyp, ref)])
        assert out[6]["clip1"] == 6  # all words present
        assert out[6]["clip2"] == 0  # no bigram survives reversal
        assert out[6]["bleu"] == 0.0

    def test_empty_and_short_hypotheses(self, spark):
        ref = "a b c d e".split()
        out = _run(spark, [(7, [], ref), (8, ["a", "b"], ref)])
        assert out[7]["bleu"] == 0.0 and out[7]["clip1"] == 0
        assert out[8]["bleu"] == 0.0 and out[8]["clip2"] == 1

    def test_fuzz_against_serial(self, spark):
        # deterministic pseudo-random corpora over a tiny vocabulary —
        # dense n-gram collisions exercise clipping on every level
        vocab = ["u", "v", "w", "x"]
        rows = []
        seed = 1
        for doc in range(24):
            toks = []
            for i in range(5 + doc % 13):
                seed = (seed * 69069 + 12345) % 2147483647
                toks.append(vocab[seed % 4])
            hyp = []
            for i, t in enumerate(toks):
                seed = (seed * 69069 + 12345) % 2147483647
                if seed % 7 == 0:
                    continue  # drop
                hyp.append(vocab[seed % 4] if seed % 5 == 0 else t)
            rows.append((100 + doc, hyp, toks))
        _run(spark, rows)  # asserts counts + bleu per doc inside
