"""Unit tests for the round-4 finale operators: distributed BPE
training/application, char-entropy filtering, DSIR importance
resampling. (Oracle parity for the registered queries is covered by
test_oracle_parity.py; these pin hand-computed semantics.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, texts, sources=None):
    sources = sources or ["src0"] * len(texts)
    rows = [
        (i, t, "en", s, len(t))
        for i, (t, s) in enumerate(zip(texts, sources))
    ]
    return spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, "
        "n_chars LONG"
    )


class TestBPE:
    def test_classic_merge_order(self, spark):
        # words: low x2, lower x1 — the textbook example, ties break on
        # the lexicographically smallest pair string
        from pero_ocr_spark.operators import bpe

        docs = _docs(spark, ["low low lower"])
        merges, vocab = bpe.train_bpe(docs, 4)
        got = [
            (r["merge_rank"], r["left_sym"], r["right_sym"], r["merged"],
             r["pair_count"])
            for r in merges.orderBy("merge_rank").collect()
        ]
        assert got == [
            (1, "l", "o", "lo", 3),
            (2, "lo", "w", "low", 3),
            (3, "e", "r", "er", 1),
            (4, "low", "er", "lower", 1),
        ]
        enc = {r["word"]: r["enc"] for r in vocab.collect()}
        assert enc == {"low": "<low>", "lower": "<lower>"}

    def test_self_overlapping_pair(self, spark):
        # 'aaaa' under merge (a,a): left-to-right non-overlapping
        # application must give <aa><aa>, then (aa,aa) merges next
        from pero_ocr_spark.operators import bpe

        merges, vocab = bpe.train_bpe(_docs(spark, ["aaaa"]), 2)
        got = [
            (r["left_sym"], r["right_sym"], r["pair_count"])
            for r in merges.orderBy("merge_rank").collect()
        ]
        assert got == [("a", "a", 3), ("aa", "aa", 1)]
        assert vocab.collect()[0]["enc"] == "<aaaa>"

    def test_subword_counts(self, spark):
        from pero_ocr_spark.operators import bpe

        docs = _docs(spark, ["low low lower", "low wow"])
        _, vocab = bpe.train_bpe(docs, 4)
        counts = {
            r["doc_id"]: (r["n_words"], r["n_subwords"])
            for r in bpe.subword_counts(docs, vocab).collect()
        }
        # freqs: low:3 lower:1 wow:1 -> merges (o,w),(l,ow),(e,r),
        # (low,er): low -> <low>, lower -> <lower>, wow -> <w><ow>
        assert counts[0] == (3, 3)
        assert counts[1] == (2, 1 + 2)

    def test_merge_exhaustion_stops_early(self, spark):
        from pero_ocr_spark.operators import bpe

        merges, _ = bpe.train_bpe(_docs(spark, ["ab ab"]), 10)
        assert merges.count() == 1  # (a,b) fuses everything; loop stops


class TestCharEntropy:
    @pytest.mark.parametrize(
        "text,expected",
        [("aaaa", 0.0), ("aabb", 1.0), ("abcd", 2.0), ("a", 0.0)],
    )
    def test_known_entropy(self, spark, text, expected):
        from pero_ocr_spark.operators import textstats

        row = textstats.char_entropy(_docs(spark, [text])).collect()[0]
        assert row["char_entropy"] == pytest.approx(expected, abs=1e-6)
        assert row["keep"] == (expected >= 3.0)

    def test_natural_text_kept(self, spark):
        from pero_ocr_spark.operators import textstats

        docs = _docs(
            spark,
            ["the quick brown fox jumps over the lazy dog", "aa aa aa aa"],
        )
        got = {r["doc_id"]: r["keep"]
               for r in textstats.char_entropy(docs).collect()}
        assert got == {0: True, 1: False}


class TestDSIR:
    def test_target_vocab_scores_positive(self, spark):
        # target stratum uses a disjoint vocabulary: target docs must
        # score > 0 (target-like), the rest < 0
        from pero_ocr_spark.operators import sampling

        docs = _docs(
            spark,
            ["alpha beta alpha", "beta alpha beta",
             "gamma delta epsilon", "delta epsilon gamma"],
            sources=["src0", "src0", "src7", "src9"],
        )
        got = sampling.sample_dsir(docs, target_source="src0").collect()
        keep = {r["doc_id"]: r["keep"] for r in got}
        assert keep == {0: True, 1: True, 2: False, 3: False}
        scores = {r["doc_id"]: r["avg_logratio"] for r in got}
        assert scores[0] > 0 > scores[2]

    def test_zero_shuffle_score_is_mean_of_word_ratios(self, spark):
        # a doc repeating ONE word scores exactly the single-bucket
        # log-ratio: ln((ct+1)/(tt+64)) - ln((cr+1)/(tr+64))
        import math

        from pero_ocr_spark.operators import sampling

        docs = _docs(spark, ["zed zed zed", "yon yon"],
                     sources=["src0", "src3"])
        got = {r["doc_id"]: r["avg_logratio"]
               for r in sampling.sample_dsir(docs,
                                             target_source="src0").collect()}
        # zed: ct=3, tt=3, cr=3, tr=5 (assuming no bucket collision
        # between 'zed' and 'yon' under the 64-bucket poly hash)
        expect0 = math.log((3 + 1) / (3 + 64)) - math.log((3 + 1) / (5 + 64))
        expect1 = math.log((0 + 1) / (3 + 64)) - math.log((2 + 1) / (5 + 64))
        assert got[0] == pytest.approx(expect0, abs=1e-6)
        assert got[1] == pytest.approx(expect1, abs=1e-6)


class TestEpochMixing:
    def test_copies_match_weights(self, spark):
        from pero_ocr_spark.operators import sampling

        # src1 -> sid 1 -> w = 0.25 + (7 % 10)/4 = 2.0 exactly: every
        # doc gets exactly 2 epochs; src0 -> w = 0.25: docs appear
        # once (residue < 250) or drop out
        docs = _docs(
            spark, ["a b"] * 6,
            sources=["src1", "src1", "src0", "src0", "src0", "src0"],
        )
        rows = sampling.sample_epoch_mixing(docs).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r["epoch"])
        assert by_doc[0] == [1, 2] and by_doc[1] == [1, 2]
        for d in (2, 3, 4, 5):
            assert by_doc.get(d, []) in ([], [1])
        assert all(
            r["n_copies"] == len(by_doc[r["doc_id"]]) for r in rows
        )


def _ref_bpe(words: list[str], n_merges: int):
    """Pure-Python reference BPE (Sennrich get_stats/merge loop) with
    the engine's tiebreak: max count, then lexicographically smallest
    'left|right' pair string. Returns (merges, final symbol lists)."""
    from collections import Counter

    freq = Counter(words)
    vocab = {w: list(w) for w in freq}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, f in freq.items():
            syms = vocab[w]
            for a, b in zip(syms, syms[1:]):
                pairs[f"{a}|{b}"] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        left, right = best.split("|", 1)
        merges.append((left, right, pairs[best]))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):  # left-to-right greedy, non-overlapping
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


class TestBPEFuzz:
    def test_matches_reference_on_tie_heavy_corpora(self, spark):
        # tiny alphabet forces constant pair-count ties AND
        # self-overlapping pairs — the two places a wrong tiebreak or
        # wrong replace semantics would diverge from reference BPE
        import random

        from pero_ocr_spark.operators import bpe

        rng = random.Random(20260817)
        alphabet = "ab"
        for trial in range(8):
            words = [
                "".join(rng.choice(alphabet)
                        for _ in range(rng.randint(1, 6)))
                for _ in range(rng.randint(1, 8))
            ]
            docs = _docs(spark, [" ".join(words)])
            merges_df, vocab_df = bpe.train_bpe(docs, 3)
            got_merges = [
                (r["left_sym"], r["right_sym"], r["pair_count"])
                for r in merges_df.orderBy("merge_rank").collect()
            ]
            got_enc = {
                r["word"]: r["enc"] for r in vocab_df.collect()
            }
            want_merges, want_vocab = _ref_bpe(words, 3)
            assert got_merges == want_merges, (trial, words)
            want_enc = {
                w: "<" + "><".join(syms) + ">"
                for w, syms in want_vocab.items()
            }
            assert got_enc == want_enc, (trial, words)


class TestCDCChunks:
    def test_boundaries_shift_with_content(self, spark):
        # the CDC property: an edit near the START of a doc must not
        # disturb chunking far downstream — the suffix chunks of the
        # edited doc equal the original's, so their dedup hits survive
        from pero_ocr_spark.operators import dedup

        base = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away into the deep dark forest tonight again")
        edited = "XYZPREFIX " + base
        docs = _docs(spark, [base, edited])
        got = {r["doc_id"]: r for r in dedup.cdc_chunk_dedup(docs).collect()}
        # both docs must share at least one cross-doc duplicate chunk
        # (the content-defined suffix chunks realign after the edit)
        assert got[0]["n_dup_chunks"] > 0
        assert got[1]["n_dup_chunks"] > 0
        assert 0 < got[0]["dup_char_frac"] <= 1

    def test_short_doc_is_one_chunk(self, spark):
        from pero_ocr_spark.operators import dedup

        got = dedup.cdc_chunk_dedup(_docs(spark, ["tiny"])).collect()[0]
        assert got["n_chunks"] == 1 and got["n_dup_chunks"] == 0
