"""Unit tests for corpus sampling, sequence packing, repeated-passage
dedup, and repetition statistics."""

from __future__ import annotations

import pytest

from pero_ocr_spark.operators import dedup, sampling
from pero_ocr_spark.functions import kernels  # noqa: F401 (import sanity)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


class TestCommonPassages:
    def test_passage_shared_by_three_docs_is_common(self, spark):
        shared = "lorem ipsum dolor"
        rows = [
            (1, f"{shared} alpha beta", "src1"),
            (2, f"gamma {shared} delta", "src1"),
            (3, f"{shared} epsilon zeta", "src2"),
            (4, "totally unrelated words here now", "src3"),
        ]
        out = {
            r["doc_id"]: r
            for r in dedup.common_passages(
                _docs(spark, rows), n=3, min_docs=3
            ).collect()
        }
        # docs 1-3 each contain the shared 3-gram; doc 4 has none common
        for d in (1, 2, 3):
            assert out[d]["n_common"] >= 1
        assert out[4]["n_common"] == 0
        assert out[4]["common_frac"] == 0.0

    def test_short_docs_dropped_like_shingles(self, spark):
        rows = [(1, "one two", "s")]  # < n words -> no shingles, no row
        assert dedup.common_passages(_docs(spark, rows), n=3).count() == 0


class TestRepetitionStats:
    def test_known_values(self, spark):
        from pero_ocr_spark.operators import textstats

        rows = [
            (1, "a a a b", "s"),  # 4 words, 2 distinct; grams: aa,aa,ab
            (2, "x y z", "s"),  # all distinct; grams xy,yz unique
            (3, "solo", "s"),  # 1 word: no grams
        ]
        out = {
            r["doc_id"]: r
            for r in textstats.repetition_stats(
                _docs(spark, rows).select("doc_id", "text")
            ).collect()
        }
        assert out[1]["dup_word_frac"] == 0.5
        assert out[1]["top_2gram_frac"] == pytest.approx(2 / 3, abs=1e-6)
        assert out[2]["dup_word_frac"] == 0.0
        assert out[2]["top_2gram_frac"] == 0.5
        assert out[3]["dup_word_frac"] == 0.0
        assert out[3]["top_2gram_frac"] == 0.0


class TestSampling:
    def test_stratified_rate_and_determinism(self, spark):
        # strata deliberately assigned by doc_id % 4 — the realized rate
        # must STILL track the quota because the keep residue is a hash
        # of doc_id, decorrelated from any id-modulus stratum structure
        rows = [(i, "w", f"src{i % 4}") for i in range(4000)]
        df = _docs(spark, rows)
        a = sorted(r["doc_id"] for r in sampling.sample_stratified(df).collect())
        b = sorted(r["doc_id"] for r in sampling.sample_stratified(df).collect())
        assert a == b  # rerun-stable, no RNG
        kept = sampling.sample_stratified(df).groupBy("source").count()
        counts = {r["source"]: r["count"] for r in kept.collect()}
        for k in range(4):
            quota = 10 + (k * 7) % 80  # keep rate quota/100 of 1000 docs
            expected = quota * 10
            # hash residue ≈ uniform: binomial std < 16 docs; ±25% is
            # far outside noise but tight enough to catch correlation
            # quantization (which skews rates by multiples of 25pp here)
            assert abs(counts.get(f"src{k}", 0) - expected) < 0.25 * expected

    def test_pack_sequences_respects_budget(self, spark):
        rows = [(i, " ".join(["w"] * (5 + i % 60)), "s") for i in range(300)]
        df = _docs(spark, rows).select("doc_id", "text")
        out = sampling.pack_sequences(df, budget=100, n_buckets=8).collect()
        by_seq: dict[int, list] = {}
        for r in out:
            by_seq.setdefault(r["seq_id"], []).append(r)
        max_doc = max(r["n_tokens"] for r in out)
        for seq, members in by_seq.items():
            total = sum(r["n_tokens"] for r in members)
            # start-offset rule: <= budget + one document of tokens
            assert total <= 100 + max_doc
            # seq_pos is a contiguous 0..k-1 ordering by doc_id
            ordered = sorted(members, key=lambda r: r["doc_id"])
            assert [r["seq_pos"] for r in ordered] == list(range(len(members)))


class TestCorpusFilter:
    def test_all_reasons_reachable(self, spark):
        from pero_ocr_spark.operators import textstats

        good = "the " + " ".join(f"word{i} of" for i in range(40))  # diverse, en
        rows = [
            (1, good, "s"),
            (2, good, "s"),  # exact duplicate of 1 -> canonical is doc 1
            (3, "zz yy xx ww vv", "s"),  # no stopwords -> language
            # stopword-rich (en passes) but 2 distinct / 80 words
            (4, " ".join(["the"] * 10 + ["spam"] * 70), "s"),
            # diversity ~0.51 (dup gate passes) but 'the of' is ~26% of
            # grams — above the tightened 0.2 threshold
            (5, "the of " + " ".join(
                f"u{i} v{i} the of" for i in range(30)), "s"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = {
            r["doc_id"]: r
            for r in textstats.corpus_filter(
                df, max_top_2gram_frac=0.2
            ).collect()
        }
        assert out[1]["reason"] == "ok" and out[1]["keep"]
        assert out[2]["reason"] == "exact_duplicate" and not out[2]["keep"]
        assert out[3]["reason"] == "language"
        assert out[4]["reason"] == "repetition_words"
        assert out[5]["reason"] == "repetition_2gram"

    def test_quality_reason_on_degenerate_length(self, spark):
        from pero_ocr_spark.operators import textstats

        # 3 tokens: length band 0.5, mean_len 1.0 -> word band 0.5,
        # diversity 1.0 -> quality = 2/3... lower diversity to drop below 0.6
        rows = [(1, "the the a", "s")]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        r = textstats.corpus_filter(df).collect()[0]
        # diversity 2/3: quality = (0.667+0.5+0.5)/3 = 0.556 < 0.6
        assert r["reason"] == "quality"


class TestRedactVocab:
    def test_redact_multiple_pii_tokens(self, spark):
        from pero_ocr_spark.operators import textstats

        df = spark.createDataFrame(
            [(1, "a@b.com text 1234567 more c.d@e.org and 42", "s")],
            "doc_id long, text string, source string",
        )
        out = textstats.redact_pii(df).collect()[0]["text"]
        assert out == "<EMAIL> text <NUM> more <EMAIL> and 42"

    def test_vocab_topk_deterministic_ties(self, spark):
        from pero_ocr_spark.operators import textstats

        df = spark.createDataFrame(
            [(1, "b a c a", "s"), (2, "c b d", "s")],
            "doc_id long, text string, source string",
        )
        rows = textstats.vocab_topk(df, k=3).collect()
        # counts: a=2 b=2 c=2 d=1 -> top3 by (n desc, word asc) = a, b, c
        assert [(r["word"], r["n"]) for r in rows] == [("a", 2), ("b", 2), ("c", 2)]


class TestRandomizedParity:
    def test_top2_expr_matches_counter(self, spark):
        """The sorted run-length aggregate must equal a dict count of
        2-grams on seeded random word lists (incl. repeats/singletons)."""
        import random
        from collections import Counter

        from pero_ocr_spark.operators import textstats

        rng = random.Random(7)
        rows = []
        for i in range(400):
            n = rng.randint(1, 40)
            words = [rng.choice("abcdef") for _ in range(n)]
            rows.append((i, " ".join(words), "s"))
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        got = {
            r["doc_id"]: r["top_2gram_frac"]
            for r in textstats.repetition_stats(
                df.select("doc_id", "text")
            ).collect()
        }
        for i, text, _ in rows:
            ws = text.split(" ")
            if len(ws) < 2:
                assert got[i] == 0.0
                continue
            grams = Counter(zip(ws, ws[1:]))
            want = round(max(grams.values()) / (len(ws) - 1), 6)
            assert got[i] == pytest.approx(want, abs=1e-6), i

    def test_merge_batch_walk_matches_per_group_kernel(self, spark):
        """merge_lines_stage's change-point batch walk must reproduce
        per-group merge_lines_straight calls exactly on seeded random
        groups (varied sizes, overlapping/disjoint segments)."""
        import random

        import numpy as np

        from pero_ocr_spark.functions import geometry as G
        from pero_ocr_spark.operators import layout

        rng = random.Random(13)
        rows = []
        groups = {}
        for doc in range(40):
            for rid in ("r0", "r1"):
                k = rng.randint(1, 12)
                g = []
                for j in range(k):
                    x0 = rng.uniform(0, 400)
                    w = rng.uniform(5, 120)
                    y = 20.0 + rng.randint(0, 6) * 15
                    g.append((x0, x0 + w, y, 10.0, 4.0))
                groups[(doc, rid)] = g
                for j, (a, b, y, asc, desc) in enumerate(g):
                    rows.append((doc, rid, f"l{j}", a, b, y, asc, desc))
        df = spark.createDataFrame(
            rows,
            "doc_id long, region_id string, line_id string, x0 double, "
            "x1 double, y double, asc double, desc double",
        )
        got = {}
        for r in layout.merge_lines_stage(df).collect():
            got.setdefault((r["doc_id"], r["region_id"]), []).append(
                (r["line_idx"], r["x0"], r["x1"], r["y"], r["asc"], r["desc"])
            )
        for key, g in groups.items():
            arr = np.array(g)
            m = G.merge_lines_straight(
                arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3], arr[:, 4]
            )
            want = [
                (i, m[0][i], m[1][i], m[2][i], m[3][i], m[4][i])
                for i in range(len(m[0]))
            ]
            assert sorted(got[key]) == sorted(want), key
