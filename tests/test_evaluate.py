"""Evaluation operators (operators/evaluate.py): AUC, calibration,
Cohen's kappa, recall@k — checked against serial replicas."""

import itertools

from pyspark.sql import functions as F

from pero_ocr_spark.operators import evaluate


def _auc_brute(pairs):
    """Pair-counting reference: P(s+ > s-) + 0.5 P(s+ = s-)."""
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    wins = sum(1 for p, n in itertools.product(pos, neg) if p > n)
    ties = sum(1 for p, n in itertools.product(pos, neg) if p == n)
    return (wins + 0.5 * ties) / (len(pos) * len(neg))


class TestAuc:
    def test_matches_pair_counting_with_ties(self, spark):
        pairs = [
            (0.9, True), (0.8, True), (0.8, False), (0.7, True),
            (0.5, False), (0.5, True), (0.5, False), (0.3, False),
            (0.2, True), (0.1, False),
        ]
        df = spark.createDataFrame(pairs, "score double, label boolean")
        got = evaluate.binary_auc(df).first()
        assert got.n_pos == 5 and got.n_neg == 5
        assert abs(got.auc - _auc_brute(pairs)) < 1e-9

    def test_perfect_and_inverted_ranking(self, spark):
        perfect = [(0.9, True), (0.8, True), (0.2, False), (0.1, False)]
        df = spark.createDataFrame(perfect, "score double, label boolean")
        assert evaluate.binary_auc(df).first().auc == 1.0
        inv = [(s, not y) for s, y in perfect]
        df = spark.createDataFrame(inv, "score double, label boolean")
        assert evaluate.binary_auc(df).first().auc == 0.0

    def test_constant_score_is_half(self, spark):
        df = spark.createDataFrame(
            [(0.5, True), (0.5, False)] * 10, "score double, label boolean"
        )
        assert evaluate.binary_auc(df).first().auc == 0.5

    def test_quantization_groups_scores(self, spark):
        # scores equal after 6-dp rounding are ties by construction
        df = spark.createDataFrame(
            [(0.50000004, True), (0.50000001, False)],
            "score double, label boolean",
        )
        assert evaluate.binary_auc(df).first().auc == 0.5


class TestCalibration:
    def test_perfectly_calibrated_bins_have_zero_gap(self, spark):
        rows = []
        for bin10 in (2, 7):  # bin prob = .25 / .75
            p = bin10 / 10 + 0.05
            npos = int(p * 20)
            rows += [(p, True)] * npos + [(p, False)] * (20 - npos)
        df = spark.createDataFrame(rows, "score double, label boolean")
        got = {r.bin: r for r in evaluate.calibration_bins(df).collect()}
        assert set(got) == {2, 7}
        for r in got.values():
            assert r.gap == 0.0 and r.n == 20

    def test_top_edge_goes_to_last_bin(self, spark):
        df = spark.createDataFrame(
            [(1.0, True)], "score double, label boolean"
        )
        assert evaluate.calibration_bins(df).first().bin == 9


class TestKappa:
    def test_identical_raters(self, spark):
        df = spark.createDataFrame(
            [(True, True)] * 7 + [(False, False)] * 3, "a boolean, b boolean"
        )
        assert evaluate.rater_kappa(df, "a", "b").first().kappa == 1.0

    def test_hand_computed_2x2(self, spark):
        # classic example: n11=20 n10=5 n01=10 n00=15, N=50
        rows = (
            [(True, True)] * 20 + [(True, False)] * 5
            + [(False, True)] * 10 + [(False, False)] * 15
        )
        df = spark.createDataFrame(rows, "a boolean, b boolean")
        got = evaluate.rater_kappa(df, "a", "b").first()
        po = 35 / 50
        pe = (25 / 50) * (30 / 50) + (25 / 50) * (20 / 50)
        assert abs(got.kappa - (po - pe) / (1 - pe)) < 1e-6
        assert (got.n11, got.n10, got.n01, got.n00) == (20, 5, 10, 15)

    def test_chance_level_agreement_is_zero(self, spark):
        # marginals independent: every cell = product of marginals
        rows = (
            [(True, True)] * 6 + [(True, False)] * 6
            + [(False, True)] * 4 + [(False, False)] * 4
        )
        df = spark.createDataFrame(rows, "a boolean, b boolean")
        assert evaluate.rater_kappa(df, "a", "b").first().kappa == 0.0


class TestRecall:
    def _topk(self, spark, rows):
        return spark.createDataFrame(rows, "query_id long, neighbor_id long")

    def test_perfect_and_zero_recall(self, spark):
        exact = self._topk(spark, [(1, n) for n in range(5)])
        assert evaluate.recall_at_k(exact, exact, 5).first().recall == 1.0
        miss = self._topk(spark, [(1, n + 100) for n in range(5)])
        assert evaluate.recall_at_k(miss, exact, 5).first().recall == 0.0

    def test_partial_overlap_and_lost_query(self, spark):
        exact = self._topk(
            spark, [(1, n) for n in range(5)] + [(2, n) for n in range(5)]
        )
        approx = self._topk(spark, [(1, 0), (1, 1), (1, 99)])  # query 2 lost
        got = {r.query_id: r for r in
               evaluate.recall_at_k(approx, exact, 5).collect()}
        assert got[1].n_hits == 2 and abs(got[1].recall - 0.4) < 1e-9
        assert got[2].n_hits == 0  # exact side drives: lost query reports 0


class TestSelectEmbedId:
    """Writer-adaptation embedding selection (ref user_scripts/
    select_embed_id.py): cluster representatives, per-id variant CER,
    argmin adoption."""

    def test_selects_min_cer_deterministically(self, spark):
        lines = spark.createDataFrame(
            [(d, o, t) for d in (1, 2) for o, t in
             enumerate(["the quick brown fox jumps", "hello world again"])],
            "doc_id long, ord long, text string",
        )
        emb = spark.createDataFrame(
            [(i, [float(i)] * 4 + [0.0] * 60) for i in range(6)],
            "vec_id long, embedding array<float>",
        )
        rows = evaluate.select_embed_id(lines, emb, k=3, iters=2).collect()
        assert len(rows) == 3  # one row per cluster representative
        # every id scored the SAME sample: constant denominator
        assert len({r.char_total for r in rows}) == 1
        # selected == argmin(char_errors, embed_id), exactly one
        best = min(rows, key=lambda r: (r.char_errors, r.embed_id))
        assert [r.embed_id for r in rows if r.selected] == [best.embed_id]
        # cer is the exact ratio rounded
        for r in rows:
            assert abs(r.cer - round(r.char_errors / r.char_total, 6)) < 1e-9
        # deterministic across runs
        again = evaluate.select_embed_id(lines, emb, k=3, iters=2).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
