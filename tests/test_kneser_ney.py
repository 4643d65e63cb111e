"""Interpolated Kneser-Ney perplexity (operators/textstats.py) vs a
serial replica, plus the continuation-probability property."""

import math
from collections import Counter

from pero_ocr_spark.operators import textstats


def _kn_ppl(corpus: dict[int, str], d: float = 0.75) -> dict[int, float]:
    pair, ctx_tot, fwd, bwd = Counter(), Counter(), {}, {}
    doc_grams = {}
    for doc, text in corpus.items():
        ws = text.split(" ")
        gs = list(zip(ws, ws[1:]))
        doc_grams[doc] = gs
        pair.update(gs)
    for (w1, w2), c in pair.items():
        ctx_tot[w1] += c
        fwd.setdefault(w1, set()).add(w2)
        bwd.setdefault(w2, set()).add(w1)
    npairs = len(pair)
    out = {}
    for doc, gs in doc_grams.items():
        if not gs:
            continue
        s = 0.0
        for w1, w2 in gs:
            p = (
                max(pair[(w1, w2)] - d, 0.0) / ctx_tot[w1]
                + d * len(fwd[w1]) / ctx_tot[w1] * len(bwd[w2]) / npairs
            )
            s += round(math.log2(p), 9)
        out[doc] = round(2.0 ** -(s / len(gs)), 6)
    return out


def test_matches_serial_replica(spark):
    corpus = {
        0: "the cat sat on the mat",
        1: "the dog sat on the rug",
        2: "a cat and a dog and a bird",
        3: "completely novel words everywhere here",
        4: "the the the the",  # degenerate repetition
        5: "single",           # no bigram: absent from output
    }
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    got = {r.doc_id: r.ppl for r in
           textstats.kneser_ney_perplexity(df).collect()}
    want = _kn_ppl(corpus)
    assert set(got) == set(want)
    for doc in want:
        assert abs(got[doc] - want[doc]) < 1e-6, doc


def test_continuation_beats_raw_frequency(spark):
    # 'francisco' is frequent but follows ONE context; 'and' follows
    # many. Kneser-Ney's continuation term must score an unseen-pair
    # completion with 'and' higher than with 'francisco'.
    rows = [(i, "san francisco") for i in range(10)]
    rows += [(100 + i, f"w{i} and v{i}") for i in range(10)]
    rows += [(200, "probe and"), (201, "probe francisco")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.ppl for r in
           textstats.kneser_ney_perplexity(df).collect()}
    # lower perplexity = more probable under the LM
    assert got[200] < got[201]


def test_pmi_collocations_flag_fixed_phrases(spark):
    # 'san francisco' always co-occurs; 'the' pairs with everything
    rows = [(i, f"the w{i} visited san francisco with the w{i+1}")
            for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.w1, r.w2): r for r in
           textstats.pmi_collocations(df, min_count=5, min_pmi=1.0).collect()}
    assert ("san", "francisco") in got
    import math
    # serial replica of the PMI formula for the fixed pair
    n12, n_bigrams = 20, 20 * 7
    n_san = n_fran = 20
    n_tokens = 20 * 8
    want = round(math.log2((n12 / n_bigrams) /
                           ((n_san / n_tokens) * (n_fran / n_tokens))), 6)
    assert abs(got[("san", "francisco")].pmi - want) < 1e-6
    # the fixed phrase outranks pairs involving the promiscuous 'the'
    # ('with the' collocates too here, but with lower PMI since 'the'
    # also follows other contexts)
    the_pmis = [r.pmi for (w1, w2), r in got.items()
                if w1 == "the" or w2 == "the"]
    assert all(got[("san", "francisco")].pmi > p for p in the_pmis)


def test_pmi_min_count_gate(spark):
    rows = [(0, "rare pairing here"), (1, "unrelated words entirely")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # every pair is a hapax: the count gate must empty the result
    assert textstats.pmi_collocations(df, min_count=5).count() == 0


def test_heaps_fit_recovers_exponent(spark):
    # sources built to satisfy V = N^0.5 exactly: source i has V=2^i
    # distinct words each repeated so N = V^2 -> beta must fit ~0.5
    rows = []
    for i in range(3, 7):
        v = 2 ** i
        words = [f"s{i}w{j}" for j in range(v) for _ in range(v)]
        rows.append((i, f"src{i}", " ".join(words)))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = textstats.heaps_fit(df).first()
    assert got.n_sources == 4
    assert abs(got.beta - 0.5) < 1e-6
    assert abs(got.k - 1.0) < 1e-6


def test_heaps_fit_saturated_vocab_flattens(spark):
    # every source shares one tiny fixed vocabulary: beta -> 0
    rows = [(i, f"src{i}", " ".join(["alpha beta gamma"] * (10 * (i + 1))))
            for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = textstats.heaps_fit(df).first()
    assert abs(got.beta) < 1e-6 and got.k == 3.0
