"""Stupid-backoff trigram scoring (operators/textstats.py) vs a serial
replica, plus the branch-ordering properties Brants' scheme promises."""

import math
from collections import Counter

from pero_ocr_spark.operators import textstats


def _backoff_scores(
    corpus: dict[int, str], alpha: float = 0.4
) -> dict[int, tuple[int, float]]:
    train = {d: t for d, t in corpus.items() if d % 2 == 0}
    held = {d: t for d, t in corpus.items() if d % 2 == 1}
    uni, big, tri = Counter(), Counter(), Counter()
    for text in train.values():
        ws = text.split(" ")
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
        tri.update(zip(ws, ws[1:], ws[2:]))
    n_tokens, vsize = sum(uni.values()), len(uni)
    out = {}
    for doc, text in held.items():
        ws = text.split(" ")
        gs = list(zip(ws, ws[1:], ws[2:]))
        if not gs:
            continue
        s = 0.0
        for w1, w2, w3 in gs:
            if (w1, w2, w3) in tri:
                v = tri[(w1, w2, w3)] / big[(w1, w2)]
            elif (w2, w3) in big:
                v = alpha * big[(w2, w3)] / uni[w2]
            else:
                v = alpha * alpha * (uni.get(w3, 0) + 1) / (n_tokens + vsize)
            s += round(math.log10(v), 9)
        out[doc] = (len(gs), round(s / len(gs), 6))
    return out


CORPUS = {
    0: "the cat sat on the mat",
    2: "the dog sat on the rug",
    4: "a cat and a dog and a bird",
    6: "the cat ran to the mat",
    1: "the cat sat on the rug",          # trigram + bigram branches
    3: "a dog and a cat and a mat",       # mostly trigram hits
    5: "zebra quokka axolotl on the mat", # OOV -> unigram floor
    7: "to the",                          # <3 words: absent from output
}


def test_matches_serial_replica(spark):
    df = spark.createDataFrame(list(CORPUS.items()), "doc_id long, text string")
    got = {
        r.doc_id: (r.n_terms, r.avg_log10_score)
        for r in textstats.stupid_backoff_scores(df).collect()
    }
    want = _backoff_scores(CORPUS)
    assert set(got) == set(want)
    for doc in want:
        assert got[doc][0] == want[doc][0], doc
        assert abs(got[doc][1] - want[doc][1]) < 1e-6, doc


def test_branch_ordering(spark):
    # A doc made of seen trigrams must outscore one forced through the
    # bigram backoff, which must outscore pure OOV noise: each backoff
    # level pays another alpha factor by construction.
    corpus = {
        0: "the cat sat on the mat",
        2: "the cat sat on the mat",
        1: "the cat sat on the mat",   # all trigrams seen
        3: "mat the cat sat on on",    # unseen trigrams, seen bigrams
        5: "zz qq xx yy ww vv",        # unseen everything
    }
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    got = {
        r.doc_id: r.avg_log10_score
        for r in textstats.stupid_backoff_scores(df).collect()
    }
    assert got[1] > got[3] > got[5]


def test_seen_trigram_uses_raw_ratio(spark):
    # Unique continuation: "sat on the" always -> "mat" in training, so
    # the held-out term scores log10(1.0) = 0 exactly.
    corpus = {0: "sat on the mat", 1: "sat on the mat"}
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    rows = textstats.stupid_backoff_scores(df).collect()
    assert len(rows) == 1
    assert rows[0].n_terms == 2
    want = _backoff_scores(corpus)[1][1]
    assert abs(rows[0].avg_log10_score - want) < 1e-6
