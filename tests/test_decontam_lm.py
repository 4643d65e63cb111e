"""Benchmark decontamination + char-bigram perplexity filtering."""

from __future__ import annotations

import math

from pero_ocr_spark.operators import dedup, textstats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_copied_passage(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    train = _docs(
        spark,
        [
            # shares shingles with the benchmark doc -> contaminated
            (1, "alpha beta gamma delta epsilon zeta eta"),
            # disjoint vocabulary -> clean
            (2, "one two three four five six seven"),
            # fewer than n words -> no shingles, omitted
            (3, "too short"),
        ],
    )
    got = {
        r.doc_id: r
        for r in dedup.decontaminate(train, bench, n=5, threshold=0.2).collect()
    }
    assert set(got) == {1, 2}
    # doc 1: 3 distinct 5-grams, 2 of them inside the benchmark doc
    assert (got[1].n_shingles, got[1].n_overlap) == (3, 2)
    assert got[1].contaminated
    assert got[2].n_overlap == 0 and not got[2].contaminated


def test_decontaminate_counts_distinct_shingles_once(spark):
    # repeated passage in the train doc: shingles are per-doc distinct
    bench = _docs(spark, [(100, "a b c d e")])
    train = _docs(spark, [(1, "a b c d e a b c d e")])
    r = dedup.decontaminate(train, bench, n=5, threshold=0.5).collect()[0]
    # 10 words -> 6 positions but only 5 distinct shingles (cycle)
    assert r.n_shingles == 5
    assert r.n_overlap == 1  # only "a b c d e" itself appears in bench
    assert not r.contaminated


def _expected_scores(texts: dict[int, str]) -> dict[int, float]:
    """Driver-side replication of the Laplace bigram LM score."""
    c2: dict[str, int] = {}
    c1: dict[str, int] = {}
    vocab = set()
    for t in texts.values():
        vocab.update(t)
        for a, b in zip(t, t[1:]):
            c2[a + b] = c2.get(a + b, 0) + 1
            c1[a] = c1.get(a, 0) + 1
    v = len(vocab)
    out = {}
    for doc_id, t in texts.items():
        if len(t) < 2:
            continue
        lps = [
            math.log((c2[a + b] + 1.0) / (c1[a] + v))
            for a, b in zip(t, t[1:])
        ]
        out[doc_id] = round(sum(lps) / len(lps), 6)
    return out


def test_lm_scores_match_closed_form(spark):
    texts = {1: "abab", 2: "abcd", 3: "zzzz", 4: "x"}
    df = _docs(spark, list({(k, v) for k, v in texts.items()}))
    got = {
        r.doc_id: r.avg_logprob
        for r in textstats.lm_perplexity_scores(df).collect()
    }
    want = _expected_scores(texts)
    assert got == want  # doc 4 (single char) absent from both
    assert 4 not in got


def test_lm_keep_flag_thresholds_on_rounded_score(spark):
    df = _docs(spark, [(1, "abab"), (2, "abcd"), (3, "qqqq")])
    want = _expected_scores({1: "abab", 2: "abcd", 3: "qqqq"})
    thr = sorted(want.values())[1]  # middle score exactly at threshold
    got = {
        r.doc_id: r.keep
        for r in textstats.lm_perplexity_scores(df, keep_threshold=thr).collect()
    }
    assert got == {k: v >= thr for k, v in want.items()}
    assert sum(got.values()) == 2  # ties kept (>=)


# ---------------------------------------------------- shard shuffle / clf

def test_shard_shuffle_dense_positions_and_determinism(spark):
    from pero_ocr_spark.operators import sampling

    docs = _docs(spark, [(i, "x") for i in range(200)])
    out = sampling.shard_shuffle(docs, n_shards=8).collect()
    assert len(out) == 200
    by_shard: dict[int, list[int]] = {}
    for r in out:
        assert 0 <= r.shard < 8
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss)))  # dense ranks
    # pure function of doc_id: a second run yields the identical map
    again = {
        r.doc_id: (r.shard, r.pos)
        for r in sampling.shard_shuffle(docs, n_shards=8).collect()
    }
    assert {r.doc_id: (r.shard, r.pos) for r in out} == again


def _py_poly_hash(s: str) -> int:
    h = 0
    for c in s:
        h = (h * 31 + ord(c)) % 2_147_483_647
    return h


def test_quality_classifier_matches_closed_form(spark):
    import math

    from pero_ocr_spark.operators import textstats

    texts = {1: "the fast key order", 2: "spark group query row data"}
    df = _docs(spark, list(texts.items()))
    got = {
        r.doc_id: (r.quality_prob, r.keep)
        for r in textstats.quality_classifier_scores(df).collect()
    }
    for doc_id, text in texts.items():
        ws = text.split(" ")
        weights = [
            (_py_poly_hash(w) % 4096 * 2654435761) % 9973 / 9973.0 - 0.5
            for w in ws
        ]
        logit = sum(weights) / len(ws)
        prob = round(1.0 / (1.0 + math.exp(-4.0 * logit)), 6)
        assert got[doc_id] == (prob, prob >= 0.5)
