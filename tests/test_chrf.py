"""chrF (operators/errors.py corpus_chrf) vs a serial replica, plus the
metric's defining properties."""

from collections import Counter

from pero_ocr_spark.operators import errors


def _chrf(hyp: str, ref: str, max_n: int = 6, beta: float = 2.0):
    def grams(s, n):
        return Counter(s[i : i + n] for i in range(len(s) - n + 1))

    ps, rs = [], []
    for n in range(1, max_n + 1):
        h, r = grams(hyp, n), grams(ref, n)
        clip = sum(min(c, r[g]) for g, c in h.items())
        ht, rt = max(len(hyp) - n + 1, 0), max(len(ref) - n + 1, 0)
        ps.append(round(clip / ht, 9) if ht > 0 else 0.0)
        rs.append(round(clip / rt, 9) if rt > 0 else 0.0)
    p, r = sum(ps) / max_n, sum(rs) / max_n
    b2 = beta * beta
    f = ((1 + b2) * p * r) / (b2 * p + r) if (b2 * p + r) > 0 else 0.0
    return round(p, 6), round(r, 6), round(f, 6)


CASES = {
    0: ("thecatsatonthemat", "thecatsatonthemat"),   # identical
    1: ("thecxtsatonthemxt", "thecatsatonthemat"),   # char substitutions
    2: ("thecat", "thecatsatonthemat"),              # truncated hyp
    3: ("zzzzqqqq", "thecatsatonthemat"),            # disjoint
    4: ("abc", "abc"),                               # shorter than max_n
    5: ("a", "b"),                                   # single chars
}


def test_matches_serial_replica(spark):
    rows = [
        (doc, hyp, ref) for doc, (hyp, ref) in CASES.items()
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, hyp_str string, ref_str string"
    )
    got = {
        r.doc_id: (r.chrp, r.chrr, r.chrf)
        for r in errors.corpus_chrf(df).collect()
    }
    for doc, (hyp, ref) in CASES.items():
        want = _chrf(hyp, ref)
        for g, w in zip(got[doc], want):
            assert abs(g - w) < 1e-6, (doc, got[doc], want)


def test_metric_properties(spark):
    df = spark.createDataFrame(
        [(d, h, r) for d, (h, r) in CASES.items()],
        "doc_id long, hyp_str string, ref_str string",
    )
    got = {r.doc_id: r.chrf for r in errors.corpus_chrf(df).collect()}
    assert got[0] == 1.0          # identical -> perfect score
    assert got[3] == 0.0          # disjoint char sets -> zero
    assert got[0] > got[1] > got[3]  # more corruption, lower score
    assert got[2] < got[0]        # truncation costs recall


def test_recall_weighting(spark):
    # beta=2 weights recall 2x: dropping half the reference (recall
    # hit) must cost more than padding the hypothesis with junk of the
    # same length (precision hit).
    ref = "abcdefghijklmnop"
    df = spark.createDataFrame(
        [(0, ref[:8], ref), (1, ref + "qrstuvwx", ref)],
        "doc_id long, hyp_str string, ref_str string",
    )
    got = {r.doc_id: r.chrf for r in errors.corpus_chrf(df).collect()}
    assert got[1] > got[0]
