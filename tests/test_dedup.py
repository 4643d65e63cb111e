"""Dedup operator semantics on small planted-duplicate corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

from pero_ocr_spark.operators import dedup

DOCS = [
    (1, "spark joins hash tables quickly under adaptive execution today"),
    (2, "spark joins hash tables quickly under adaptive execution today"),  # exact dup
    (3, "spark joins hash tables slowly under adaptive execution today"),  # near dup
    (4, "completely different content about window functions and sorting"),
    (5, "another unrelated document discussing parquet column pruning"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_duplicates(spark):
    out = dedup.exact_duplicates(_docs(spark)).collect()
    by_copies = {r["n_copies"]: r for r in out}
    assert len(out) == 4  # 5 docs, one exact pair
    assert by_copies[2]["canonical_doc"] == 1


def test_ngram_jaccard_finds_planted_pairs(spark):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(_docs(spark), threshold=0.3).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.3 <= pairs[(1, 3)] < 1.0
    assert (4, 5) not in pairs


def test_minhash_matches_exact_jaccard(spark):
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(_docs(spark), threshold=0.3).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(_docs(spark), threshold=0.3).collect()
    }
    assert lsh == exact


def test_simhash_identical_docs_distance_zero(spark):
    fps = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_fingerprints(_docs(spark)).collect()
    }
    assert fps[1] == fps[2]
    assert 0 <= fps[1] < 2**32
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_near_dups(_docs(spark), max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0


def test_shingles_distinct_and_count(spark):
    sh = dedup.shingles(_docs(spark), n=3)
    one = sh.filter(F.col("doc_id") == 1)
    assert one.count() == 7  # 9 words -> 7 trigrams, all distinct here
    assert one.distinct().count() == 7
