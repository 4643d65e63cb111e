

def test_weighted_aes_favors_heavy_weights(spark):
    from pyspark.sql import functions as F

    from pero_ocr_spark.operators import sampling

    # 10 heavy docs (w=10000) among 90 light (w=1): A-ES top-10
    # should be dominated by the heavy ones
    rows = [(i, "g", 10_000.0 if i < 10 else 1.0) for i in range(100)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "w"])
    out = sampling.weighted_sample_aes(
        docs, F.col("w"), k=10, group_col="source"
    ).collect()
    assert len(out) == 10
    heavy = sum(1 for r in out if r["doc_id"] < 10)
    assert heavy >= 8, [r["doc_id"] for r in out]
    # deterministic: same input -> same sample
    again = sampling.weighted_sample_aes(
        docs.repartition(7), F.col("w"), k=10, group_col="source"
    ).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(
        r["doc_id"] for r in again
    )
