

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


def test_pack_interleaved_budget_and_media_cost(spark):
    from pyspark.sql import functions as F

    from pero_ocr_spark.operators import sampling

    # one bucket (doc_id % 32 == id for ids < 32... use ids in one
    # residue class): docs 0,32,64,... all land in bucket 0
    rows = []
    for i in range(8):
        doc = i * 32
        rows.append((doc, "text", "a b c d e f g h", "", 0))  # 8 tokens
        rows.append((doc, "media", "", f"img://{doc}/1", 1))  # 64 tokens
    spans = spark.createDataFrame(
        rows, ["doc_id", "kind", "text", "media_ref", "ord"]
    )
    out = sampling.pack_sequences_interleaved(
        spans, budget=144, n_buckets=32
    ).collect()
    by_doc = {r["doc_id"]: r for r in out}
    assert all(r["n_tokens"] == 72 and r["n_media"] == 1 for r in out)
    # 72 tokens/doc, budget 144: docs pack in pairs (start offsets
    # 0,72 -> pack 0; 144,216 -> pack 1; ...)
    assert by_doc[0]["seq_id"] == by_doc[32]["seq_id"]
    assert by_doc[64]["seq_id"] == by_doc[96]["seq_id"]
    assert by_doc[0]["seq_id"] != by_doc[64]["seq_id"]
    assert by_doc[32]["seq_pos"] == 1


def test_balanced_shards_matches_global_cumsum(spark):
    from pero_ocr_spark.operators import sampling

    # skewed sizes: doc 7 is 100x the rest — hash sharding would give
    # one shard 100x the bytes; balanced sharding keeps totals bounded
    rows = [(i, 10_000 if i == 7 else 100 + (i * 37) % 250)
            for i in range(200)]
    docs = spark.createDataFrame(rows, ["doc_id", "n_chars"])
    out = sampling.balanced_shards(
        docs, n_shards=8, bucket_width=16
    ).toPandas().sort_values("doc_id").reset_index(drop=True)

    # brute-force single-threaded reference: exclusive cumsum DIV target
    sizes = [r[1] for r in rows]
    total = sum(sizes)
    target = -(-total // 8)
    cum = 0
    for i, (doc_id, sz) in enumerate(rows):
        assert out.loc[i, "doc_id"] == doc_id
        assert out.loc[i, "shard"] == cum // target, (doc_id, cum, target)
        cum += sz

    # contiguity: shard ids are non-decreasing in doc_id order
    assert (out["shard"].diff().dropna() >= 0).all()
    # balance: every realized shard total < target + max doc cost
    per = out.groupby("shard")["cost"].sum()
    assert (per < target + max(sizes)).all(), per.to_dict()
    # partition-layout independence
    again = sampling.balanced_shards(
        docs.repartition(13), n_shards=8, bucket_width=16
    ).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert (out == again).all().all()


def test_leakage_safe_split_clusters_never_straddle(spark):
    from pero_ocr_spark.operators import sampling

    docs = spark.createDataFrame(
        [(i,) for i in range(300)], ["doc_id"]
    )
    # three synthetic near-dup clusters, min-doc_id labels
    clusters = spark.createDataFrame(
        [(1, 1), (57, 1), (199, 1), (8, 8), (12, 8), (20, 20), (21, 20)],
        ["doc_id", "cluster_id"],
    )
    out = sampling.leakage_safe_split(docs, clusters).toPandas()
    assert len(out) == 300
    by_group = out.groupby("group_id")["split"].nunique()
    assert (by_group == 1).all()  # a cluster is entirely one split
    # cluster members share the label's split, singletons their own
    g = out.set_index("doc_id")
    assert g.loc[57, "split"] == g.loc[1, "split"]
    assert g.loc[199, "split"] == g.loc[1, "split"]
    assert g.loc[12, "split"] == g.loc[8, "split"]
    # singleton split matches the plain residue rule
    r = (123 * 69069 + 12345) % 2147483647 % 100
    want = "test" if r < 10 else ("val" if r < 20 else "train")
    assert g.loc[123, "split"] == want
    # all three splits occur
    assert set(out["split"]) == {"train", "val", "test"}


def test_skew_profile_salt_factors(spark):
    from pero_ocr_spark.operators import sampling

    # one whale key holding half the bytes among 5 keys
    rows = [(i, "whale" if i < 50 else f"s{i % 4}",
             1000 if i < 50 else 125) for i in range(150)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    out = {r["source"]: r for r in
           sampling.skew_profile(docs, target_partitions=32).collect()}
    assert len(out) == 5
    whale = out["whale"]
    assert whale["cost_share"] == 0.8  # 50k of 62.5k
    assert whale["skew_factor"] == 4.0
    assert whale["salt_factor"] == 26  # ceil(0.8 * 32)
    for k, r in out.items():
        if k != "whale":
            # share 0.05 still exceeds 1/32 -> split in 2
            assert r["salt_factor"] == 2, (k, r)
            assert r["cost_share"] == 0.05
    assert abs(sum(r["cost_share"] for r in out.values()) - 1.0) < 1e-6
    # a uniform key needs no salting at all
    uni = spark.createDataFrame(
        [(i, f"s{i % 64}", 100) for i in range(640)],
        ["doc_id", "source", "n_chars"],
    )
    out2 = sampling.skew_profile(uni, target_partitions=32).collect()
    assert all(r["salt_factor"] == 1 for r in out2)


class TestDoremiMixture:
    def _losses(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, source string, loss double"
        )

    def test_uniform_loss_gives_uniform_weights(self, spark):
        from pero_ocr_spark.operators import sampling

        rows = [(i, f"s{i % 4}", 2.5) for i in range(40)]
        got = sampling.doremi_mixture(self._losses(spark, rows)).collect()
        assert all(abs(r.weight - 0.25) < 1e-6 for r in got)
        assert all(r.excess == 0.0 for r in got)

    def test_lossy_domain_upweighted_and_normalized(self, spark):
        from pero_ocr_spark.operators import sampling

        rows = [(i, "easy", 2.0) for i in range(10)]
        rows += [(100 + i, "hard", 6.0) for i in range(10)]
        rows += [(200 + i, "mid", 4.0) for i in range(10)]
        got = {r.source: r for r in
               sampling.doremi_mixture(self._losses(spark, rows)).collect()}
        assert got["hard"].weight > got["mid"].weight > got["easy"].weight
        assert abs(sum(r.weight for r in got.values()) - 1.0) < 1e-5
        assert got["hard"].excess == 4.0 and got["easy"].excess == 0.0


def test_fim_transform_reconstruction_and_mixture(spark):
    from pero_ocr_spark.operators.sampling import fim_transform

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(i % 7 + 1))) for i in range(40)],
        "doc_id long, text string",
    )
    out = fim_transform(docs).collect()
    originals = {r["doc_id"]: r["text"] for r in docs.collect()}
    n_fim = 0
    for r in out:
        words = originals[r["doc_id"]].split()
        assert r["n_prefix"] + r["n_middle"] + r["n_suffix"] == len(words)
        if not r["fim_applied"]:
            assert r["transformed"] == originals[r["doc_id"]]
            assert (r["n_middle"], r["n_suffix"]) == (0, 0)
            continue
        n_fim += 1
        t = r["transformed"]
        # sentinels present exactly once, in PSM order
        assert t.index("<fim_prefix>") < t.index("<fim_suffix>") < t.index("<fim_middle>")
        # reconstruct the original from the three segments
        body = t.replace("<fim_prefix>", "\x00").replace(
            "<fim_suffix>", "\x00"
        ).replace("<fim_middle>", "\x00")
        segs = [s.split() for s in body.split("\x00")[1:]]
        pre, suf, mid = segs
        assert pre + mid + suf == words
        assert (len(pre), len(mid), len(suf)) == (
            r["n_prefix"], r["n_middle"], r["n_suffix"]
        )
    # the 50% mixture actually fires both ways
    assert 0 < n_fim < len(out)


def test_fim_transform_partitioning_invariant(spark):
    from pero_ocr_spark.operators.sampling import fim_transform

    docs = spark.createDataFrame(
        [(i, "a b c d e f g h") for i in range(20)],
        "doc_id long, text string",
    )
    one = {r["doc_id"]: r["transformed"]
           for r in fim_transform(docs.coalesce(1)).collect()}
    many = {r["doc_id"]: r["transformed"]
            for r in fim_transform(docs.repartition(7)).collect()}
    assert one == many
