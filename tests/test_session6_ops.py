"""Semantic probes for the session-6 operator wave: n-gram novelty,
containment dedup, CCNet buckets, margin mining, T5 span corruption,
and HITS — properties the oracle-parity hash can't articulate
(reconstruction invariants, direction semantics, normalization)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from pero_ocr_spark.operators import dedup, linkgraph, sampling, similarity, textstats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- novelty


def test_ngram_novelty_first_occurrence_wins(spark):
    d = _docs(
        spark,
        [
            (1, "a b c d e f"),  # introduces both 5-grams
            (2, "a b c d e f"),  # exact copy: zero novelty
            (3, "x y z w v u"),  # disjoint: full novelty
        ],
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty"])
        for r in textstats.ngram_novelty(d, n=5).collect()
    }
    assert got[1] == (2, 2, 1.0)
    assert got[2] == (2, 0, 0.0)
    assert got[3] == (2, 2, 1.0)


def test_ngram_novelty_skips_short_docs(spark):
    d = _docs(spark, [(1, "a b c"), (2, "a b c d e")])
    rows = textstats.ngram_novelty(d, n=5).collect()
    assert [r["doc_id"] for r in rows] == [2]


# ------------------------------------------------------------ containment


def test_containment_subset_scores_one(spark):
    # doc 1's shingle set is a strict subset of doc 2's
    d = _docs(
        spark,
        [
            (1, "a b c d"),
            (2, "a b c d e f"),
            (3, "q r s t u v"),  # shares nothing
        ],
    )
    rows = dedup.containment_pairs(d, n=3, min_containment=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["containment"] == 1.0
    assert r["direction"] == "a_in_b"  # the SMALLER set is contained
    assert r["jaccard"] < 1.0  # asymmetric pair invisible at jaccard=1


def test_containment_direction_flips_with_sizes(spark):
    d = _docs(spark, [(1, "a b c d e f"), (2, "a b c d")])
    r = dedup.containment_pairs(d, n=3, min_containment=0.5).collect()[0]
    assert r["direction"] == "b_in_a"
    assert r["size_a"] > r["size_b"]


# ---------------------------------------------------------- ccnet buckets


def test_ccnet_buckets_terciles_per_language(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = textstats.ccnet_buckets(docs)
    per = (
        out.groupBy("lang", "bucket")
        .count()
        .groupBy("lang")
        .agg(
            F.max("count").alias("mx"),
            F.min("count").alias("mn"),
            F.sum("count").alias("n"),
            F.count("*").alias("n_buckets"),
        )
        .collect()
    )
    for r in per:
        # exact ntile: bucket sizes differ by at most 1 within a language
        if r["n"] >= 3:
            assert r["n_buckets"] == 3
            assert r["mx"] - r["mn"] <= 1, r


def test_ccnet_buckets_head_is_most_fluent(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = textstats.ccnet_buckets(docs)
    agg = (
        out.groupBy("lang", "bucket")
        .agg(F.min("avg_logprob").alias("lo"), F.max("avg_logprob").alias("hi"))
        .collect()
    )
    by = {(r["lang"], r["bucket"]): r for r in agg}
    for (lang, bucket), r in by.items():
        if bucket == "head" and (lang, "tail") in by:
            # every head doc is at least as fluent as every tail doc
            assert r["lo"] >= by[(lang, "tail")]["hi"]


# ---------------------------------------------------------- margin mining


def test_margin_suppresses_hub(spark):
    # vec 100 is a hub: moderately close to EVERYTHING. vec 101 is the
    # query's genuine match: closest to the query, far from others.
    rows = [
        (0, [1.0, 0.0, 0.0], 0),        # query
        (100, [0.8, 0.6, 0.0], 1),      # hub-ish: close to query AND others
        (101, [0.98, 0.199, 0.0], 1),   # true match
        (102, [0.6, 0.8, 0.0], 1),
        (103, [0.55, 0.835, 0.0], 1),
        (104, [0.5, 0.866, 0.0], 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = similarity.margin_topk(emb, [0], k_nn=3, k_out=5)
    got = {r["neighbor_id"]: r for r in out.collect()}
    # raw cosine already ranks 101 first here; the margin must KEEP it
    # first and rank every candidate deterministically
    assert got[101]["rank"] == 1
    ranks = sorted(r["rank"] for r in got.values())
    assert ranks == list(range(1, len(got) + 1))


def test_margin_matches_manual_ratio(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = similarity.margin_topk(emb, [0, 1], k_nn=4, k_out=1).collect()
    assert {r["query_id"] for r in out} == {0, 1}
    for r in out:
        assert r["margin"] > 0


# --------------------------------------------------------- span corruption


def _reconstruct(input_text: str, target_text: str) -> str:
    """Invert the corruption: substitute each input sentinel with its
    target span."""
    spans: dict[int, list[str]] = {}
    cur = None
    for tok in target_text.split(" "):
        m = re.fullmatch(r"<extra_id_(\d+)>", tok)
        if m:
            cur = int(m.group(1))
            spans[cur] = []
        else:
            spans[cur].append(tok)
    out: list[str] = []
    for tok in input_text.split(" "):
        m = re.fullmatch(r"<extra_id_(\d+)>", tok)
        out.extend(spans[int(m.group(1))] if m else [tok])
    return " ".join(out)


def test_span_corruption_reconstructs_original(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = sampling.span_corruption(docs, mask_pct=15)
    joined = pairs.join(docs.select("doc_id", "text"), "doc_id").collect()
    assert len(joined) == docs.count()
    n_masked = 0
    for r in joined:
        assert _reconstruct(r["input_text"], r["target_text"]) == r["text"]
        n_masked += r["n_spans"]
    assert n_masked > 0  # the mask actually fires at 15%


def test_span_corruption_collapses_runs(spark):
    d = _docs(spark, [(7, " ".join(f"w{i}" for i in range(200)))])
    r = sampling.span_corruption(d, mask_pct=60).collect()[0]
    # at 60% mask rate runs MUST occur: fewer spans than masked tokens
    masked_tokens = sum(
        len(s.split(" ")) - 1
        for s in re.split(r"<extra_id_\d+>", r["target_text"])
        if s.strip()
    )
    assert 0 < r["n_spans"] <= masked_tokens
    # sentinels in the input are exactly 0..n_spans-1 in order
    ids = [int(m) for m in re.findall(r"<extra_id_(\d+)>", r["input_text"])]
    assert ids == list(range(r["n_spans"]))


def test_span_corruption_deterministic(spark):
    d = _docs(spark, [(11, "alpha beta gamma delta epsilon zeta eta")])
    a = sampling.span_corruption(d).collect()[0]
    b = sampling.span_corruption(d).collect()[0]
    assert (a["input_text"], a["target_text"]) == (
        b["input_text"],
        b["target_text"],
    )


# ------------------------------------------------------------------- HITS


def test_hits_normalized_and_bounded(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = linkgraph.hits(docs, n_docs=docs.count(), iterations=3)
    agg = out.agg(
        F.max("authority").alias("ma"),
        F.max("hub").alias("mh"),
        F.min("authority").alias("na"),
        F.min("hub").alias("nh"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert agg["n"] == docs.count()
    assert agg["ma"] == 1.0 and agg["mh"] == 1.0
    assert agg["na"] >= 0.0 and agg["nh"] >= 0.0


# ------------------------------------------------------- power iteration


def test_top_component_finds_dominant_axis(spark):
    import math

    # anisotropic cloud: dim 2 carries 10x the variance of dim 0
    rows = []
    for i in range(40):
        a = math.sin(i * 1.7)  # deterministic "noise" in [-1, 1]
        rows.append((i, [0.3 * a, 0.0, 10.0 * (i - 20) / 20.0, 0.1 * a]))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    out = {
        r["vec_id"]: r["projection"]
        for r in similarity.top_component(emb, iterations=3).collect()
    }
    # projections must order like the dominant coordinate (up to sign)
    coords = {i: 10.0 * (i - 20) / 20.0 for i in range(40)}
    by_proj = sorted(out, key=out.get)
    by_coord = sorted(coords, key=coords.get)
    assert by_proj == by_coord or by_proj == by_coord[::-1]


def test_top_component_deterministic(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = similarity.top_component(emb).collect()
    b = similarity.top_component(emb).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ------------------------------------------------------------ rank fusion


def test_rank_fusion_structure(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = similarity.rank_fusion(
        docs, emb, ["spark", "window", "merge"], query_vec_id=0, top_k=10
    ).collect()
    assert len(rows) == 10
    assert [r["fused_rank"] for r in rows] != []
    assert sorted(r["fused_rank"] for r in rows) == list(range(1, 11))
    scores = [r["rrf_score"] for r in sorted(rows, key=lambda r: r["fused_rank"])]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r["lex_rank"] is not None or r["sem_rank"] is not None


def test_rank_fusion_both_lists_beat_one(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = similarity.rank_fusion(
        docs, emb, ["spark", "window", "merge"], query_vec_id=0, top_k=20
    ).collect()
    both = [r for r in rows if r["lex_rank"] and r["sem_rank"]]
    single_best = min(
        (r["fused_rank"] for r in rows if not (r["lex_rank"] and r["sem_rank"])),
        default=None,
    )
    if both and single_best is not None:
        # some doc retrieved by BOTH modalities must outrank the best
        # single-modality doc whenever its ranks aren't pathological
        assert min(r["fused_rank"] for r in both) < single_best


# --------------------------------------------------------------- PQ / ADC


def test_pq_recall_vs_brute_force(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qids = [0, 1, 2, 3]
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(emb, qids, k=10).collect()
    }
    pq = similarity.pq_topk(emb, qids, m=4, ksub=16, iters=3, k=10).collect()
    assert len(pq) == 40
    hits = sum((r["query_id"], r["neighbor_id"]) in brute for r in pq)
    # PQ is lossy, but 16 cells x 4 subspaces on this corpus must keep
    # a meaningful fraction of the true neighborhood
    assert hits >= 10, f"PQ recall@10 too low: {hits}/40"


def test_pq_distances_monotone_per_query(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = similarity.pq_topk(emb, [0], m=4, ksub=16, iters=3, k=5).collect()
    rows.sort(key=lambda r: r["rank"])
    dists = [r["adc_dist"] for r in rows]
    assert dists == sorted(dists)
    assert all(r["neighbor_id"] != 0 for r in rows)


# ------------------------------------------------------------------- EWMA


def test_ewma_recurrence_manual(spark):
    from pero_ocr_spark.operators import timeseries
    import datetime

    rows = [
        (1, datetime.datetime(2026, 1, 1, 0, 0, i), 7, "view", float(v), "{}")
        for i, v in enumerate([10.0, 20.0, 30.0])
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    r = timeseries.ewma_level(ev, alpha=0.3).collect()[0]
    # s1=10, s2=.3*20+.7*10=13, s3=.3*30+.7*13=18.1
    assert r["n_obs"] == 3
    assert abs(r["ewma"] - 18.1) < 1e-9
    assert r["last_value"] == 30.0


def test_ewma_single_observation_is_identity(spark):
    from pero_ocr_spark.operators import timeseries
    import datetime

    ev = spark.createDataFrame(
        [(1, datetime.datetime(2026, 1, 1), 9, "view", 42.5, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    r = timeseries.ewma_level(ev).collect()[0]
    assert r["ewma"] == 42.5 and r["n_obs"] == 1


# -------------------------------------------------------------- triangles


def test_triangle_count_on_known_graph(spark):
    from pero_ocr_spark.operators import linkgraph

    # K4 minus one edge has exactly 2 triangles, 4 nodes, 5 edges
    # synth_edges derives edges from doc_id arithmetic, so probe the
    # internals directly with a hand-built undirected edge list is not
    # possible through the public fn; instead verify the invariant on
    # the synthetic graph: every triangle is a closed wedge, so
    # 3*triangles <= wedges and the coefficient lands in [0, 1]
    docs = spark.range(30).withColumnRenamed("id", "doc_id")
    r = linkgraph.triangle_stats(docs, n_docs=30).collect()[0]
    assert r["n_nodes"] >= 1 and r["n_edges"] >= 1
    assert 3 * r["n_triangles"] <= r["n_wedges"]
    assert 0.0 <= r["global_clustering"] <= 1.0


def test_triangle_orientation_counts_each_once(spark):
    from pero_ocr_spark.operators import linkgraph

    # brute-force cross-check at tiny scale: count triangles by
    # enumerating all node triples over the same synthetic graph
    docs = spark.range(24).withColumnRenamed("id", "doc_id")
    got = linkgraph.triangle_stats(docs, n_docs=24).collect()[0]
    edges = {
        (r["a"], r["b"])
        for r in linkgraph.synth_edges(docs, 24)
        .selectExpr("least(src,dst) a", "greatest(src,dst) b")
        .distinct()
        .collect()
    }
    nodes = sorted({v for e in edges for v in e})
    brute = sum(
        1
        for i, a in enumerate(nodes)
        for b in nodes[i + 1 :]
        for c in nodes
        if c > b
        and (a, b) in edges
        and (b, c) in edges
        and (a, c) in edges
    )
    assert got["n_triangles"] == brute
