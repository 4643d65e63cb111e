"""HyperLogLog sketch semantics: rank arithmetic, accuracy, mergeability."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from pero_ocr_spark.operators import sketch


def _py_register(entity: str) -> tuple[int, int]:
    """Reference implementation of (idx, rank) for one entity."""
    h = hashlib.sha256(entity.encode()).hexdigest()
    idx = int(h[:3], 16) % sketch.M_REGISTERS
    tail = h[3 : 3 + sketch._RANK_NIBBLES]
    bits = bin(int(tail, 16))[2:].zfill(4 * sketch._RANK_NIBBLES)
    rank = len(bits) - len(bits.lstrip("0")) + 1
    return idx, rank


def test_register_arithmetic_matches_reference(spark):
    ents = [f"entity-{i}" for i in range(300)]
    df = spark.createDataFrame(
        [(e, "g") for e in ents], ["entity", "grp"]
    )
    got = {
        (r["idx"],): r["m"]
        for r in sketch.hll_registers(df, "entity", "grp").collect()
    }
    want: dict[tuple[int], int] = {}
    for e in ents:
        idx, rank = _py_register(e)
        want[(idx,)] = max(want.get((idx,), 0), rank)
    assert got == want


def test_estimate_accuracy_both_branches(spark):
    # 200 distinct -> linear-counting branch; 20000 -> raw estimator.
    for n, tol in ((200, 0.10), (20_000, 0.10)):
        df = spark.createDataFrame(
            [(f"e{i}", "g") for i in range(n)], ["entity", "grp"]
        )
        regs = sketch.hll_registers(df, "entity", "grp")
        est = sketch.hll_estimate(regs).collect()[0]["hll_distinct"]
        assert abs(est - n) / n < tol, (n, est)


def test_duplicates_do_not_inflate(spark):
    base = [(f"e{i}", "g") for i in range(500)]
    once = spark.createDataFrame(base, ["entity", "grp"])
    thrice = spark.createDataFrame(base * 3, ["entity", "grp"])
    e1 = sketch.hll_estimate(
        sketch.hll_registers(once, "entity", "grp")
    ).collect()[0]["hll_distinct"]
    e3 = sketch.hll_estimate(
        sketch.hll_registers(thrice, "entity", "grp")
    ).collect()[0]["hll_distinct"]
    assert e1 == e3


def test_merge_equals_union_sketch(spark):
    # sketch(A) merged with sketch(B) == sketch(A ∪ B), register-exact
    rows = [(f"e{i}", "a" if i % 2 else "b") for i in range(2_000)]
    df = spark.createDataFrame(rows, ["entity", "grp"])
    regs = sketch.hll_registers(df, "entity", "grp")
    merged = {
        r["idx"]: r["m"]
        for r in sketch.merge_registers(regs).collect()
    }
    union = {
        r["idx"]: r["m"]
        for r in sketch.hll_registers(
            df.withColumn("grp", F.lit("u")), "entity", "grp"
        ).collect()
    }
    assert merged == union


def test_shingle_cardinality_shape(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = sketch.hll_shingle_cardinality(docs).collect()
    scopes = {r["scope"] for r in out}
    assert "ALL" in scopes and len(scopes) == len(out)
    per_source_exact = sum(
        r["exact_shingles"] for r in out if r["scope"] != "ALL"
    )
    all_row = next(r for r in out if r["scope"] == "ALL")
    # union cardinality can't exceed the sum of the parts
    assert all_row["exact_shingles"] <= per_source_exact
    for r in out:
        assert abs(r["rel_err"]) < 0.15, r
        assert math.isclose(
            r["rel_err"],
            (r["hll_shingles"] - r["exact_shingles"]) / r["exact_shingles"],
            abs_tol=1e-6,
        )


def test_cms_never_underestimates_and_recovers_heavy_hitter(spark):
    # planted heavy hitter: "hot" appears 400x, the rest 1-2x
    rows = [("hot hot hot hot",)] * 100 + [
        (f"cold{i} cold{i+1} cold{i+2} filler",) for i in range(200)
    ]
    docs = spark.createDataFrame(rows, ["text"])
    out = sketch.cms_heavy_hitters(docs, n=3, k=5).collect()
    assert all(r["cms_n"] >= r["exact_n"] for r in out)
    top = max(out, key=lambda r: r["exact_n"])
    assert top["shingle"] == "hot hot hot"
    assert top["exact_n"] == 200  # 2 grams per planted doc x 100


def test_cms_estimate_exact_when_sparse(spark):
    # far fewer entities than counters -> collisions are unlikely and
    # the min over 4 independent rows is almost surely collision-free
    docs = spark.createDataFrame(
        [(f"a{i} b{i} c{i} d{i}",) for i in range(50)], ["text"]
    )
    out = sketch.cms_heavy_hitters(docs, n=3, k=10).collect()
    assert all(r["cms_n"] == r["exact_n"] for r in out)


def test_kmv_estimate_exact_below_k(spark):
    df = spark.createDataFrame([(f"u{i}",) for i in range(100)], ["url"])
    row = sketch.kmv_estimate(sketch.kmv_sketch(df, "url")).collect()[0]
    assert row["n_sketch"] == 100 and row["est_distinct"] == 100.0


def test_kmv_estimate_accuracy_above_k(spark):
    df = spark.createDataFrame([(f"u{i}",) for i in range(5_000)], ["url"])
    row = sketch.kmv_estimate(sketch.kmv_sketch(df, "url")).collect()[0]
    assert row["n_sketch"] == sketch.KMV_K
    assert abs(row["est_distinct"] - 5_000) / 5_000 < 0.2


def test_kmv_overlap_identical_and_disjoint(spark):
    a = spark.createDataFrame([(f"u{i}",) for i in range(1_000)], ["url"])
    same = sketch.kmv_snapshot_overlap(a, a).collect()[0]
    assert same["est_jaccard"] == 1.0 and same["exact_jaccard"] == 1.0
    b = spark.createDataFrame([(f"w{i}",) for i in range(1_000)], ["url"])
    disj = sketch.kmv_snapshot_overlap(a, b).collect()[0]
    assert disj["est_jaccard"] == 0.0 and disj["exact_jaccard"] == 0.0


def test_kmv_jaccard_tracks_true_overlap(spark):
    a = spark.createDataFrame([(f"u{i}",) for i in range(2_000)], ["url"])
    b = spark.createDataFrame(
        [(f"u{i}",) for i in range(1_000, 3_000)], ["url"]
    )
    row = sketch.kmv_snapshot_overlap(a, b).collect()[0]
    # true jaccard = 1000/3000
    assert abs(row["exact_jaccard"] - 1 / 3) < 1e-6
    assert abs(row["est_jaccard"] - 1 / 3) < 0.12
    assert abs(row["est_union"] - 3_000) / 3_000 < 0.2


def test_histogram_quantiles_error_bounded_by_width(spark):
    import random

    rng = random.Random(7)
    rows = [(rng.randint(0, 1000), "g") for _ in range(2_000)]
    df = spark.createDataFrame(rows, ["val", "grp"])
    out = sketch.histogram_quantiles(df, "val", "grp", width=16).collect()
    assert len(out) == 3
    for r in out:
        assert r["abs_err"] <= 16.0, r


def test_histogram_quantiles_exact_rank_semantics(spark):
    # 1..100 in one group: type-1 quantile at q is value ceil(q*100)
    df = spark.createDataFrame(
        [(i, "g") for i in range(1, 101)], ["val", "grp"]
    )
    out = {
        round(r["q"], 2): r
        for r in sketch.histogram_quantiles(df, "val", "grp").collect()
    }
    assert out[0.5]["exact_v"] == 50.0
    assert out[0.9]["exact_v"] == 90.0
    assert out[0.99]["exact_v"] == 99.0


def test_zipf_fit_recovers_planted_slope(spark):
    from pero_ocr_spark.operators import textstats

    # plant a corpus whose 3-gram frequencies follow freq ~ rank^-1:
    # gram i repeated round(600/i) times, as isolated 3-token docs
    rows = []
    for i in range(1, 40):
        doc = f"w{i}a w{i}b w{i}c"
        rows += [(doc,)] * max(1, round(600 / i))
    docs = spark.createDataFrame(rows, ["text"])
    out = textstats.zipf_fit(docs, n=3, top=40).collect()[0]
    assert out["n_grams"] == 39
    assert abs(out["slope"] - (-1.0)) < 0.05, out


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_sketch_plans_keep_map_side_combine(spark):
    # the 100 TB story rests on partial aggregation BEFORE the
    # exchange: the register/counter tables must reach the shuffle
    # already combined (<= m rows per task), never as raw entity rows
    df = spark.createDataFrame([("a", "g")], ["entity", "grp"])
    regs_plan = _plan(sketch.hll_registers(df, "entity", "grp"))
    assert "partial_max" in regs_plan, regs_plan
    docs = spark.createDataFrame([("x y z w",)], ["text"])
    from pyspark.sql import functions as F

    sh = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("shingle")
    )
    cms_plan = _plan(sketch.cms_counters(sh, "shingle"))
    assert "partial_count" in cms_plan, cms_plan
