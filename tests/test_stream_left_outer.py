"""Stream-stream LEFT OUTER interval join (streaming/events.py):
null-row emission by watermark eviction, batch-equivalence under the
deterministic reporting cutoff, and the orphan-detection property."""

from pyspark.sql import functions as F

from pero_ocr_spark.streaming import events as ev


def _batch_reference(spark, sf_dir, lag_hours=6, watermark_h=12, margin_h=1):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    v = events.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").cast("timestamp").alias("vts")
    )
    c = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").cast("timestamp").alias("cts")
    )
    cutoff = (
        v.agg(F.max("vts").alias("m"))
        .crossJoin(c.agg(F.max("cts").alias("mc")))
        .select(
            (
                F.least("m", "mc")
                - F.expr(f"INTERVAL {watermark_h + lag_hours + margin_h} HOURS")
            ).alias("cutoff")
        )
    )
    vv = v.crossJoin(F.broadcast(cutoff)).where(F.col("vts") <= F.col("cutoff"))
    j = vv.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("cts") >= F.col("vts"))
        & (F.col("cts") <= F.col("vts") + F.expr(f"INTERVAL {lag_hours} HOURS")),
        "left",
    )
    return j.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_views"),
        F.sum(F.when(F.col("cts").isNotNull(), 1).otherwise(0)).alias("n_matched"),
        F.sum(F.when(F.col("cts").isNull(), 1).otherwise(0)).alias("n_orphans"),
    )


def test_stream_left_outer_matches_batch(spark, sf_dir):
    got = {
        r.user_id: (r.n_views, r.n_matched, r.n_orphans)
        for r in ev.view_click_left_outer_streaming(spark, sf_dir).collect()
    }
    want = {
        r.user_id: (r.n_views, r.n_matched, r.n_orphans)
        for r in _batch_reference(spark, sf_dir).collect()
    }
    assert got == want
    assert len(got) > 0


def test_orphans_actually_emitted(spark, sf_dir):
    """The point of the left-outer variant: users whose views never
    converted inside the lag window appear with n_orphans > 0 — those
    rows exist ONLY because watermark-driven eviction emitted them."""
    out = ev.view_click_left_outer_streaming(spark, sf_dir)
    orphans = out.agg(F.sum("n_orphans")).collect()[0][0]
    matched = out.agg(F.sum("n_matched")).collect()[0][0]
    assert orphans and orphans > 0
    assert matched and matched > 0
