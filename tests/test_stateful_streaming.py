"""applyInPandasWithState custom stateful streaming operator."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from pero_ocr_spark.streaming import events as ev


def test_stateful_totals_match_batch(spark, sf_dir):
    stream = ev.running_user_totals_streaming(spark, sf_dir).toPandas()
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .toPandas()
    )
    cols = ["user_id", "n_events", "total_value"]
    s = stream[cols].sort_values("user_id").reset_index(drop=True)
    b = batch[cols].sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(s, b, check_dtype=False)
    assert len(s) > 0
