"""Stage telemetry (A4): the Spark-native analog of the reference's
decoding summaries and time logs (``page_parser.py:147-156``,
``decoding/decoding_itf.py:107-136``) — ``df.observe`` metrics that
ride the existing action instead of separate count jobs, plus a
throughput helper used by the lineage manifest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_spans(df: DataFrame, name: str = "spans") -> tuple[DataFrame, Observation]:
    """Attach span-level counters (rows, docs, text chars) to a span
    frame; read ``obs.get`` after the next action."""
    obs = Observation(name)
    out = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_spans"),
        F.approx_count_distinct("doc_id").alias("n_docs"),
        F.sum(F.length("text")).alias("n_chars"),
    )
    return out, obs


def observe_extraction(
    df: DataFrame, name: str = "extraction"
) -> tuple[DataFrame, Observation]:
    """Exact extraction counters (counts/sums only — ``observe``
    forbids DISTINCT aggregates, and exactness lets a SQL oracle
    reproduce every metric bit-for-bit). The one-action analog of the
    reference's per-run decoding summary (``page_parser.py:147-156``)."""
    obs = Observation(name)
    out = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_spans"),
        F.sum((F.col("kind") == "text").cast("long")).alias("n_text"),
        F.sum((F.col("kind") == "media").cast("long")).alias("n_media"),
        F.sum(F.length("text")).alias("n_chars"),
        F.max("ord").alias("max_ord"),
    )
    return out, obs


def observe_decode(df: DataFrame, name: str = "decode") -> tuple[DataFrame, Observation]:
    """Decode-stage counters: lines, mean confidence, low-confidence
    count (the 'lines examined / decoded' summary analog)."""
    obs = Observation(name)
    out = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_lines"),
        F.avg("confidence").alias("avg_confidence"),
        F.sum((F.col("confidence") < 0.5).cast("long")).alias("n_low_confidence"),
    )
    return out, obs
