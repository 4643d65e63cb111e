"""Driver-facing query registry.

Each entry pairs a Spark implementation (an operator from SURVEY.md §2
exercised over the driver's parquet tables) with an equivalent DuckDB
oracle SQL string. Column names/types are aligned on both sides; float
aggregates are rounded identically so the driver's value-hash matches.

Registry: name -> (spark_fn(spark, sf_dir) -> DataFrame, oracle_sql | None)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pero_ocr_spark import corpus
from pero_ocr_spark.operators import extract

QueryFn = Callable[[SparkSession, str], DataFrame]
_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = (fn, sql)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def queries() -> dict[str, QueryFn]:
    return {k: fn for k, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {k: sql for k, (_, sql) in _REGISTRY.items() if sql is not None}


# ---------------------------------------------------------------------------
# Flagship: full extraction pipeline (SURVEY §2: S1/S2 scan analog, J2/R13
# filters, O1/O5 reading order, R1 explode) over the interleaved corpus.
# ---------------------------------------------------------------------------

_EXTRACT_ORACLE = f"""
{corpus.SPANS_CTE}
SELECT doc_id, kind, text, media_ref,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY span_offset) - 1 AS BIGINT) AS ord
FROM spans
WHERE kind = 'media'
   OR (kind = 'text' AND text <> '' AND text NOT IN ('the', 'a'))
"""


@register("extract_spans", _EXTRACT_ORACLE)
def q_extract_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract.extract_spans(corpus.spans_table(spark, sf_dir))


# ---------------------------------------------------------------------------
# R2/R3/R5/R7 — CTC recognition: synthetic sparse logits → batched greedy
# decode in mapInPandas. decode(synth(text)) == text, so the oracle is the
# text spans themselves (strings only; float confidence is pytest-covered).
# ---------------------------------------------------------------------------

_DECODE_ORACLE = f"""
{corpus.SPANS_CTE}
, extracted AS (
  SELECT doc_id, kind, text,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY span_offset) - 1
              AS BIGINT) AS ord
  FROM spans
  WHERE kind = 'media'
     OR (kind = 'text' AND text <> '' AND text NOT IN ('the', 'a'))
)
SELECT doc_id, 'l' || CAST(ord AS VARCHAR) AS line_id, text AS transcription
FROM extracted WHERE kind = 'text'
"""


@register("ctc_decode_greedy", _DECODE_ORACLE)
def q_ctc_decode_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import ctc

    logits = ctc.pack_by_length(ctc.logits_table(spark, sf_dir))
    return ctc.decode_greedy(logits).select("doc_id", "line_id", "transcription")


@register("ctc_decode_beam", _DECODE_ORACLE)
def q_ctc_decode_beam(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import ctc

    logits = ctc.pack_by_length(ctc.logits_table(spark, sf_dir))
    return ctc.decode_beam(logits, beam_size=4, confidence_gate=0.9).select(
        "doc_id", "line_id", "transcription"
    )


# ---------------------------------------------------------------------------
# O1/O2 — deterministic reading-order window (layout_helpers.py:261-272,
# with the random tiebreak replaced by a stable key).
# ---------------------------------------------------------------------------


@register(
    "reading_order_window",
    """
    SELECT l_orderkey,
           l_linenumber,
           CAST(row_number() OVER (
                PARTITION BY l_orderkey
                ORDER BY l_shipdate, l_linenumber) - 1 AS BIGINT) AS ord
    FROM lineitem
    """,
)
def q_reading_order_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_shipdate", "l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.row_number().over(w) - 1).cast("long").alias("ord"),
    )


# ---------------------------------------------------------------------------
# J4 — multi-engine merge: best hypothesis per line by confidence with
# deterministic tiebreak (merge_ocr_results.py:50-75).
# ---------------------------------------------------------------------------


@register(
    "merge_best_hypothesis",
    """
    SELECT l_orderkey, l_linenumber AS best_line, l_extendedprice AS best_price
    FROM (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_extendedprice DESC, l_linenumber) AS rn
      FROM lineitem)
    WHERE rn = 1
    """,
)
def q_merge_best_hypothesis(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_linenumber")
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_orderkey",
            F.col("l_linenumber").alias("best_line"),
            F.col("l_extendedprice").alias("best_price"),
        )
    )


# ---------------------------------------------------------------------------
# R13 — confidence filter as a Catalyst predicate (page_parser.py:510-513),
# plus an aggregation proving pushdown-friendly shape.
# ---------------------------------------------------------------------------


@register(
    "confidence_filter_agg",
    """
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE n_chars > 100 AND lang IN ('en', 'de')
    GROUP BY source
    """,
)
def q_confidence_filter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.filter((F.col("n_chars") > 100) & F.col("lang").isin("en", "de"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# A1 — CER aggregation via built-in levenshtein (compare_page_xml_texts.py:
# 39-83): hyp/ref pairs joined by id, per-group error sums.
# ---------------------------------------------------------------------------


@register(
    "cer_aggregate",
    """
    SELECT a.lang,
           CAST(sum(levenshtein(a.text, b.text)) AS BIGINT) AS sum_dist,
           CAST(sum(length(b.text)) AS BIGINT) AS sum_ref_len,
           round(CAST(sum(levenshtein(a.text, b.text)) AS DOUBLE)
                 / sum(length(b.text)), 6) AS cer
    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    GROUP BY a.lang
    """,
)
def q_cer_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    a = docs.select(
        F.col("doc_id"), F.col("lang"), F.col("text").alias("hyp")
    )
    b = docs.select((F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("ref"))
    return (
        a.join(b, "doc_id")
        .groupBy("lang")
        .agg(
            F.sum(F.levenshtein("hyp", "ref")).cast("long").alias("sum_dist"),
            F.sum(F.length("ref")).cast("long").alias("sum_ref_len"),
            F.round(
                F.sum(F.levenshtein("hyp", "ref"))
                / F.sum(F.length("ref")).cast("double"),
                6,
            ).alias("cer"),
        )
    )


# ---------------------------------------------------------------------------
# O6/O8 — top-k per group with deterministic tiebreak (multisort.py:4-15 /
# bag_of_hypotheses.py:64-65 beam top-k analog).
# ---------------------------------------------------------------------------


@register(
    "topk_per_group",
    """
    SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
           CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (
               PARTITION BY l_suppkey
               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      FROM lineitem)
    WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return (
        li.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "rank")
    )


# ---------------------------------------------------------------------------
# A5/A6 — exact median (percentile) per group: line confidence = median of
# char confidences (core/layout.py:517-519).
# ---------------------------------------------------------------------------


@register(
    "median_per_group",
    """
    SELECT l_returnflag,
           round(CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE), 4) AS median_qty,
           round(CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE), 4)
               AS median_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_median_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)").cast("double"), 4).alias(
            "median_qty"
        ),
        F.round(F.expr("percentile(l_extendedprice, 0.5)").cast("double"), 4).alias(
            "median_price"
        ),
    )


# ---------------------------------------------------------------------------
# §2.8 resume — skip-processed anti-join (parse_folder.py:73-102,314-323):
# pending work = all docs minus completed lineage.
# ---------------------------------------------------------------------------


@register(
    "resume_anti_join",
    """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS pending
    FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM orders c
      WHERE c.o_orderkey = o.o_orderkey AND c.o_orderkey % 10 < 7)
    GROUP BY o_orderstatus
    """,
)
def q_resume_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    completed = orders.filter(F.col("o_orderkey") % 10 < 7).select("o_orderkey")
    return (
        orders.join(completed, "o_orderkey", "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count("*").cast("long").alias("pending"))
    )
