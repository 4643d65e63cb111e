"""Bucketed co-located join (operators/colocate.py): result parity with
the plain shuffled plan, and the zero-Exchange plan shape that is the
entire point of paying the clustered write."""

import pytest

from pyspark.sql import functions as F

from pero_ocr_spark.operators import colocate


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bkt")
    spans = spark.range(0, 400).select(
        (F.col("id") % 80).alias("doc_id"),
        F.when(F.col("id") % 11 == 5, "media").otherwise("text").alias("kind"),
        F.when(F.col("id") % 11 == 5, None)
        .otherwise(F.concat(F.lit("w"), F.col("id")))
        .alias("text"),
        (F.col("id") % 7).alias("ord"),
    )
    docs = spark.range(0, 80).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
        F.concat(F.lit("src"), F.col("id") % 4).alias("source"),
    )
    spans_t = colocate.write_bucketed(
        spans, "t_spans_bkt", str(base / "spans")
    )
    docs_t = colocate.write_bucketed(docs, "t_docs_bkt", str(base / "docs"))
    return spans, docs, spans_t, docs_t


def test_matches_unbucketed_join(spark, tables):
    spans, docs, spans_t, docs_t = tables
    got = sorted(
        colocate.colocated_span_enrich(spans_t, docs_t).collect(),
        key=lambda r: (r.doc_id, r.lang, r.source),
    )
    want = sorted(
        colocate.colocated_span_enrich(spans, docs).collect(),
        key=lambda r: (r.doc_id, r.lang, r.source),
    )
    assert got == want
    assert len(got) == 80


def test_join_and_agg_are_shuffle_free(spark, tables):
    """The load-bearing claim: with both sides bucketed on doc_id, the
    SortMergeJoin AND the per-doc aggregation run with zero Exchange
    nodes — no row crosses the network after the ingest write. A
    broadcast join would also show no shuffle Exchange while shipping
    a whole table to every executor, so the test additionally pins
    SortMergeJoin and forbids BroadcastHashJoin."""
    _, _, spans_t, docs_t = tables
    df = colocate.colocated_span_enrich(spans_t, docs_t)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:3000]
    assert "SortMergeJoin" in plan, plan[:3000]
    assert "BroadcastHashJoin" not in plan, plan[:3000]


def test_path_read_would_reshuffle(spark, tables):
    """Control: reading the same files as PLAIN parquet paths (losing
    the catalog bucket metadata) re-introduces the shuffle — proving
    the zero-Exchange plan comes from the bucket distribution, not
    from the data being small."""
    _, _, spans_t, docs_t = tables
    spans_loc = spark.sql("DESCRIBE TABLE EXTENDED t_spans_bkt")
    loc = {r.col_name: r.data_type for r in spans_loc.collect()}["Location"]
    docs_loc = {
        r.col_name: r.data_type
        for r in spark.sql("DESCRIBE TABLE EXTENDED t_docs_bkt").collect()
    }["Location"]
    plain = colocate.colocated_span_enrich(
        spark.read.parquet(loc), spark.read.parquet(docs_loc)
    )
    plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan, plan[:3000]
