"""Bucketed (storage-partitioned) co-located joins.

At 100 TB the dominant cost of a fact↔fact equi-join is the shuffle:
both sides ship corpus-sized rows to the join key's hash partitions.
When the tables are WRITTEN pre-hashed into the same number of buckets
on that key — Spark ``bucketBy`` + ``saveAsTable``, the DataFrame-level
equivalent of Iceberg's ``bucket(N, key)`` partition transform and its
storage-partitioned joins — the scan itself reports the hash
distribution to Catalyst, and the sort-merge join (plus ANY downstream
aggregation clustered on the same key) executes with ZERO Exchange
nodes: the join is a per-bucket file zip, the network never sees a row.

This is the layout the north-rule's 10^12-doc Iceberg corpus would
use for its hottest recurring join (extracted spans ↔ document
metadata, both keyed by doc_id, both far too big to broadcast): pay
one clustered write at ingest, then every downstream join and
per-document aggregation is shuffle-free forever. The bucket count is
chosen at write time to keep bucket×file splits executor-sized at the
target scale (here 8 for the test corpus; ~2^14 at 100 TB).

Spark specifics the tests pin:

* bucketing metadata lives in the session catalog, so the read MUST
  go through ``spark.table(name)`` — a plain parquet path read would
  lose the distribution and re-shuffle;
* the small side must NOT silently broadcast (that would also avoid
  the exchange, but by shipping the table to every executor — the
  strategy that stops working exactly when bucketing starts paying
  off), so the join carries an explicit ``merge`` hint and the test
  asserts SortMergeJoin;
* ``sortBy(key)`` at write time lets the per-bucket merge reuse the
  on-disk order when each bucket holds one file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    key: str = "doc_id",
    buckets: int = 8,
) -> DataFrame:
    """Write ``df`` as a bucketed+sorted parquet table at ``path`` and
    return the catalog-backed (distribution-aware) DataFrame for it.

    Drops any previous table of the same name first: the session
    catalog is in-memory, so re-invocations in one session (bench
    loops, driver sweeps) re-register cleanly; the data path is the
    caller's scratch and is rewritten wholesale.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table_name)
    )
    return spark.table(table_name)


def colocated_span_enrich(spans: DataFrame, docs: DataFrame) -> DataFrame:
    """Enrich every extracted span with its document's metadata and
    roll up per-document span statistics — the canonical recurring
    fact↔fact join of the extraction pipeline — over two tables
    bucketed on ``doc_id``.

    Plan shape (pinned by tests/test_colocate.py): SortMergeJoin with
    ZERO Exchange nodes — both scans report the bucket hash
    distribution, and the groupBy clusters on a superset of the bucket
    key so the aggregation reuses it too. The ``merge`` hint forbids
    the broadcast fallback (see module docstring).
    """
    j = spans.hint("merge").join(docs, "doc_id")
    return j.groupBy("doc_id", "lang", "source").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(
            F.when(F.col("kind") == "media", 1).otherwise(0)
        ).alias("n_media"),
        F.sum(
            F.length(F.coalesce(F.col("text"), F.lit("")))
        ).alias("sum_text_len"),
    )
