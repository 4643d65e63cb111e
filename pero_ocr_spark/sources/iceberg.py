"""Iceberg table I/O, gated on the runtime catalog (S-tier sink).

The production deployment (north_rule) reads/writes Iceberg tables of
interleaved documents. The Iceberg runtime jars are not on this
sandbox's classpath, so the writer probes for the catalog and falls
back to bucket-partitioned parquet with an identical layout — the
same doc-bucket partitioning, the same schema, the same append/resume
semantics the lineage module relies on. Swapping the format is a
config change, not a code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    # py4j returns a JavaPackage placeholder for missing classes, so
    # attribute access alone can't probe — load the class explicitly
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.Table"
        )
        return True
    except Exception:
        return False


def write_spans_table(
    df: DataFrame, target: str, n_buckets: int = 16, mode: str = "append"
) -> str:
    """Write an extraction output table.

    ``target`` is an Iceberg table identifier (e.g. ``cat.db.spans``)
    when the catalog is present, else a parquet directory path. Returns
    the format used ("iceberg" | "parquet").
    """
    spark = df.sparkSession
    bucketed = df.withColumn("bucket", (F.col("doc_id") % n_buckets).cast("long"))
    if iceberg_available(spark):
        (
            bucketed.writeTo(target)
            .partitionedBy(F.col("bucket"))
            .createOrReplace()
            if mode == "overwrite"
            else bucketed.writeTo(target).append()
        )
        return "iceberg"
    bucketed.write.mode(mode).partitionBy("bucket").parquet(target)
    return "parquet"


def read_spans_table(spark: SparkSession, target: str) -> DataFrame:
    if iceberg_available(spark):
        return spark.read.table(target)
    return spark.read.parquet(target)
