"""Operator package. Shared scan-shape helpers live here."""

from pyspark.sql import DataFrame


def spread_scan(df: DataFrame) -> DataFrame:
    """Scan-parallelism guard for heavy in-row stages.

    A small single-file parquet scan arrives as ONE input partition and
    every downstream narrow stage inherits it — serializing per-row
    higher-order-function work (transform/aggregate folds are
    interpreted, not whole-stage-codegen'd, so per-row cost is real) on
    one core. Repartition only when actually starved: at corpus scale
    the input arrives in thousands of file splits and this is a no-op
    (no shuffle added).
    """
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    if df.rdd.getNumPartitions() >= max(2, n // 2):
        return df
    return df.repartition(n)
