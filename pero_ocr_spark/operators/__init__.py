"""Operator package. Shared scan-shape and expression helpers live here."""

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_gram_array(ws: Column, n: int) -> Column:
    """Word n-gram array over an ALREADY-HOISTED words column.

    ``ws`` MUST be a materialized array column (``F.split(...)`` given
    its own ``.select(...alias('ws'))`` projection first, and the row
    filtered to ``F.size(ws) >= n``) — inlining the split here would
    re-evaluate it per transform element and turn the fold O(n²) per
    row (measured 4× on the sf0.1 shingle stream; the
    lm_perplexity variant of the same mistake was 79s→2.6s). That
    invariant lives in THIS helper once; dedup/sketch/textstats all
    delegate instead of re-deriving the fold.
    """
    return F.transform(
        F.sequence(F.lit(0), F.size(ws) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(ws, i + j + 1) for j in range(n)]
        ),
    )


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
