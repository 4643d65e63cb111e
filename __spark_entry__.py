"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`pero_ocr_spark.queries` — the per-operator query
registry with paired DuckDB oracle SQL. ``entry`` runs the flagship
extraction pipeline (documents → interleaved spans → classified /
stripped / reading-ordered span sequences) at sf0.001.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pero_ocr_spark import corpus
    from pero_ocr_spark.operators import extract

    doc_spans = corpus.spans_table(spark, "/root/testdata/sf0.001")
    return extract.extract_spans(doc_spans)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pero_ocr_spark import queries as q

    return q.queries()


def oracle_sql() -> dict[str, str]:
    from pero_ocr_spark import queries as q

    return q.oracle_sql()
