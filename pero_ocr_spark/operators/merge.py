"""Multi-engine result merging (J4).

The reference zips K page layouts by line id and keeps the
max-confidence transcription per line
(``user_scripts/merge_ocr_results.py:50-75``). Relationally: UNION ALL
the K engine outputs, then argmax per (doc, line) by (confidence,
engine-name) — the engine-name tiebreak replaces nondeterministic
dict-order behavior.

Scale: one shuffle on (doc_id, line_id); K is small so the union is
cheap; map-side nothing to combine (argmax needs the row), but AQE
handles partition sizing.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_ocr_results(engines: list[DataFrame]) -> DataFrame:
    """Each input needs columns: doc_id, line_id, transcription,
    confidence, engine. Returns the best row per line."""
    unioned = reduce(DataFrame.unionByName, engines)
    w = Window.partitionBy("doc_id", "line_id").orderBy(
        F.col("confidence").desc(), F.col("engine")
    )
    return (
        unioned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "line_id", "transcription", "engine")
    )
