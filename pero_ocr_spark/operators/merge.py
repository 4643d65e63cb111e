"""Multi-engine result merging (J4).

The reference zips K page layouts by line id and keeps the
max-confidence transcription per line
(``user_scripts/merge_ocr_results.py:50-75``). Relationally: UNION ALL
the K engine outputs, then argmax per (doc, line) by (confidence,
engine-name) — the engine-name tiebreak replaces nondeterministic
dict-order behavior.

Scale: one shuffle on (doc_id, line_id); K is small so the union is
cheap. Implemented as a declarative argmax (``min_by`` over the
ordering struct) rather than sort + row_number, so Catalyst does
map-side PARTIAL aggregation — each task pre-reduces its K candidate
rows per line before the shuffle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_ocr_results(engines: list[DataFrame]) -> DataFrame:
    """Each input needs columns: doc_id, line_id, transcription,
    confidence, engine. Returns the best row per line: max confidence,
    ties broken by engine name ascending (min_by over the struct
    (-confidence, engine) — lexicographic struct order gives exactly
    that, and unlike row_number it partial-aggregates map-side)."""
    unioned = reduce(DataFrame.unionByName, engines)
    # leading null flag: struct comparison would otherwise sort a NULL
    # -confidence FIRST, letting a missing confidence beat every real
    # one (row_number over confidence.desc() ranked nulls last)
    best = F.min_by(
        F.struct("transcription", "engine"),
        F.struct(
            F.col("confidence").isNull().cast("int").alias("nul"),
            (-F.col("confidence")).alias("nc"),
            F.col("engine").alias("e"),
        ),
    ).alias("best")
    return (
        unioned.groupBy("doc_id", "line_id")
        .agg(best)
        .select(
            "doc_id",
            "line_id",
            F.col("best.transcription").alias("transcription"),
            F.col("best.engine").alias("engine"),
        )
    )
