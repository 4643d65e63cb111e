"""Canonical schemas for the extraction engine.

The document tree of the reference (``pero_ocr/core/layout.py:234-245``
PageLayout → ``:75-84`` RegionLayout → ``:41-63`` TextLine) is
normalized into flat/nested Spark schemas:

  * ``DOC_SPANS`` — the engine's canonical I/O table (BASELINE.json
    ``input_hint``): one row per document, spans nested.
  * ``FLAT_SPAN`` — exploded working schema (one row per span).
  * ``OUT_SPAN`` — extraction output: ordered span sequence per doc,
    the unit of the oracle equality check (kind, text, media_ref, order).
  * ``LINE`` — TextLine analog for geometry/OCR operators.
  * ``LOGITS`` — sparse CTC logit matrices (csc-encoded like
    ``ocr_engine/line_ocr_engine.py:168-171``, but as plain arrays so
    they cross the Arrow boundary without scipy objects).
"""

from __future__ import annotations

from pyspark.sql import types as T

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

DOC_SPANS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT), False),
    ]
)

FLAT_SPAN = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

OUT_SPAN = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("ord", T.LongType(), False),
    ]
)

POINT = T.StructType(
    [
        T.StructField("x", T.DoubleType(), False),
        T.StructField("y", T.DoubleType(), False),
    ]
)

# TextLine analog (layout.py:41-63): geometry + transcription + confidence.
LINE = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("region_id", T.StringType(), False),
        T.StructField("line_id", T.StringType(), False),
        T.StructField("line_idx", T.IntegerType(), False),
        T.StructField("baseline", T.ArrayType(POINT), False),
        T.StructField(
            "heights",
            T.StructType(
                [
                    T.StructField("asc", T.DoubleType(), False),
                    T.StructField("desc", T.DoubleType(), False),
                ]
            ),
            False,
        ),
        T.StructField("polygon", T.ArrayType(POINT), True),
        T.StructField("transcription", T.StringType(), True),
        T.StructField("confidence", T.DoubleType(), True),
    ]
)

# Sparse CTC logits, csc-encoded (line_ocr_engine.py:168-171 stores
# scipy csc; we store the raw arrays — reconstruct with
# operators/ctc.py:sparse_to_dense, the analog of layout.py:65-72).
LOGITS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("line_id", T.StringType(), False),
        T.StructField("t", T.IntegerType(), False),
        T.StructField("c", T.IntegerType(), False),
        T.StructField("data", T.ArrayType(T.FloatType()), False),
        T.StructField("indices", T.ArrayType(T.IntegerType()), False),
        T.StructField("indptr", T.ArrayType(T.IntegerType()), False),
    ]
)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
