"""JSONL ingest — the universal LLM-corpus interchange format.

Training corpora move between systems as JSON-lines records
(``{"id": ..., "meta": {...}, "spans": [...]}``); the ingest edge
must parse them at 10^12-record scale without ever trusting the
data. Three rules enforced here:

  * **Explicit schema, never inference** — ``from_json`` with a
    declared struct: schema inference is a full extra pass over 100 TB
    and a correctness hazard (a rare field widens a column type for
    the whole corpus). Parsing stays entirely inside Catalyst's
    ``JsonToStructs`` — JVM code generation, zero Python.
  * **Malformed records degrade, never kill** — PERMISSIVE semantics:
    a corrupt line parses to a null struct, is counted, and is
    quarantined by predicate, so one truncated upload cannot fail a
    corpus-wide job. The quarantine frame keeps the RAW line for
    replay/debugging (the dead-letter pattern).
  * **Nested arrays explode AFTER validation** — the spans array
    explodes only for valid records, so the row amplification never
    touches garbage.

Scale shape: parse + validate + explode is one narrow projection —
no shuffle anywhere; column pruning pushes into the struct (Catalyst
prunes unaccessed JSON fields from the parse itself via
``spark.sql.optimizer.enableJsonExpressionOptimization``).

Reference analog: pero-ocr ingests PAGE-XML/ALTO with hand-rolled
schema checks (`document_ocr/layout.py` import paths); JSONL is the
web-corpus equivalent with the same trust boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pero_ocr_spark.operators.sampling import HASH_P

# the interchange record schema: id + typed metadata + ordered spans
RECORD_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField(
            "meta",
            T.StructType([T.StructField("source", T.StringType())]),
        ),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("ord", T.IntegerType()),
                        T.StructField("text", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

SPAN_WORDS = 12  # words per synthesized span (matches the HTML tier)


def synthesize_jsonl(docs: DataFrame, corrupt_mod: int = 97) -> DataFrame:
    """documents(doc_id, text, source) → (line string): deterministic
    JSONL records via Catalyst ``to_json`` (stable field order), the
    text chunked into 12-word spans. Records whose portable-LCG
    residue mod ``corrupt_mod`` equals 13 are TRUNCATED mid-record —
    the deterministic stand-in for the torn uploads and half-written
    objects every real corpus contains."""
    words = F.split(F.col("text"), " ")
    idx = F.sequence(
        F.lit(0), F.floor((F.size(words) - 1) / SPAN_WORDS).cast("int")
    )
    spans = F.transform(
        idx,
        lambda i: F.struct(
            i.cast("int").alias("ord"),
            F.array_join(F.slice(words, i * SPAN_WORDS + 1, SPAN_WORDS), " ").alias(
                "text"
            ),
        ),
    )
    record = F.to_json(
        F.struct(
            F.col("doc_id").alias("id"),
            F.struct(F.col("source").alias("source")).alias("meta"),
            spans.alias("spans"),
        )
    )
    corrupt = (
        F.pmod(F.col("doc_id") * 69_069 + 12_345, F.lit(HASH_P)) % corrupt_mod
        == 13
    )
    line = F.when(
        corrupt, F.substring(record, 1, F.length(record) - F.lit(5))
    ).otherwise(record)
    return docs.select(line.alias("line"))


def parse_jsonl(
    lines: DataFrame, line_col: str = "line"
) -> tuple[DataFrame, DataFrame]:
    """(line) → (valid records, quarantined raw lines).

    ``from_json`` against :data:`RECORD_SCHEMA`; a malformed line
    yields a null struct (PERMISSIVE) and lands in the quarantine
    frame WITH its raw text for replay. Both frames are lazy
    projections of one scan — Catalyst shares the parse."""
    parsed = lines.withColumn(
        "_rec", F.from_json(F.col(line_col), RECORD_SCHEMA)
    )
    # a line can be valid JSON of the wrong shape: require the id
    valid = parsed.filter(F.col("_rec.id").isNotNull())
    quarantine = parsed.filter(F.col("_rec.id").isNull()).select(
        F.col(line_col).alias("raw_line")
    )
    return valid, quarantine


def jsonl_spans(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """(line) → (doc_id, source, ord, span_text): the span rows of
    every VALID record. One narrow codegen pass: parse → validate →
    explode the nested array; corrupt lines are excluded before the
    explode so amplification never touches garbage."""
    valid, _ = parse_jsonl(lines, line_col)
    return valid.select(
        F.col("_rec.id").alias("doc_id"),
        F.col("_rec.meta.source").alias("source"),
        F.explode("_rec.spans").alias("s"),
    ).select("doc_id", "source", F.col("s.ord").alias("ord"),
             F.col("s.text").alias("span_text"))
