"""Deterministic interleaved-document corpus.

Expands the driver's flat ``documents(doc_id, text, lang, source,
n_chars)`` parquet into the canonical nested spans table
``(doc_id, spans: array<struct<kind,text,media_ref,offset>>)`` of
BASELINE.json ``input_hint`` — entirely with deterministic arithmetic
on ``(doc_id, word position)``; no wall clock, no RNG (the reference's
nondeterministic tiebreaks at ``layout_engines/layout_helpers.py:267``
and ``core/layout.py:163`` are deliberately designed out).

The SAME derivation is rendered twice — as Spark SQL expressions (the
engine input builder) and as a DuckDB CTE (the driver's oracle) — so
the correctness gate can compare them end to end.

Derivation, given a document's ``text`` and ``doc_id``:

  mult   = 64 if doc_id % 97 == 0 else 8 if doc_id % 13 == 0 else 1
           (Zipf-ish skew: ~1% of docs are 64x heavier, ~7% are 8x —
           exercises AQE skew handling / salting, the table-scale
           analog of pero-ocr's width-sorted batch packing
           ``ocr_engine/line_ocr_engine.py:79-91``)
  words  = split(trim(repeat(text + ' ', mult)), ' ')
  span i = kind      = 'media'       if i % 11 == 5
                       'boilerplate' if i % 7  == 3
                       'text'        otherwise
           text      = ''  for media; '' if (text-kind and i % 19 == 11)
                       (empty-transcription lines, the filter case of
                        ``document_ocr/page_parser.py:510-513``);
                       else the word
           media_ref = 'img://<doc_id>/<i>' for media else ''
           offset    = i          (source reading-order position)

The nested Spark array is stored SCRAMBLED (sorted by the reversed
zero-padded offset string) so that the engine's reading-order stage
(the analog of reading-order reconstruction, ``core/layout.py:653-654``
+ ``TextLine.index`` ordering ``layout.py:287-294``) has real work to
do; the oracle orders by ``offset`` directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MULT_SQL = "CASE WHEN doc_id % 97 = 0 THEN 64 WHEN doc_id % 13 = 0 THEN 8 ELSE 1 END"

# ---------------------------------------------------------------- Spark side

_SPANS_ARRAY_EXPR = f"""
array_sort(
  transform(
    split(trim(repeat(concat(text, ' '), {MULT_SQL})), ' '),
    (w, i) -> named_struct(
      'kind',
      CASE WHEN i % 11 = 5 THEN 'media'
           WHEN i % 7 = 3 THEN 'boilerplate'
           ELSE 'text' END,
      'text',
      CASE WHEN i % 11 = 5 THEN ''
           WHEN i % 7 <> 3 AND i % 19 = 11 THEN ''
           ELSE w END,
      'media_ref',
      CASE WHEN i % 11 = 5
           THEN concat('img://', cast(doc_id AS string), '/', cast(i AS string))
           ELSE '' END,
      'offset', i
    )
  ),
  (a, b) -> CASE
    WHEN (a.offset * 2654435761) % 4294967296 < (b.offset * 2654435761) % 4294967296 THEN -1
    WHEN (a.offset * 2654435761) % 4294967296 > (b.offset * 2654435761) % 4294967296 THEN 1
    ELSE 0 END
)
"""


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def spans_table(
    spark: SparkSession, sf_dir: str, partitions: int | None = None
) -> DataFrame:
    """The canonical nested input table (doc_id, spans), scrambled order.

    Pure column expressions — whole-stage codegen, no Python. At 100 TB
    this would be an Iceberg table scan instead; the builder exists so
    the sandbox corpus is derived deterministically from the driver's
    parquet.

    The up-front ``repartition(doc_id)`` does double duty: (1) it
    spreads span synthesis across all cores even when the source
    parquet has a single row group (the sandbox files are KB-sized);
    (2) it establishes hash(doc_id) output partitioning that the
    downstream reading-order window reuses, so the whole extraction
    pipeline has exactly ONE shuffle — of the small pre-explosion
    rows, not the exploded spans.
    """
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    docs = load_documents(spark, sf_dir)
    return docs.repartition(partitions, "doc_id").select(
        "doc_id", F.expr(_SPANS_ARRAY_EXPR).alias("spans")
    )


def spans_table_hinted(
    spark: SparkSession, sf_dir: str, partitions: int | None = None
) -> DataFrame:
    """The EXACT input-contract shape: (doc_id: string,
    spans: array<struct<kind:string, text:string, media_ref:string,
    offset:int>>).

    The engine's internal queries keep the numeric doc_id the
    deterministic synthesis (and every DuckDB oracle) shares; a real
    deployment's string document ids enter through this zero-cost cast
    at the front door. Extraction, dedup, and similarity key on doc_id
    by equality/hash only and are type-agnostic; operators that do
    ARITHMETIC or ORDERING on doc_id (pack_sequences' ``doc_id %
    n_buckets``, sampling's LCG residue, the packing windows' orderBy)
    require the numeric table — a string doc_id would route ``%``
    through a lossy double cast and make the ordering lexicographic.
    Use this adapter for the key-equality family; normalize string ids
    to dense longs (e.g. ``xxhash64``/``monotonically_increasing_id``
    mapping) before the packing/sampling family. pytest pins the
    schema against the contract string.
    """
    return spans_table(spark, sf_dir, partitions).withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )


# Session-scoped cache of the extraction pipeline's output. Three
# dozen registered queries consume the extracted spans (or tables
# derived from them) as their INPUT; at 100 TB that input is a
# materialized Iceberg table you READ, not something re-synthesized
# per query — re-deriving it every time benchmarked the synthetic
# corpus generator, not the operator under test. The cache is keyed by
# (Spark application, sf_dir) so separate sessions and scale factors
# never mix; it holds a persisted DataFrame (MEMORY_AND_DISK —
# hundreds of MB at sf0.1), materialized lazily by the first consumer.
# The headline `extract_spans` query does NOT use this helper: its
# pages/sec figure keeps timing the full synthesize+extract pipeline,
# so it stays comparable with earlier rounds.
_EXTRACTED_CACHE: dict[tuple[str, str], DataFrame] = {}


def extracted_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cached classified + boilerplate-stripped + reading-ordered
    spans (doc_id, kind, text, media_ref, ord) — the materialized-
    table analog for queries whose subject is an operator DOWNSTREAM
    of extraction."""
    key = (spark.sparkContext.applicationId, sf_dir)
    df = _EXTRACTED_CACHE.get(key)
    if df is None:
        from pyspark import StorageLevel
        from pero_ocr_spark.operators import extract

        df = extract.extract_spans(spans_table(spark, sf_dir)).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        _EXTRACTED_CACHE[key] = df
    return df


# --------------------------------------------------------------- DuckDB side

# Flat spans CTE for the oracle. `documents` is a pre-registered view.
SPANS_CTE = f"""
WITH __words AS (
  SELECT doc_id,
         string_split(trim(repeat(text || ' ', {MULT_SQL})), ' ') AS w
  FROM documents
), __pos AS (
  SELECT doc_id,
         generate_subscripts(w, 1) - 1 AS pos,
         unnest(w) AS word
  FROM __words
), spans AS (
  SELECT doc_id,
         CASE WHEN pos % 11 = 5 THEN 'media'
              WHEN pos % 7 = 3 THEN 'boilerplate'
              ELSE 'text' END AS kind,
         CASE WHEN pos % 11 = 5 THEN ''
              WHEN pos % 7 <> 3 AND pos % 19 = 11 THEN ''
              ELSE word END AS text,
         CASE WHEN pos % 11 = 5
              THEN 'img://' || CAST(doc_id AS VARCHAR) || '/' || CAST(pos AS VARCHAR)
              ELSE '' END AS media_ref,
         CAST(pos AS INTEGER) AS span_offset
  FROM __pos
)
"""
