"""Driver-facing query registry.

Each entry pairs a Spark implementation (an operator from SURVEY.md §2
exercised over the driver's parquet tables) with an equivalent DuckDB
oracle SQL string. Column names/types are aligned on both sides; float
aggregates are rounded identically so the driver's value-hash matches.

Registry: name -> (spark_fn(spark, sf_dir) -> DataFrame, oracle_sql | None)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pero_ocr_spark import corpus
from pero_ocr_spark.operators import extract

QueryFn = Callable[[SparkSession, str], DataFrame]
_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = (fn, sql)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _scratch(name: str) -> str:
    """Scratch dir for sink round-trip queries — a path per (process,
    query name), emptied on each invocation, so repeated bench/driver
    runs never accumulate temp output (mkdtemp leaked one full
    extraction per run) and two CONCURRENT runs on the same box never
    delete each other's in-flight sink/lineage data (the pre-round-4
    fixed path did). Roots left by dead processes are swept
    opportunistically."""
    import os
    import shutil
    import tempfile

    base = os.path.join(tempfile.gettempdir(), "pero_ocr_spark_scratch")
    root = os.path.join(base, f"pid{os.getpid()}")
    # sweep roots whose owning process is gone (crashed runs leak theirs)
    try:
        for entry in os.listdir(base):
            if not entry.startswith("pid") or entry == f"pid{os.getpid()}":
                continue
            try:
                os.kill(int(entry[3:]), 0)  # signal 0 = existence probe
            except ProcessLookupError:
                shutil.rmtree(os.path.join(base, entry), ignore_errors=True)
            except (ValueError, PermissionError):
                pass
    except FileNotFoundError:
        pass
    path = os.path.join(root, name)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path


# shared oracle CTE: the extraction pipeline's output (classification +
# boilerplate strip + reading order) — interpolated into every oracle
# that consumes extracted spans, so the rule lives in ONE place
_EXTRACTED_CTE = f"""
{corpus.SPANS_CTE}
, extracted AS (
  SELECT doc_id, kind, text, media_ref,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY span_offset) - 1
              AS BIGINT) AS ord
  FROM spans
  WHERE kind = 'media'
     OR (kind = 'text' AND text <> '' AND text NOT IN ('the', 'a'))
)
"""


# Queries with a green external-driver correctness row across rounds 1-4
# (union of CORRECTNESS_r01..r04 keys = 104 names). The driver walks
# `queries()` in dict order with a ~50-per-round cap, so the
# not-yet-driver-checked entries yield FIRST — a green external row is
# worth ten self-checks. Remove names from this set only if a later
# round's CORRECTNESS file drops them.
_DRIVER_CHECKED = frozenset({
    "alto_roundtrip", "alto_word_roundtrip", "cer_aggregate", "cn_best_path",
    "confidence_filter_agg", "corpus_balanced_shards",
    "corpus_filter_pipeline", "corpus_leakage_safe_split",
    "corpus_skew_profile", "ctc_decode_beam", "ctc_decode_chunked",
    "ctc_decode_greedy", "ctc_decode_lm_carry", "curation_pipeline_e2e",
    "decontam_benchmark_overlap", "decontam_span_mask", "dedup_bloom_filter",
    "dedup_canonical_url", "dedup_duplicate_clusters", "dedup_exact",
    "dedup_keep_best", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_simhash_fingerprints", "dedup_simhash_pairs",
    "dedup_substring_spans", "error_cer_summary", "error_confusion_matrix",
    "events_funnel", "events_gap_fill", "events_retention_cohorts",
    "events_rolling_window", "events_sessionize", "events_stateful_totals",
    "events_stream_dedup", "events_stream_enrich", "events_stream_join",
    "events_window_stream", "extract_spans", "host_quality_priors",
    "html_densitometric_classify", "html_ensemble_extract", "html_outlinks",
    "html_template_strip", "hyp_ref_compare", "iceberg_snapshot_reads",
    "icetable_incremental_agg", "icetable_schema_evolution",
    "icetable_stream_ingest", "icetable_upsert_delete", "layout_assign_lines",
    "layout_cluster_lines", "layout_detect_lines",
    "layout_detect_multi_orientation", "layout_merge_lines",
    "layout_parse_maps", "layout_reading_order_bands",
    "layout_reading_order_xycut", "layout_refine_baselines",
    "layout_segment_regions", "layout_snap_baselines",
    "layout_textline_polygons", "line_crops", "lineage_resume",
    "lm_perplexity_filter", "media_decode_metadata", "media_frame_sample",
    "median_per_group", "merge_best_hypothesis", "merge_ocr_engines",
    "ocr_pipeline_e2e", "pagexml_roundtrip", "pdf_roundtrip",
    "quality_power_mean", "reading_order_window", "resume_anti_join",
    "rtl_visual_form", "sample_dsir_importance", "sample_temperature",
    "semantic_dedup", "similarity_ann_bucketed", "similarity_ann_ivf",
    "similarity_cosine_topk", "similarity_hard_negatives",
    "similarity_near_dup_pairs", "text_char_entropy", "text_fingerprints",
    "text_language_id", "text_quality_score", "text_token_stats",
    "topk_per_group", "training_bpe_subword_counts",
    "training_chunk_documents", "vocab_bpe_train", "warc_cdx_index",
    "warc_charset_decode", "warc_gzip_ingest", "warc_html_spans",
    "warc_ingest", "warc_redirect_resolution", "warc_robots_filter",
    "warc_stream_ingest", "web_anchor_text", "web_pagerank",
})


# Within the unchecked block, the highest-value queries go first — the
# round-4 verdict's directive-3 list by name (sketch wave, web-graph
# wave, events-analytics wave, eval wave, then the named singles and the
# session-9 snapshot-table/eval additions), then everything else in
# insertion order. 78 queries have never had a driver row (cap is ~50),
# so this ordering decides which get one in round 5.
_CHECK_FIRST = (
    "sketch_hll_shingles", "sketch_cms_heavy_hitters",
    "sketch_kmv_snapshot_overlap", "sketch_histogram_quantiles",
    "events_stream_hll_users", "web_hits", "web_triangles", "web_components",
    "web_communities_lpa", "web_kcore", "web_trustrank", "web_bfs_depth",
    "web_host_graph", "web_random_walks", "events_ewma", "events_holt",
    "events_cusum", "events_anomaly_mad", "events_asof_join",
    "events_range_join", "quality_classifier_auc", "quality_calibration_bins",
    "similarity_recall_eval", "merge_engine_agreement", "similarity_ann_pq",
    "lm_kneser_ney_perplexity", "corpus_zipf_fit", "corpus_heaps_fit",
    "corpus_drift_kl", "icetable_mor_deletes", "corpus_zorder_skipping",
    "icetable_bloom_skipping", "icetable_wap_publish", "dedup_winnowing",
    "layout_region_retrace", "telemetry_observe", "transcriptions_roundtrip",
    "line_crop_sink", "dedup_common_passages", "text_repetition_stats",
    "sample_stratified", "training_pack_sequences", "text_redact_pii",
    "vocab_topk", "layout_postprocess", "image_folder_scan",
    "layout_adaptive_downsample", "embedding_kmeans_assign",
    "html_block_classify", "html_main_content", "html_interleaved_spans",
    "corpus_shard_shuffle", "quality_classifier_filter",
    "text_pmi_collocations", "sample_doremi_mixture", "dedup_incremental",
    "training_render_interleaved", "media_context_pairs",
    "corpus_train_val_split", "text_dedup_paragraphs",
    "similarity_quantized_topk", "crawl_frontier_schedule",
    "text_tfidf_keywords", "text_bm25_search", "crawl_snapshot_diff",
    "corpus_rollup_stats", "sample_epoch_mixing", "dedup_cdc_chunks",
    "media_duplicate_groups", "sample_weighted_aes",
    "training_pack_interleaved", "text_ngram_novelty",
    "dedup_containment_pairs", "corpus_ccnet_buckets",
    "similarity_margin_pairs", "training_span_corruption",
    "embedding_top_component", "search_rank_fusion",
)


def _ordered_names() -> list[str]:
    names = list(_REGISTRY)
    unchecked = [n for n in names if n not in _DRIVER_CHECKED]
    first = [n for n in _CHECK_FIRST if n in unchecked]
    return (first
            + [n for n in unchecked if n not in _CHECK_FIRST]
            + [n for n in names if n in _DRIVER_CHECKED])


def queries() -> dict[str, QueryFn]:
    return {k: _REGISTRY[k][0] for k in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {k: _REGISTRY[k][1] for k in _ordered_names()
            if _REGISTRY[k][1] is not None}


# ---------------------------------------------------------------------------
# Flagship: full extraction pipeline (SURVEY §2: S1/S2 scan analog, J2/R13
# filters, O1/O5 reading order, R1 explode) over the interleaved corpus.
# ---------------------------------------------------------------------------

_EXTRACT_ORACLE = f"""
{corpus.SPANS_CTE}
SELECT doc_id, kind, text, media_ref,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY span_offset) - 1 AS BIGINT) AS ord
FROM spans
WHERE kind = 'media'
   OR (kind = 'text' AND text <> '' AND text NOT IN ('the', 'a'))
"""


@register("extract_spans", _EXTRACT_ORACLE)
def q_extract_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    # headline throughput query: deliberately UNCACHED full pipeline
    return extract.extract_spans(corpus.spans_table(spark, sf_dir))


# ---------------------------------------------------------------------------
# R2/R3/R5/R7 — CTC recognition: synthetic sparse logits → batched greedy
# decode in mapInPandas. decode(synth(text)) == text, so the oracle is the
# text spans themselves (strings only; float confidence is pytest-covered).
# ---------------------------------------------------------------------------

_DECODE_ORACLE = (
    _EXTRACTED_CTE
    + """
SELECT doc_id, 'l' || CAST(ord AS VARCHAR) AS line_id, text AS transcription
FROM extracted WHERE kind = 'text'
"""
)


@register("ctc_decode_greedy", _DECODE_ORACLE)
def q_ctc_decode_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import ctc

    logits = ctc.pack_by_length(ctc.logits_table(spark, sf_dir))
    return ctc.decode_greedy(logits).select("doc_id", "line_id", "transcription")


@register("ctc_decode_beam", _DECODE_ORACLE)
def q_ctc_decode_beam(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import ctc

    logits = ctc.pack_by_length(ctc.logits_table(spark, sf_dir))
    return ctc.decode_beam(logits, beam_size=4, confidence_gate=0.9).select(
        "doc_id", "line_id", "transcription"
    )


# ---------------------------------------------------------------------------
# Deduplication suite (training-data pipeline ops): exact, exact n-gram
# jaccard, minhash+LSH (verified → same oracle), portable simhash.
# ---------------------------------------------------------------------------

_SHINGLE_CTE = """
WITH __w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(w) - 2),
                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
    FROM __w WHERE len(w) >= 3)
)
"""

_JACCARD_ORACLE = f"""
{_SHINGLE_CTE}
, sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT da AS doc_a, db AS doc_b,
       round(c * 1.0 / (x.n + y.n - c), 6) AS jaccard
FROM common JOIN sizes x ON da = x.doc_id JOIN sizes y ON db = y.doc_id
WHERE round(c * 1.0 / (x.n + y.n - c), 6) >= 0.8
"""


@register(
    "dedup_exact",
    """
    SELECT text, min(doc_id) AS canonical_doc,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY text
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import dedup

    return dedup.exact_duplicates(_t(spark, sf_dir, "documents"))


@register("dedup_ngram_jaccard", _JACCARD_ORACLE)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import dedup

    return dedup.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.8)


@register("dedup_minhash_lsh", _JACCARD_ORACLE)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import dedup

    return dedup.minhash_lsh_pairs(_t(spark, sf_dir, "documents"), threshold=0.8)


@register(
    "dedup_duplicate_clusters",
    _SHINGLE_CTE
    + """
, sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT da AS doc_a, db AS doc_b
  FROM common JOIN sizes x ON da = x.doc_id JOIN sizes y ON db = y.doc_id
  WHERE round(c * 1.0 / (x.n + y.n - c), 6) >= 0.8),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
r AS (
  WITH RECURSIVE reach(a, b) AS (
    SELECT a, b FROM edges
    UNION
    SELECT reach.a, e.b FROM reach JOIN edges e ON reach.b = e.a)
  SELECT * FROM reach)
SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM r GROUP BY a
""",
)
def q_dedup_duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import dedup

    pairs = dedup.minhash_lsh_pairs(_t(spark, sf_dir, "documents"), threshold=0.8)
    return dedup.duplicate_clusters(pairs)


_PORTABLE_HASH_DUCK = (
    "list_reduce(list_prepend(0::BIGINT, "
    "list_transform(string_split(s, ''), c -> ascii(c)::BIGINT)), "
    "(a, b) -> (a * 31 + b) % 2147483647)"
)

_SIMHASH_FP_CTE = (
    _SHINGLE_CTE
    + f", hs AS (SELECT doc_id, {_PORTABLE_HASH_DUCK} AS h FROM sh)\n"
    + ", sums AS (SELECT doc_id, "
    + ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(32)
    )
    + " FROM hs GROUP BY doc_id)\n"
    + ", fps AS (SELECT doc_id, CAST("
    + " + ".join(f"CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(32))
    + " AS BIGINT) AS simhash FROM sums)"
)


@register("dedup_simhash_fingerprints", _SIMHASH_FP_CTE + "\nSELECT doc_id, simhash FROM fps")
def q_dedup_simhash_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import dedup

    return dedup.simhash_fingerprints(_t(spark, sf_dir, "documents"))


@register(
    "dedup_simhash_pairs",
    _SIMHASH_FP_CTE
    + """
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM fps a JOIN fps b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import dedup

    return dedup.simhash_near_dups(_t(spark, sf_dir, "documents"), max_hamming=3)


# ---------------------------------------------------------------------------
# Similarity search over embeddings: brute-force cosine top-k (baseline),
# LSH-bucketed ANN (scale path, deterministic portable hyperplanes), and
# embedding-level near-dup pairs.
# ---------------------------------------------------------------------------

_QUERY_IDS = list(range(8))

_COS_E_CTE = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings)
"""


def _duck_bucket_expr() -> str:
    from pero_ocr_spark.operators.similarity import N_PLANES, plane_weight_sql

    bits = []
    for j in range(N_PLANES):
        proj = (
            "list_sum(list_transform(generate_series(1, len(emb)), "
            f"i -> {plane_weight_sql('i', j)} * emb[i]))"
        )
        bits.append(f"(CASE WHEN {proj} > 0 THEN {1 << j} ELSE 0 END)")
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


_TOPK_ORACLE = f"""
{_COS_E_CTE}
, sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 6) AS cosine
  FROM e q JOIN e c ON c.vec_id <> q.vec_id
  WHERE q.vec_id IN ({", ".join(str(i) for i in _QUERY_IDS)}))
SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
  FROM sims)
WHERE rn <= 5
"""


@register("similarity_cosine_topk", _TOPK_ORACLE)
def q_similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import similarity

    return similarity.cosine_topk(_t(spark, sf_dir, "embeddings"), _QUERY_IDS, k=5)


def _ann_oracle() -> str:
    return f"""
{_COS_E_CTE}
, eb AS (SELECT vec_id, emb, nrm, {_duck_bucket_expr()} AS bucket FROM e)
, sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 6) AS cosine
  FROM eb q JOIN eb c
    ON bit_count(xor(c.bucket, q.bucket)) <= 1 AND c.vec_id <> q.vec_id
  WHERE q.vec_id IN ({", ".join(str(i) for i in _QUERY_IDS)}))
SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
  FROM sims)
WHERE rn <= 5
"""


@register("similarity_ann_bucketed", _ann_oracle())
def q_similarity_ann_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import similarity

    return similarity.ann_bucketed_topk(
        _t(spark, sf_dir, "embeddings"), _QUERY_IDS, k=5
    )


_IVF_ORACLE = (
    _COS_E_CTE
    + f"""
, cents AS (
  SELECT vec_id - 100 AS cell, emb AS cent, nrm AS cnrm
  FROM e WHERE vec_id >= 100 AND vec_id < 116)
, scored AS (
  SELECT e.vec_id, e.emb, e.nrm, c.cell,
         list_dot_product(e.emb, c.cent) / (e.nrm * c.cnrm) AS cs
  FROM e, cents c)
, assign AS (
  SELECT vec_id, emb, nrm, cell FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY cs DESC, cell) AS rn
    FROM scored) WHERE rn = 1)
, probes AS (
  SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm, cell FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY cs DESC, cell) AS rn
    FROM scored
    WHERE vec_id IN ({", ".join(str(i) for i in _QUERY_IDS)})) WHERE rn <= 2)
, sims AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         round(list_dot_product(p.q_emb, a.emb) / (p.q_nrm * a.nrm), 6)
           AS cosine
  FROM probes p JOIN assign a
    ON a.cell = p.cell AND a.vec_id <> p.query_id)
SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
  FROM sims)
WHERE rn <= 5
"""
)


@register("similarity_ann_ivf", _IVF_ORACLE)
def q_similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IVF coarse-quantizer ANN: deterministic 16-centroid codebook
    # (corpus sample vec_ids 100..115), nearest-cell assignment with
    # lowest-cell tiebreak, 2-probe query fan-out, exact rank within
    # the probed cells. Both sides compute identical IEEE doubles
    # (left-to-right dot-product fold), so assignment ties resolve
    # identically.
    from pero_ocr_spark.operators import similarity

    return similarity.ivf_topk(
        _t(spark, sf_dir, "embeddings"), _QUERY_IDS, k=5,
        n_cells=16, n_probe=2, centroid_offset=100,
    )


@register(
    "similarity_near_dup_pairs",
    f"""
{_COS_E_CTE}
, eb AS (SELECT vec_id, emb, nrm, {{bucket}} AS bucket FROM e)
SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
       round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 6) AS cosine
FROM eb a JOIN eb b
  ON a.vec_id < b.vec_id AND bit_count(xor(a.bucket, b.bucket)) <= 2
WHERE round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 6) >= 0.45
""".replace("{bucket}", _duck_bucket_expr()),
)
def q_similarity_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Banded near-dup: candidates = LSH signatures within hamming ≤ 2
    # (multi-probe equi-join, no cross join); the oracle replicates the
    # deterministic bucketing so both sides compute the same pair set.
    from pero_ocr_spark.operators import similarity

    return similarity.embedding_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.45, multi_probe=2
    )


# ---------------------------------------------------------------------------
# Text analysis: token stats, heuristic language ID, quality scoring,
# portable fingerprints. All pure Catalyst expressions.
# ---------------------------------------------------------------------------


@register(
    "text_token_stats",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT)
               AS n_pretokens,
           CAST(ceil(length(text) / 4) AS BIGINT) AS n_subwords_est,
           round(list_sum(list_transform(string_split(text, ' '),
                 w -> length(w))) * 1.0 / len(string_split(text, ' ')), 6)
               AS mean_token_len
    FROM documents
    """,
)
def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import textstats

    return textstats.token_stats(_t(spark, sf_dir, "documents"))


@register(
    "text_language_id",
    f"""
    SELECT doc_id, lang,
           round(len(list_filter(string_split(text, ' '),
                 x -> x IN {tuple(s for s in ("the","a","of","and","to","in","is"))}))
                 * 1.0 / len(string_split(text, ' ')), 6) AS en_stopword_ratio,
           CASE WHEN len(list_filter(string_split(text, ' '),
                 x -> x IN {tuple(s for s in ("the","a","of","and","to","in","is"))}))
                 * 1.0 / len(string_split(text, ' ')) >= 0.04
                THEN 'en' ELSE 'other' END AS lang_pred
    FROM documents
    """,
)
def q_text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import textstats

    return textstats.language_id(_t(spark, sf_dir, "documents"))


@register(
    "text_quality_score",
    """
    WITH q AS (
      SELECT doc_id,
             string_split(text, ' ') AS w,
             len(string_split(text, ' ')) AS n
      FROM documents)
    SELECT doc_id,
           round(len(list_distinct(w)) * 1.0 / n, 6) AS lexical_diversity,
           round(list_sum(list_transform(w, x -> length(x))) * 1.0 / n, 6)
               AS mean_token_len,
           round((len(list_distinct(w)) * 1.0 / n
                  + (CASE WHEN n BETWEEN 50 AND 5000 THEN 1.0 ELSE 0.5 END)
                  + (CASE WHEN list_sum(list_transform(w, x -> length(x))) * 1.0 / n
                          BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)) / 3.0, 6)
               AS quality
    FROM q
    """,
)
def q_text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import textstats

    return textstats.quality_score(_t(spark, sf_dir, "documents"))


_DUCK_POLY = (
    "list_reduce(list_prepend(0::BIGINT, "
    "list_transform(string_split({col}, ''), c -> ascii(c)::BIGINT)), "
    "(a, b) -> (a * 31 + b) % 2147483647)"
)


@register(
    "text_fingerprints",
    f"""
    WITH __w AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
    SELECT doc_id,
           {_DUCK_POLY.format(col="text")} AS fp_text,
           list_min(list_transform(
             list_transform(generate_series(1, len(w) - 2),
                            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
             s -> {_DUCK_POLY.format(col="s")})) AS fp_min_shingle
    FROM __w WHERE len(w) >= 3
    """,
)
def q_text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import textstats

    return textstats.fingerprints(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Multimodal plumbing: media decode stub (mapInPandas, deterministic fake)
# and frame sampling. Oracle recomputes the arithmetic straight from the
# spans CTE.
# ---------------------------------------------------------------------------

_MEDIA_META_ORACLE = f"""
{corpus.SPANS_CTE}
SELECT doc_id, media_ref,
       CASE span_offset % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS fmt,
       CAST(64 + (span_offset % 13) * 32 AS BIGINT) AS width,
       CAST(48 + (span_offset % 7) * 48 AS BIGINT) AS height,
       CAST(1 + (span_offset % 5) AS BIGINT) AS n_frames,
       CAST(length(media_ref) AS BIGINT) AS n_bytes
FROM spans WHERE kind = 'media'
"""


def _decoded_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import extract, media

    spans = corpus.extracted_spans(spark, sf_dir)
    return media.decode_media(media.media_spans(spans))


@register("media_decode_metadata", _MEDIA_META_ORACLE)
def q_media_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _decoded_media(spark, sf_dir)


@register(
    "media_frame_sample",
    f"""
{corpus.SPANS_CTE}
, meta AS (
  SELECT doc_id, media_ref, 1 + (span_offset % 5) AS n_frames
  FROM spans WHERE kind = 'media')
SELECT doc_id, media_ref,
       CAST(unnest(range(0, n_frames, 2)) AS BIGINT) AS frame_idx
FROM meta
""",
)
def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import media

    return media.frame_sample(_decoded_media(spark, sf_dir)).withColumn(
        "frame_idx", F.col("frame_idx").cast("long")
    )


# ---------------------------------------------------------------------------
# R6 — stateful cross-line LM-carry decode (applyInPandas ordered scan).
# On the near-one-hot synthetic logits the LM cannot flip the argmax, so
# the decode oracle still applies (transcription equality).
# ---------------------------------------------------------------------------

_LM_CARRY_ORACLE = _DECODE_ORACLE


@register("ctc_decode_lm_carry", _LM_CARRY_ORACLE)
def q_ctc_decode_lm_carry(spark: SparkSession, sf_dir: str) -> DataFrame:
    # R9: the LM is a REAL corpus-trained char-bigram table (one Spark
    # aggregation, O(charset²) collected + broadcast), consumed through
    # the reference LM wrapper interface. The synthetic logits'
    # 80-logit margins dominate lm_scale·logprob, so the decode stays
    # oracle-exact; the LM reranks only genuine near-ties.
    from pero_ocr_spark.functions import lm as lmmod
    from pero_ocr_spark.operators import ctc

    counts = lmmod.train_char_bigrams(_t(spark, sf_dir, "documents"))
    logits = ctc.logits_table(spark, sf_dir)
    return ctc.decode_beam_lm_carry(logits, lm_counts=counts).select(
        "doc_id", "line_id", "transcription"
    )


# ---------------------------------------------------------------------------
# Streaming: windowed agg with watermark run as a REAL streaming query
# (memory sink), and gap sessionization (batch window form).
# ---------------------------------------------------------------------------


@register(
    "events_window_stream",
    """
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q_events_window_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.streaming import events as ev

    return ev.window_counts_streaming(spark, sf_dir, minutes=5)


@register(
    "events_stateful_totals",
    """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS total_value
    FROM events GROUP BY user_id
    """,
)
def q_events_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.streaming import events as ev

    return ev.running_user_totals_streaming(spark, sf_dir)


@register(
    "events_stream_dedup",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def q_events_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # streaming dedup with watermark-bounded state — the surviving key
    # set equals DISTINCT because the delay spans the table (survivor
    # ROWS are arrival-order-dependent, so only keys are emitted)
    from pero_ocr_spark.streaming import events as ev

    return ev.dedup_events_streaming(spark, sf_dir)


@register(
    "events_sessionize",
    """
    WITH marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    , sess AS (
      SELECT user_id, ts,
             CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM marked)
    SELECT user_id, session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end
    FROM sess GROUP BY user_id, session_id
    """,
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.streaming import events as ev

    return ev.sessionize(_t(spark, sf_dir, "events"), gap_minutes=30)


# ---------------------------------------------------------------------------
# Layout geometry (L14 textline polygons, L11 merge, J1 spatial assign,
# O3/O4 reading order) over the deterministic synthetic lines table.
# ---------------------------------------------------------------------------

_LINES_CTE = (
    _EXTRACTED_CTE
    + """
, tl AS (
  SELECT doc_id, ord, ord % 2 AS col, ord // 2 AS row, length(text) * 8 AS w
  FROM extracted WHERE kind = 'text')
, lbase AS (
  SELECT doc_id,
         'r' || CAST(col AS VARCHAR) AS region_id,
         'l' || CAST(ord AS VARCHAR) AS line_id, ord,
         CAST(col * 500 + 10 AS DOUBLE) AS x0,
         CAST(col * 500 + 10 + w AS DOUBLE) AS x1,
         CAST(row * 30 + 20 AS DOUBLE) AS y
  FROM tl)
, lines AS (
  SELECT doc_id, region_id, line_id, ord, x0, x1, y
  FROM lbase WHERE ord % 5 <> 4 OR x1 - x0 <= 20
  UNION ALL
  SELECT doc_id, region_id, line_id || 'a', ord, x0, (x0 + x1) / 2 - 5, y
  FROM lbase WHERE ord % 5 = 4 AND x1 - x0 > 20
  UNION ALL
  SELECT doc_id, region_id, line_id || 'b', ord, (x0 + x1) / 2 + 5, x1, y
  FROM lbase WHERE ord % 5 = 4 AND x1 - x0 > 20)
"""
)


@register(
    "layout_textline_polygons",
    _LINES_CTE
    + """
SELECT doc_id, line_id, x0 AS px0, y - 10 AS py0, x1 AS px1, y + 4 AS py1
FROM lines
""",
)
def q_layout_textline_polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import layout

    return layout.textline_polygons(layout.lines_table(spark, sf_dir))


@register(
    "layout_region_retrace",
    _LINES_CTE
    + """
SELECT doc_id, region_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(min(x0), 4) AS x0, round(min(y) - 10, 4) AS y0,
       round(max(x1), 4) AS x1, round(max(y) + 4, 4) AS y1
FROM lines WHERE ord < 60 AND doc_id % 4 = 0
GROUP BY doc_id, region_id
""",
)
def q_layout_region_retrace(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L16/L7 through the external gate: the alpha-shape region retrace
    # runs for real in the Arrow stage, and the oracle checks its
    # closed-form invariant — the retraced polygon's vertices are a
    # subset of the textline vertices while covering all of them, so
    # its bbox must equal the member-rectangle bbox exactly. Interior
    # shape is pinned by the geometry pytests (Delaunay alpha shape vs
    # the executed reference on fixtures).
    from pero_ocr_spark.operators import layout

    # ord < 60 bounds lines-per-region (same fixture bound as
    # layout_cluster_lines): the 64x-skewed docs would otherwise hand
    # the O(n^2) Delaunay kernel 10k+-point regions — at scale the
    # operator runs AFTER region segmentation, where region size is
    # physically bounded by the page
    # doc_id % 4 = 0: a deterministic quarter of the corpus — the
    # external invariant check doesn't need every page, the kernel's
    # correctness is page-local
    return layout.retrace_regions(
        layout.lines_table(spark, sf_dir).filter(
            (F.col("ord") < 60) & (F.col("doc_id") % 4 == 0)
        )
    )


@register(
    "layout_merge_lines",
    _LINES_CTE
    + """
, widths AS (
  SELECT doc_id, region_id, ord, max(x1) - min(x0) AS w
  FROM lines GROUP BY doc_id, region_id, ord)
SELECT doc_id, region_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(sum(w), 4) AS total_width
FROM widths GROUP BY doc_id, region_id
""",
)
def q_layout_merge_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import layout

    merged = layout.merge_lines_stage(layout.lines_table(spark, sf_dir))
    return merged.groupBy("doc_id", "region_id").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.round(F.sum(F.col("x1") - F.col("x0")), 4).alias("total_width"),
    )


@register(
    "layout_assign_lines",
    _LINES_CTE
    + """
, regions AS (
  SELECT doc_id, region_id AS rid,
         min(x0) AS rx0,
         min(x0) + 0.8 * (max(x1) - min(x0)) AS rx1,
         min(y) - 15 AS ry0, max(y) + 15 AS ry1
  FROM lines GROUP BY doc_id, region_id)
SELECT l.doc_id, l.line_id, r.rid AS region_id,
       round(greatest(l.x0, r.rx0), 4) AS cx0,
       round(least(l.x1, r.rx1), 4) AS cx1,
       l.y
FROM lines l JOIN regions r
  ON l.doc_id = r.doc_id
 AND l.x0 < r.rx1 AND r.rx0 < l.x1
 AND l.y - 10 < r.ry1 AND r.ry0 < l.y + 4
WHERE least(l.x1, r.rx1) > greatest(l.x0, r.rx0)
""",
)
def q_layout_assign_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import layout

    lines = layout.lines_table(spark, sf_dir)
    regions = layout.regions_table(spark, sf_dir).select(
        "doc_id",
        "region_id",
        "rx0",
        (F.col("rx0") + 0.8 * (F.col("rx1") - F.col("rx0"))).alias("rx1"),
        "ry0",
        "ry1",
    )
    out = layout.assign_lines_to_regions(lines, regions)
    return out.select(
        "doc_id",
        "line_id",
        "region_id",
        F.round("cx0", 4).alias("cx0"),
        F.round("cx1", 4).alias("cx1"),
        "y",
    )


_REGION_ORDER_ORACLE = (
    _LINES_CTE
    + """
, regions AS (
  SELECT doc_id, region_id, min(y) - 15 AS ry0
  FROM lines GROUP BY doc_id, region_id)
SELECT doc_id, region_id,
       CAST(row_number() OVER (
         PARTITION BY doc_id ORDER BY ry0, region_id) - 1 AS BIGINT)
         AS reading_order
FROM regions
"""
)


@register("layout_reading_order_bands", _REGION_ORDER_ORACLE)
def q_layout_reading_order_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import layout

    return layout.region_reading_order(
        layout.regions_table(spark, sf_dir), mode="band"
    )


@register("layout_reading_order_xycut", _REGION_ORDER_ORACLE)
def q_layout_reading_order_xycut(spark: SparkSession, sf_dir: str) -> DataFrame:
    # full SmartRegionSorter semantics (round-5): coupling order via
    # geometry.smart_sort_order + the dominant-baseline-tilt
    # pre-rotation estimated per doc from the lines frame (0 on this
    # corpus's flat synthetic baselines, so the oracle — untilted
    # reading order — still pins the result; the tilted path is
    # pinned by tests/test_geometry.py::TestSmartSortOrder)
    from pero_ocr_spark.operators import layout

    return layout.region_reading_order(
        layout.regions_table(spark, sf_dir),
        mode="xycut",
        lines=layout.lines_table(spark, sf_dir),
    )


# ---------------------------------------------------------------------------
# L8 — projection-profile line detection over RENDERED page bitmaps
# (simple_baseline_engine.py:13-101 in numpy): threshold → row-ink
# projection → autocorrelation period → −diff peaks = baselines →
# stride-3 component scan heights. The renderer draws a 10-row ink band
# above each baseline, so the detector's output is closed-form: baseline
# at y spanning the region bbox, heights [12, 3].
# ---------------------------------------------------------------------------


@register(
    "layout_detect_lines",
    _LINES_CTE
    + """
, page AS (SELECT * FROM lines WHERE ord < 60)
, regions AS (
  SELECT doc_id, region_id, min(x0) AS rx0, max(x1) AS rx1
  FROM page GROUP BY doc_id, region_id)
SELECT DISTINCT l.doc_id, l.region_id,
       r.rx0 AS bx0, r.rx1 AS bx1, l.y,
       12.0 AS height_up, 6.0 AS height_down
FROM page l
JOIN regions r ON l.doc_id = r.doc_id AND l.region_id = r.region_id
""",
)
def q_layout_detect_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one physical "page" = the first 60 ords of a document (synthetic
    # docs can have 1000+ spans; a raster that tall is not a page and
    # needlessly shuffles tens of MB per row)
    from pero_ocr_spark.operators import layout, linedet

    # fused render+detect: the raster and the per-region bboxes both
    # derive from the same lines frame inside ONE per-doc Arrow stage —
    # no bitmap transfer, no second pipeline run, no persist needed.
    # downsample 2: the reference engines run downsampled by default;
    # the stride-3 height scans quantize to [12, 6] at this resolution
    lines = layout.lines_table(spark, sf_dir).filter(F.col("ord") < 60)
    return linedet.render_detect_lines(lines, downsample=2)


# ---------------------------------------------------------------------------
# L2 — CV region segmentation over the same bitmaps (threshold →
# vertical close → margin dilation → connected components,
# simple_region_engine.py:48-137 in numpy). Closed form: one component
# per text column with bbox = ink bbox ± margin (5), close restoring
# exact vertical extents. L18 — snap jittered baselines to the smoothed
# y-gradient (adjust_baselines_to_intensity): on a 0/255 render the
# blurred edge gradient peaks one row below the last ink row, so every
# baseline lands at y+1 regardless of jitter.
# ---------------------------------------------------------------------------


@register(
    "layout_parse_maps",
    _LINES_CTE
    + """
, page AS (
  SELECT doc_id,
         CAST(x0 AS BIGINT) // 2 AS x0d,
         CAST(x1 AS BIGINT) // 2 AS x1d, y
  FROM lines WHERE ord < 60)
SELECT doc_id,
       2.0 * (x0d - 2) AS bx0,
       2.0 * (x1d + 1) AS bx1,
       y - 2 AS y,
       10.0 AS height_up, 4.0 AS height_down,
       CAST(greatest(least(10, (x1d - x0d) // 10), 2) AS BIGINT) AS n_points
FROM page
WHERE x1d - x0d >= 2
""",
)
def q_layout_parse_maps(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L5: ParseNet-map parsing (NMS → threshold → dilate → 8-conn CC →
    # subsampled baselines + median heights) over maps synthesized at
    # downsample 2. Closed form: baseline spans [2(x0//2 - 2),
    # 2(x1//2 + 1)] at y-2 (3-row smoothed band, first-occurrence row),
    # heights [10, 4], components below 2 downsampled columns dropped
    # by the reference's >5-pixel floor.
    from pero_ocr_spark.operators import layout, linedet

    lines = layout.lines_table(spark, sf_dir).filter(F.col("ord") < 60)
    return linedet.parse_lines_from_maps(
        lines.select("doc_id", "x0", "x1", "y")
    )


@register(
    "layout_refine_baselines",
    _LINES_CTE
    + """
, page AS (
  SELECT doc_id, line_id, ord, x0, x1, y
  FROM lines WHERE ord < 60 AND ord % 5 <> 4)
SELECT doc_id, line_id,
       x0 AS x_first,
       x1 - 2 AS x_last,
       round(y + (3 * (ord % 5) + 1) / 31.0, 6) AS y_refined,
       CAST(least(10, CAST(round(greatest(2.0, ((x1 - x0) / 2 - 1) / 7.0))
                           AS BIGINT)) AS BIGINT) AS n_points
FROM page
""",
)
def q_layout_refine_baselines(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L13: jittered baselines (y ± 2 by ord, like the snap query) refit
    # against the synthesized detection channel. Closed form on the
    # synthetic maps (ds=2, heights 10/4 → crop tolerance 3.5, 32-row
    # crop): the weighted deg-3 fit collapses to the response's
    # positional-weighted mean row, so the refined y lands at
    # y + (3·(ord%5)+1)/31 for jitter j=ord%5-2, the refined x spans
    # [x0, x1-2] (the crop grid's exact endpoints), and the point count
    # is the reference's min(10, round(max(2, line_length/(2·tol)))).
    # Split halves (ord%5==4) are excluded: their half-integer
    # downsampled x bounds make the crop's column phase line-specific
    # (not SQL-expressible); the snap/crop queries cover those lines.
    from pero_ocr_spark.operators import layout, linedet

    lines = layout.lines_table(spark, sf_dir).filter(
        (F.col("ord") < 60) & (F.col("ord") % 5 != 4)
    )
    jittered = lines.select(
        "doc_id",
        "line_id",
        "x0",
        "x1",
        "y",
        "asc",
        "desc",
        (F.col("y") + (F.col("ord") % 5) - 2).alias("y_in"),
    )
    refined = linedet.refine_lines_from_maps(jittered, downsample=2)
    return refined.select(
        "doc_id",
        "line_id",
        "x_first",
        "x_last",
        F.round("y_refined", 6).alias("y_refined"),
        "n_points",
    )


@register(
    "layout_detect_multi_orientation",
    _LINES_CTE
    + """
, hseg AS (
  SELECT doc_id, x0 AS a0, x1 AS a1, y AS pos
  FROM lines WHERE ord < 60 AND region_id = 'r0')
, vseg AS (
  SELECT doc_id, x0 - 500 AS a0, x1 - 500 AS a1,
         530 + (ord // 2) * 30 AS pos
  FROM lines WHERE ord < 30 AND region_id = 'r1')
, hr AS (SELECT doc_id, min(a0) AS mn, max(a1) AS mx FROM hseg GROUP BY doc_id)
, vr AS (SELECT doc_id, min(a0) AS mn, max(a1) AS mx FROM vseg GROUP BY doc_id)
SELECT h.doc_id, 'h' AS region_id, CAST(0 AS BIGINT) AS orientation,
       r.mn AS bx0, h.pos AS by0, r.mx AS bx1, h.pos AS by1,
       12.0 AS height_up, 6.0 AS height_down
FROM (SELECT DISTINCT doc_id, pos FROM hseg) h
JOIN hr r ON h.doc_id = r.doc_id
UNION ALL
SELECT v.doc_id, 'v' AS region_id, CAST(1 AS BIGINT) AS orientation,
       v.pos AS bx0, r.mn AS by0, v.pos AS bx1, r.mx AS by1,
       12.0 AS height_up, 6.0 AS height_down
FROM (SELECT DISTINCT doc_id, pos FROM vseg) v
JOIN vr r ON v.doc_id = r.doc_id
""",
)
def q_layout_detect_multi_orientation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L10: one page carries horizontal text (r0 columns) AND vertical
    # text (r1 lines re-laid as vertical bands at cols >= 510); the
    # union of the orientation-0 and orientation-1 (transposed-frame)
    # detection passes recovers both sets in page coordinates.
    from pero_ocr_spark.operators import layout, linedet

    lines = layout.lines_table(spark, sf_dir)
    hseg = lines.filter((F.col("ord") < 60) & (F.col("region_id") == "r0")).select(
        "doc_id",
        F.lit(0).cast("long").alias("orientation"),
        F.col("x0").alias("a0"),
        F.col("x1").alias("a1"),
        F.col("y").alias("pos"),
    )
    vseg = lines.filter((F.col("ord") < 30) & (F.col("region_id") == "r1")).select(
        "doc_id",
        F.lit(1).cast("long").alias("orientation"),
        (F.col("x0") - 500).alias("a0"),
        (F.col("x1") - 500).alias("a1"),
        (F.lit(530) + (F.col("ord") / 2).cast("long") * 30)
        .cast("double")
        .alias("pos"),
    )
    # fused render+detect (both orientation passes in one Arrow stage;
    # per-orientation bboxes derive from the segments in-stage)
    segments = hseg.unionByName(vseg)
    return linedet.render_detect_multi_orientation(segments, downsample=2)


@register(
    "layout_cluster_lines",
    _LINES_CTE
    + """
, keep AS (
  SELECT * FROM lines
  WHERE ord < 60 AND line_id NOT LIKE '%a' AND line_id NOT LIKE '%b')
, seq AS (
  SELECT doc_id, region_id, line_id, y,
         lag(y) OVER (PARTITION BY doc_id, region_id ORDER BY y) AS py
  FROM keep)
, isl AS (
  -- components break where rows are non-consecutive (candidate
  -- dilation can't bridge a 60px gap) or a separator row sits in the
  -- checked band (rows with index % 4 == 3 emit one 20px below)
  SELECT doc_id, region_id, line_id, y,
         sum(CASE WHEN py IS NULL OR y - py <> 30
                    OR CAST((py - 20) / 30 AS BIGINT) % 4 = 3
             THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id, region_id ORDER BY y) AS island
  FROM seq)
SELECT i.doc_id, i.line_id, m.y0 AS cluster_y0, m.sz AS cluster_size
FROM isl i
JOIN (SELECT doc_id, region_id, island, min(y) AS y0,
             CAST(count(*) AS BIGINT) AS sz
      FROM isl GROUP BY doc_id, region_id, island) m
  ON i.doc_id = m.doc_id AND i.region_id = m.region_id
 AND i.island = m.island
""",
)
def q_layout_cluster_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L6 graph variant: dilated-bbox candidates + separator-map
    # penalties + connected components; split-line halves are excluded
    # (zero x-overlap with each other would isolate single-row islands
    # nondeterministically vs the SQL island model)
    from pero_ocr_spark.operators import layout, linedet

    lines = layout.lines_table(spark, sf_dir).filter(
        (F.col("ord") < 60)
        & ~F.col("line_id").endswith("a")
        & ~F.col("line_id").endswith("b")
    )
    return linedet.cluster_lines_graph(lines)


@register(
    "line_crops",
    _LINES_CTE
    + """
SELECT doc_id, line_id,
       CAST(32 AS BIGINT) AS crop_h,
       CAST(floor((x1 - x0 - 1) * (32.0 / 14.0)) AS BIGINT) AS crop_w
FROM lines WHERE ord < 60
""",
)
def q_line_crops(spark: SparkSession, sf_dir: str) -> DataFrame:
    # R1: real numpy rectification warp over the page rasters; the
    # oracle checks the crop geometry (arc length × height scale);
    # pixel content is pytest-verified (tests/test_cropper.py)
    from pero_ocr_spark.operators import layout, linedet

    lines = layout.lines_table(spark, sf_dir).filter(F.col("ord") < 60)
    # fused render+warp; with_pixels=False keeps the crop strips inside
    # the stage (this query checks geometry only)
    return linedet.render_crop_lines(lines, with_pixels=False).select(
        "doc_id", "line_id", "crop_h", "crop_w"
    )


@register(
    "layout_segment_regions",
    _LINES_CTE
    + """
, page AS (SELECT * FROM lines WHERE ord < 60)
, ys AS (
  SELECT doc_id, region_id, y,
         lag(y) OVER (PARTITION BY doc_id, region_id ORDER BY y) AS prev_y
  FROM (SELECT DISTINCT doc_id, region_id, y FROM page))
, isl AS (
  -- gaps-and-islands: ink bands merge iff the next baseline is within
  -- 37 rows (band gap <= 2*close_gap = 26; larger gaps are unbridged
  -- since the margin dilation only spans 10)
  SELECT doc_id, region_id, y,
         sum(CASE WHEN prev_y IS NULL OR y - prev_y > 37 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id, region_id ORDER BY y) AS island
  FROM ys)
, comp AS (
  -- working resolution ds=2: close_gap 7 / margin 3 on img[::2,::2];
  -- bboxes scale back by 2 (x bounds snap to the even-pixel grid)
  SELECT p.doc_id,
         2 * ((CAST(min(p.x0) AS BIGINT) + 1) // 2 - 3) AS rx0,
         min(p.y) - 16 AS ry0,
         2 * ((CAST(max(p.x1) AS BIGINT) - 1) // 2 + 3) AS rx1,
         max(p.y) + 6 AS ry1
  FROM page p
  JOIN isl i ON p.doc_id = i.doc_id
            AND p.region_id = i.region_id AND p.y = i.y
  GROUP BY p.doc_id, p.region_id, i.island)
SELECT doc_id,
       CAST(row_number() OVER (
         PARTITION BY doc_id ORDER BY rx0, ry0) - 1 AS BIGINT) AS region_idx,
       CAST(rx0 AS BIGINT) AS rx0, CAST(ry0 AS BIGINT) AS ry0,
       CAST(rx1 AS BIGINT) AS rx1, CAST(ry1 AS BIGINT) AS ry1
FROM comp
""",
)
def q_layout_segment_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import layout, linedet

    lines = layout.lines_table(spark, sf_dir).filter(F.col("ord") < 60)
    # fused render+segment — the raster never leaves the Arrow stage
    return linedet.render_segment_regions(
        lines, close_gap=7, margin=3, min_pixels=25, downsample=2
    )


@register(
    "layout_snap_baselines",
    _LINES_CTE
    + """
SELECT doc_id, line_id, y + 1.0 AS y_snapped
FROM lines WHERE ord < 60
""",
)
def q_layout_snap_baselines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import layout, linedet

    lines = layout.lines_table(spark, sf_dir).filter(F.col("ord") < 60)
    # fused render+snap: the raster renders from the TRUE y, the
    # vectorized batch kernel snaps the jittered y — one Arrow stage
    jittered = lines.select(
        "doc_id",
        "line_id",
        "x0",
        "x1",
        "y",
        (F.col("y") + (F.col("ord") % 5) - 2).alias("y_jit"),
    )
    return linedet.render_snap_baselines(jittered)


# ---------------------------------------------------------------------------
# S2/S5 — REAL PcGts PAGE-XML round trip (core/layout.py:250-398): export
# the geometry-enriched lines to PcGts 2019 strings, re-import with the
# namespace-agnostic parser (heights_v2 custom attr, ReadingOrder,
# Baseline/Coords points), and check every recovered field against the
# closed-form line geometry. S3 — same for the ALTO layout dialect
# (core/layout.py:602-651): rect blocks/lines, BASELINE attr, String
# CONTENT word joins, reference height order.
# ---------------------------------------------------------------------------

_GEOM_LINES_ORACLE_BASE = (
    _LINES_CTE
    + """
SELECT l.doc_id, l.region_id,
       CAST(substr(l.region_id, 2) AS BIGINT) AS region_order,
       l.line_id, l.ord AS idx,
       l.x0 AS bx0, l.x1 AS bx1, l.y AS by,
       {heights},
       e.text AS transcription
       {conf}
FROM lines l
JOIN extracted e
  ON l.doc_id = e.doc_id AND l.ord = e.ord AND e.kind = 'text'
"""
)


@register(
    "pagexml_roundtrip",
    _GEOM_LINES_ORACLE_BASE.format(
        heights="10.0 AS height_up, 4.0 AS height_down",
        conf=", round(0.5 + (l.ord % 50) / 100.0, 3) AS confidence",
    ),
)
def q_pagexml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import layout
    from pero_ocr_spark.sources import pcgts

    src = layout.lines_with_geometry(spark, sf_dir)
    back = pcgts.import_pcgts(pcgts.export_pcgts(src))
    return back.select(
        "doc_id",
        "region_id",
        "region_order",
        "line_id",
        "idx",
        F.element_at(F.element_at("baseline", 1), 1).alias("bx0"),
        F.element_at(F.element_at("baseline", 2), 1).alias("bx1"),
        F.element_at(F.element_at("baseline", 1), 2).alias("by"),
        "height_up",
        "height_down",
        "transcription",
        F.round("confidence", 3).alias("confidence"),
    )


@register(
    "alto_roundtrip",
    _LINES_CTE
    + """
, numbered AS (
  SELECT doc_id, region_id, line_id, ord, x0, x1, y,
         row_number() OVER (
           PARTITION BY doc_id, region_id ORDER BY ord, line_id) - 1 AS li
  FROM lines)
SELECT l.doc_id, l.region_id,
       CAST(substr(l.region_id, 2) AS BIGINT) AS region_order,
       CAST(l.li AS BIGINT) AS idx,
       l.x0 AS bx0, l.x1 AS bx1, l.y AS by,
       4.0 AS height_up, 10.0 AS height_down,
       e.text AS transcription
FROM numbered l
JOIN extracted e
  ON l.doc_id = e.doc_id AND l.ord = e.ord AND e.kind = 'text'
""",
)
def q_alto_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NB: the reference's ALTO import stores heights as
    # [HEIGHT + VPOS - BASELINE, BASELINE - VPOS] — descender first
    # (core/layout.py:630-632); reproduced faithfully, hence the
    # swapped 4.0/10.0 expectation.
    from pero_ocr_spark.operators import layout
    from pero_ocr_spark.sources import pcgts

    src = layout.lines_with_geometry(spark, sf_dir)
    back = pcgts.import_alto(pcgts.export_alto_layout(src))
    return back.select(
        "doc_id",
        "region_id",
        "region_order",
        "idx",
        F.element_at(F.element_at("baseline", 1), 1).alias("bx0"),
        F.element_at(F.element_at("baseline", 2), 1).alias("bx1"),
        F.element_at(F.element_at("baseline", 1), 2).alias("by"),
        "height_up",
        "height_down",
        "transcription",
    )


@register(
    "cn_best_path",
    _DECODE_ORACLE.replace(
        "SELECT doc_id, 'l' || CAST(ord AS VARCHAR) AS line_id, "
        "text AS transcription\nFROM extracted WHERE kind = 'text'",
        "",
    )
    + """
SELECT doc_id, ord, text AS best_path,
       CAST(len(text) + 1 AS BIGINT) AS n_positions,
       CAST(len(text) + (len(text) - len(replace(text, 'a', ''))) + 2
            AS BIGINT) AS n_arcs
FROM extracted WHERE kind = 'text'
""",
)
def q_cn_best_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    # R14: three deterministic hypotheses per line — the transcript
    # (weight e^0), its a→x corruption (e^-1), and the transcript plus
    # a trailing 'z' (e^-2). Closed form: substitutions keep the pivot,
    # so positions with an 'a' carry two arcs; the appended 'z' makes
    # one epsilon-dominated extra position (mass ratio 1.37 : e^-2);
    # best path = the transcript, sizes as in the oracle.
    from pero_ocr_spark.operators import merge

    spans = corpus.extracted_spans(spark, sf_dir)
    t = spans.filter(F.col("kind") == "text")
    hyp = lambda txt, sc: F.struct(  # noqa: E731
        txt.alias("text"), F.lit(sc).alias("vis"), F.lit(0.0).alias("lm")
    )
    hyps = t.select(
        "doc_id",
        "ord",
        F.array(
            hyp(F.col("text"), 0.0),
            hyp(F.translate("text", "a", "x"), -1.0),
            hyp(F.concat(F.col("text"), F.lit("z")), -2.0),
        ).alias("hyps"),
    )
    return merge.confusion_network_stage(hyps)


@register(
    "alto_word_roundtrip",
    _LINES_CTE
    + """
, numbered AS (
  SELECT l.doc_id, l.region_id, l.line_id, l.ord, l.x0, l.y,
         e.text || ' ' || e.text AS txt,
         row_number() OVER (
           PARTITION BY l.doc_id, l.region_id ORDER BY l.ord, l.line_id) - 1
           AS li
  FROM lines l
  JOIN extracted e
    ON l.doc_id = e.doc_id AND l.ord = e.ord AND e.kind = 'text')
, chars AS (
  SELECT doc_id, region_id, li, x0, y, txt,
         unnest(generate_series(1, len(txt))) AS i
  FROM numbered)
, kept AS (
  SELECT doc_id, region_id, li, x0, y, i,
         substr(txt, i, 1) AS ch,
         len(substr(txt, 1, i - 1))
           - len(replace(substr(txt, 1, i - 1), ' ', '')) AS w
  FROM chars WHERE substr(txt, i, 1) <> ' ')
, seq AS (
  -- synth logits frame layout: one frame per kept char, +1 continued
  -- frame for odd 0-based text positions (i%2=0 1-based), +1 blank
  -- separator when the previous KEPT char repeats (spaces skipped)
  SELECT *,
         row_number() OVER (
           PARTITION BY doc_id, region_id, li ORDER BY i) - 1 AS k,
         CASE WHEN ch = lag(ch) OVER (
                PARTITION BY doc_id, region_id, li ORDER BY i)
              THEN 1 ELSE 0 END AS blk,
         CASE WHEN i % 2 = 0 THEN 1 ELSE 0 END AS dbl
  FROM kept)
, frames AS (
  SELECT *,
         k + sum(blk) OVER (PARTITION BY doc_id, region_id, li ORDER BY i)
           + sum(dbl) OVER (PARTITION BY doc_id, region_id, li ORDER BY i)
           - dbl AS ff
  FROM seq)
SELECT doc_id, region_id,
       CAST(substr(region_id, 2) AS BIGINT) AS region_order,
       CAST(li AS BIGINT) AS idx,
       CAST(w AS BIGINT) AS word_idx,
       string_agg(ch, '' ORDER BY i) AS content,
       CAST(x0 + 8 * min(ff) AS BIGINT) AS hpos,
       CAST(y - 10 AS BIGINT) AS vpos,
       CAST(8 * (max(ff) - min(ff) + 1) AS BIGINT) AS width,
       CAST(14 AS BIGINT) AS height,
       1.0 AS wc
FROM frames
GROUP BY doc_id, region_id, li, x0, y, w
""",
)
def q_alto_word_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S6+R10+R11 through the full XML round trip: two-word
    # transcriptions force-align to the synthetic logits (Viterbi,
    # kernels.force_align), word boxes derive from the aligned frame
    # spans (8 px/frame anchored at the line HPOS), WC is the mean
    # aligned letter confidence (exactly 1.0 on one-hot logits), the
    # XML re-imports word-losslessly via import_alto_words. The oracle
    # recomputes the synth-logits frame layout in SQL (one frame per
    # char, continued frames at odd text positions, blank separators
    # between repeated chars — crossing spaces, like the synthesizer).
    from pero_ocr_spark.operators import layout
    from pero_ocr_spark.sources import pcgts

    src = layout.lines_with_geometry(spark, sf_dir).withColumn(
        "transcription",
        F.concat_ws(" ", "transcription", "transcription"),
    )
    words = pcgts.import_alto_words(pcgts.export_alto_layout(src))
    return words.select(
        "doc_id",
        "region_id",
        "region_order",
        "idx",
        "word_idx",
        "content",
        "hpos",
        "vpos",
        "width",
        "height",
        F.round("wc", 6).alias("wc"),
    )


# ---------------------------------------------------------------------------
# A1/A2/A3/J5 — error summary two-phase aggregation, confusion matrix,
# power-mean quality, hyp↔ref compare. Hypotheses are a deterministic
# corruption (a→x) of the reference spans so errors are non-trivial and
# SQL-reproducible.
# ---------------------------------------------------------------------------

_TEXT_LINES_SQL = f"""
{corpus.SPANS_CTE}
, extracted AS (
  SELECT doc_id, kind, text, media_ref,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY span_offset) - 1
              AS BIGINT) AS ord
  FROM spans
  WHERE kind = 'media'
     OR (kind = 'text' AND text <> '' AND text NOT IN ('the', 'a'))
)
, tlines AS (
  SELECT doc_id, 'l' || CAST(ord AS VARCHAR) AS line_id, ord,
         text AS ref, replace(text, 'a', 'x') AS hyp
  FROM extracted WHERE kind = 'text')
"""


def _pairs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import extract

    spans = corpus.extracted_spans(spark, sf_dir)
    return spans.filter(F.col("kind") == "text").select(
        "doc_id",
        F.concat(F.lit("l"), F.col("ord").cast("string")).alias("line_id"),
        "ord",
        F.col("text").alias("ref"),
        F.translate(F.col("text"), "a", "x").alias("hyp"),
    )


@register(
    "error_cer_summary",
    _TEXT_LINES_SQL
    + """
SELECT doc_id,
       CAST(sum(levenshtein(ref, hyp)) AS BIGINT) AS sum_dist,
       CAST(sum(levenshtein(ref, hyp)) AS BIGINT) AS sum_subs,
       CAST(0 AS BIGINT) AS sum_ins,
       CAST(0 AS BIGINT) AS sum_dels,
       CAST(sum(length(ref)) AS BIGINT) AS sum_ref_len,
       round(sum(levenshtein(ref, hyp)) * 1.0 / sum(length(ref)), 6) AS cer
FROM tlines GROUP BY doc_id
""",
)
def q_error_cer_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import errors

    stats = errors.line_edit_stats(_pairs_df(spark, sf_dir))
    return errors.cer_summary(stats, by="doc_id")


@register(
    "error_confusion_matrix",
    _TEXT_LINES_SQL
    + """
, chars AS (
  SELECT unnest(string_split(ref, '')) AS ref_char FROM tlines)
SELECT ref_char,
       CASE WHEN ref_char = 'a' THEN 'x' ELSE ref_char END AS hyp_char,
       CAST(count(*) AS BIGINT) AS n
FROM chars GROUP BY 1, 2
""",
)
def q_error_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import errors

    return errors.confusion_matrix(_pairs_df(spark, sf_dir))


@register(
    "quality_power_mean",
    """
    SELECT event_type,
           round(pow(avg(value * value), 0.5), 4) AS power_mean,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def q_quality_power_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import errors

    out = errors.power_mean_quality(
        _t(spark, sf_dir, "events"), "value", "event_type", p=2.0
    )
    return out.withColumn("power_mean", F.round("power_mean", 4))


@register(
    "hyp_ref_compare",
    _TEXT_LINES_SQL
    + """
SELECT coalesce(h.doc_id, r.doc_id) AS doc_id,
       coalesce(h.line_id, r.line_id) AS line_id,
       h.hyp IS NOT NULL AS in_hyp,
       r.ref IS NOT NULL AS in_ref,
       CASE WHEN h.hyp IS NOT NULL AND r.ref IS NOT NULL
            THEN levenshtein(h.hyp, r.ref) END AS dist
FROM (SELECT doc_id, line_id, hyp FROM tlines WHERE ord % 7 <> 2) h
FULL OUTER JOIN (SELECT doc_id, line_id, ref FROM tlines WHERE ord % 11 <> 3) r
  ON h.doc_id = r.doc_id AND h.line_id = r.line_id
""",
)
def q_hyp_ref_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import errors

    pairs = _pairs_df(spark, sf_dir)
    hyp = pairs.filter(F.col("ord") % 7 != 2).select(
        "doc_id", "line_id", F.col("hyp").alias("transcription")
    )
    ref = pairs.filter(F.col("ord") % 11 != 3).select(
        "doc_id", "line_id", F.col("ref").alias("transcription")
    )
    return errors.hyp_ref_compare(hyp, ref)


# ---------------------------------------------------------------------------
# J4 — merge_ocr_results over two engine outputs (union + argmax by
# confidence with deterministic tiebreak, merge_ocr_results.py:50-75).
# Engine A = clean reference (conf 1.0), engine B = corrupted (conf 0.5).
# ---------------------------------------------------------------------------


@register(
    "merge_ocr_engines",
    _TEXT_LINES_SQL
    + """
, unioned AS (
  SELECT doc_id, line_id, ref AS transcription, 1.0 AS confidence, 'engA' AS engine
  FROM tlines
  UNION ALL
  SELECT doc_id, line_id, hyp, 0.5, 'engB' FROM tlines)
SELECT doc_id, line_id, transcription, engine FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id, line_id
    ORDER BY confidence DESC, engine) AS rn
  FROM unioned)
WHERE rn = 1
""",
)
def q_merge_ocr_engines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import merge

    pairs = _pairs_df(spark, sf_dir)
    eng_a = pairs.select(
        "doc_id",
        "line_id",
        F.col("ref").alias("transcription"),
        F.lit(1.0).alias("confidence"),
        F.lit("engA").alias("engine"),
    )
    eng_b = pairs.select(
        "doc_id",
        "line_id",
        F.col("hyp").alias("transcription"),
        F.lit(0.5).alias("confidence"),
        F.lit("engB").alias("engine"),
    )
    return merge.merge_ocr_results([eng_a, eng_b])


# ---------------------------------------------------------------------------
# R4 — transformer-style chunked decoding: long lines split into
# overlapping windows, each decoded independently, stitched back by
# largest-minimal-CER overlap. Exactness verified against the de-spaced
# source text; chunk counts are closed-form.
# ---------------------------------------------------------------------------


@register(
    "ctc_decode_chunked",
    """
    SELECT doc_id,
           replace(text, ' ', '') AS transcription,
           CAST(CASE WHEN length(replace(text, ' ', '')) <= 40 THEN 1
                ELSE (length(replace(text, ' ', '')) - 41) // 30 + 2
                END AS INTEGER) AS n_chunks
    FROM documents
    """,
)
def q_ctc_decode_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import ctc

    lines = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.lit("l0").alias("line_id"),
        F.regexp_replace("text", " ", "").alias("text"),
    )
    return ctc.decode_chunked(lines, max_chars=40, overlap=10).select(
        "doc_id", "transcription", "n_chunks"
    )


# ---------------------------------------------------------------------------
# O1/O2 — deterministic reading-order window (layout_helpers.py:261-272,
# with the random tiebreak replaced by a stable key).
# ---------------------------------------------------------------------------


@register(
    "reading_order_window",
    """
    SELECT l_orderkey,
           l_linenumber,
           CAST(row_number() OVER (
                PARTITION BY l_orderkey
                ORDER BY l_shipdate, l_linenumber) - 1 AS BIGINT) AS ord
    FROM lineitem
    """,
)
def q_reading_order_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_shipdate", "l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.row_number().over(w) - 1).cast("long").alias("ord"),
    )


# ---------------------------------------------------------------------------
# J4 — multi-engine merge: best hypothesis per line by confidence with
# deterministic tiebreak (merge_ocr_results.py:50-75).
# ---------------------------------------------------------------------------


@register(
    "merge_best_hypothesis",
    """
    SELECT l_orderkey, l_linenumber AS best_line, l_extendedprice AS best_price
    FROM (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_extendedprice DESC, l_linenumber) AS rn
      FROM lineitem)
    WHERE rn = 1
    """,
)
def q_merge_best_hypothesis(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_linenumber")
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_orderkey",
            F.col("l_linenumber").alias("best_line"),
            F.col("l_extendedprice").alias("best_price"),
        )
    )


# ---------------------------------------------------------------------------
# R13 — confidence filter as a Catalyst predicate (page_parser.py:510-513),
# plus an aggregation proving pushdown-friendly shape.
# ---------------------------------------------------------------------------


@register(
    "confidence_filter_agg",
    """
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE n_chars > 100 AND lang IN ('en', 'de')
    GROUP BY source
    """,
)
def q_confidence_filter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.filter((F.col("n_chars") > 100) & F.col("lang").isin("en", "de"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# A1 — CER aggregation via built-in levenshtein (compare_page_xml_texts.py:
# 39-83): hyp/ref pairs joined by id, per-group error sums.
# ---------------------------------------------------------------------------


@register(
    "cer_aggregate",
    """
    SELECT a.lang,
           CAST(sum(levenshtein(a.text, b.text)) AS BIGINT) AS sum_dist,
           CAST(sum(length(b.text)) AS BIGINT) AS sum_ref_len,
           round(CAST(sum(levenshtein(a.text, b.text)) AS DOUBLE)
                 / sum(length(b.text)), 6) AS cer
    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    GROUP BY a.lang
    """,
)
def q_cer_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    a = docs.select(
        F.col("doc_id"), F.col("lang"), F.col("text").alias("hyp")
    )
    b = docs.select((F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("ref"))
    return (
        a.join(b, "doc_id")
        .groupBy("lang")
        .agg(
            F.sum(F.levenshtein("hyp", "ref")).cast("long").alias("sum_dist"),
            F.sum(F.length("ref")).cast("long").alias("sum_ref_len"),
            F.round(
                F.sum(F.levenshtein("hyp", "ref"))
                / F.sum(F.length("ref")).cast("double"),
                6,
            ).alias("cer"),
        )
    )


# ---------------------------------------------------------------------------
# O6/O8 — top-k per group with deterministic tiebreak (multisort.py:4-15 /
# bag_of_hypotheses.py:64-65 beam top-k analog).
# ---------------------------------------------------------------------------


@register(
    "topk_per_group",
    """
    SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
           CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (
               PARTITION BY l_suppkey
               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      FROM lineitem)
    WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return (
        li.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "rank")
    )


# ---------------------------------------------------------------------------
# A5/A6 — exact median (percentile) per group: line confidence = median of
# char confidences (core/layout.py:517-519).
# ---------------------------------------------------------------------------


@register(
    "median_per_group",
    """
    SELECT l_returnflag,
           round(CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE), 4) AS median_qty,
           round(CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE), 4)
               AS median_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_median_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)").cast("double"), 4).alias(
            "median_qty"
        ),
        F.round(F.expr("percentile(l_extendedprice, 0.5)").cast("double"), 4).alias(
            "median_price"
        ),
    )


# ---------------------------------------------------------------------------
# §2.8 resume — skip-processed anti-join (parse_folder.py:73-102,314-323):
# pending work = all docs minus completed lineage.
# ---------------------------------------------------------------------------


@register(
    "resume_anti_join",
    """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS pending
    FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM orders c
      WHERE c.o_orderkey = o.o_orderkey AND c.o_orderkey % 10 < 7)
    GROUP BY o_orderstatus
    """,
)
def q_resume_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    completed = orders.filter(F.col("o_orderkey") % 10 < 7).select("o_orderkey")
    return (
        orders.join(completed, "o_orderkey", "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count("*").cast("long").alias("pending"))
    )


# ---------------------------------------------------------------------------
# A4 — decoding telemetry as df.observe metrics riding the extraction
# action (page_parser.py:147-156, decoding_itf.py:107-136): no separate
# count jobs; the observed values themselves are the query result.
# ---------------------------------------------------------------------------


@register(
    "telemetry_observe",
    _EXTRACTED_CTE
    + """
SELECT CAST(count(*) AS BIGINT) AS n_spans,
       CAST(coalesce(sum(CASE WHEN kind = 'text' THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_text,
       CAST(coalesce(sum(CASE WHEN kind = 'media' THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_media,
       CAST(coalesce(sum(length(text)), 0) AS BIGINT) AS n_chars,
       CAST(coalesce(max(ord), 0) AS BIGINT) AS max_ord
FROM extracted
""",
)
def q_telemetry_observe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import telemetry

    extracted = corpus.extracted_spans(spark, sf_dir)
    observed, obs = telemetry.observe_extraction(extracted)
    # the noop sink materializes every row (the real pipeline's write);
    # the metrics ride that action — zero extra jobs
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    # sums/max observe as NULL over zero rows; the oracle yields 0/NULL
    # for the same input — normalize to zeros
    return spark.createDataFrame(
        [
            (
                int(m["n_spans"] or 0),
                int(m["n_text"] or 0),
                int(m["n_media"] or 0),
                int(m["n_chars"] or 0),
                int(m["max_ord"] or 0),
            )
        ],
        "n_spans long, n_text long, n_media long, n_chars long, max_ord long",
    )


# ---------------------------------------------------------------------------
# S9 — transcription sink round trip (transcription_io.py:1-10): write the
# '{doc_id}-l{ord} {text}' file, read it back, recover every field.
# ---------------------------------------------------------------------------


@register(
    "transcriptions_roundtrip",
    _EXTRACTED_CTE
    + """
SELECT doc_id, ord, text
FROM extracted WHERE kind = 'text'
""",
)
def q_transcriptions_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.sources import pagexml

    extracted = corpus.extracted_spans(spark, sf_dir)
    path = _scratch("transcriptions") + "/txt"
    pagexml.write_transcriptions(extracted, path)
    back = pagexml.read_transcriptions(spark, path)
    key = r"^(\d+)-l(\d+)$"
    return back.select(
        F.regexp_extract("line_key", key, 1).cast("long").alias("doc_id"),
        F.regexp_extract("line_key", key, 2).cast("long").alias("ord"),
        "text",
    )


# ---------------------------------------------------------------------------
# S8 — line-crop sink round trip (parse_folder.py:189-199 JPEG-per-line /
# :118-137 LMDB → bucket-partitioned parquet): warp the crops (geometry
# only — pixel content is pytest-verified), sink, read back.
# ---------------------------------------------------------------------------


@register(
    "line_crop_sink",
    _LINES_CTE
    + """
SELECT doc_id, line_id,
       CAST(doc_id % 16 AS BIGINT) AS bucket,
       CAST(32 AS BIGINT) AS crop_h,
       CAST(floor((x1 - x0 - 1) * (32.0 / 14.0)) AS BIGINT) AS crop_w
FROM lines WHERE ord < 60
""",
)
def q_line_crop_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import layout, linedet
    from pero_ocr_spark.sources import images

    lines = layout.lines_table(spark, sf_dir).filter(F.col("ord") < 60)
    crops = linedet.render_crop_lines(lines, with_pixels=False).select(
        "doc_id", "line_id", "crop_h", "crop_w"
    )
    out = _scratch("line_crops")
    images.write_line_crops(crops, out, n_buckets=16)
    return images.read_line_crops(spark, out).select(
        "doc_id",
        "line_id",
        F.col("bucket").cast("long").alias("bucket"),
        "crop_h",
        "crop_w",
    )


# ---------------------------------------------------------------------------
# §2.8 — checkpointed lineage + resume as a driver query: crash after 5
# buckets (injected), re-invoke, verify the resumed manifest covers every
# bucket exactly once and its counters equal the closed-form totals.
# ---------------------------------------------------------------------------


@register(
    "lineage_resume",
    _EXTRACTED_CTE
    + """
SELECT CAST(16 AS BIGINT) AS n_buckets,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(length(text)) AS BIGINT) AS n_chars
FROM extracted
""",
)
def q_lineage_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import lineage

    # fresh-emptied fixed path: resume must start from no manifest
    out = _scratch("lineage")
    try:
        lineage.run_extraction_with_lineage(
            spark, sf_dir, out, n_buckets=16, fail_after_buckets=5
        )
    except RuntimeError:
        pass  # injected crash: 5 buckets committed, manifest persisted
    lineage.run_extraction_with_lineage(spark, sf_dir, out, n_buckets=16)
    manifest = spark.read.parquet(f"{out}/_lineage")
    return manifest.agg(
        F.countDistinct("bucket").cast("long").alias("n_buckets"),
        F.sum("n_spans").cast("long").alias("n_spans"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# R18 — Arabic shaping + visual reorder at driver level. Registered
# here without SQL; a GENERATED DuckDB oracle is attached further down
# (see _rtl_oracle_sql — the joining decisions are positionally local
# and the reorder degenerates to reversal on all-Arabic lines). The
# kernel also matches the executed reference on all 13 of its fixtures
# (tests/test_arabic_lm.py).
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Flagship end-to-end PageParser chain (page_parser.py:468-516 whole-page
# flow): ONE query running layout detection over rendered page rasters
# (fused render+detect), geometry→line attachment, batched CTC recognition
# (synth logits + greedy decode in one Arrow stage — the net-inference
# gate), and band reading order into an ordered span sequence.
# ---------------------------------------------------------------------------


@register(
    "ocr_pipeline_e2e",
    _LINES_CTE
    + """
, page AS (
  -- detection sees one baseline per (region, y): split halves merge
  SELECT DISTINCT doc_id, ord, ord % 2 AS col, y FROM lines WHERE ord < 60)
SELECT p.doc_id,
       'text' AS kind,
       e.text,
       CAST(row_number() OVER (
         PARTITION BY p.doc_id ORDER BY p.col, p.y) - 1 AS BIGINT) AS ord
FROM page p
JOIN extracted e
  ON p.doc_id = e.doc_id AND p.ord = e.ord AND e.kind = 'text'
""",
)
def q_ocr_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import ctc, layout, linedet

    lines = layout.lines_table(spark, sf_dir).filter(F.col("ord") < 60)
    # 1. layout: fused render+detect — projection-profile baselines off
    #    the page raster, one Arrow stage, no bitmap shuffle
    detected = linedet.render_detect_lines(lines, downsample=2)
    # 2. detected geometry → source line: the page grid is deterministic
    #    (y = row*30+20, col = region index), so each detected baseline
    #    addresses exactly one span ord. A real deployment recognizes
    #    the crop pixels here; with nets gated, the ground-truth text at
    #    that geometry feeds the logit synthesis inside the recognizer.
    keyed = detected.select(
        "doc_id",
        (
            F.round((F.col("y") - 20) / 30.0, 0).cast("long") * 2
            + F.substring("region_id", 2, 10).cast("long")
        ).alias("ord"),
        "y",
    )
    texts = (
        corpus.extracted_spans(spark, sf_dir)
        .filter(F.col("kind") == "text")
        .select("doc_id", "ord", "text")
    )
    attached = keyed.join(texts, ["doc_id", "ord"])
    # 3. recognition: length-packed batched synth+greedy-decode, one
    #    mapInPandas stage (R2/R3); transcription == ground truth
    rec = ctc.recognize_lines(
        attached.select(
            "doc_id",
            F.concat(F.lit("l"), F.col("ord")).alias("line_id"),
            "text",
        )
    )
    # 4. reading order: band order (column-major — all of r0 top-down,
    #    then r1), recovered from the line id's grid position
    o = F.substring("line_id", 2, 10).cast("long")
    w = Window.partitionBy("doc_id").orderBy(o % 2, F.floor(o / 2))
    return rec.select(
        "doc_id",
        F.lit("text").alias("kind"),
        F.col("transcription").alias("text"),
        (F.row_number().over(w) - 1).cast("long").alias("ord"),
    )


@register("rtl_visual_form", None)
def q_rtl_visual_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import rtl

    latin = "abcdefghijklmnopqrstuvwxyz"
    arabic = "ابتثجحخدذر" \
        "زسشصضطظعغف" \
        "قكلمنه"
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.translate(F.lower("text"), latin, arabic).alias("text")
    )
    return rtl.arabic_visual_form(docs, "text")


# ---------------------------------------------------------------------------
# Training-data pipeline, continued: cross-corpus repeated-passage dedup,
# Gopher-style repetition filters, deterministic stratified sampling, and
# greedy token-budget sequence packing.
# ---------------------------------------------------------------------------


@register(
    "dedup_common_passages",
    _SHINGLE_CTE
    + """
, common AS (SELECT s FROM sh GROUP BY s HAVING count(*) >= 3)
SELECT sh.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN c.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_common,
       round(sum(CASE WHEN c.s IS NOT NULL THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS common_frac
FROM sh LEFT JOIN common c ON sh.s = c.s
GROUP BY sh.doc_id
""",
)
def q_dedup_common_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import dedup

    return dedup.common_passages(_t(spark, sf_dir, "documents"), n=3, min_docs=3)


@register(
    "dedup_substring_spans",
    """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id,
         CAST(unnest(generate_series(0, len(ws) - 10)) AS INT) AS pos, ws
  FROM w WHERE len(ws) >= 10),
g2 AS (
  SELECT doc_id, pos,
         array_to_string(list_slice(ws, pos + 1, pos + 10), ' ') AS gram
  FROM g),
d AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           min(doc_id) OVER (PARTITION BY gram) AS mn,
           max(doc_id) OVER (PARTITION BY gram) AS mx
    FROM g2) WHERE mn <> mx),
b AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 10
              THEN 1 ELSE 0 END AS brk
  FROM d),
i AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM b)
SELECT doc_id,
       CAST(min(pos) AS INT) AS span_start,
       CAST(max(pos) + 10 AS INT) AS span_end,
       CAST(max(pos) + 10 - min(pos) AS INT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_grams
FROM i GROUP BY doc_id, island
""",
)
def q_dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    # substring-level exact dedup (ExactSubstr semantics, Lee et al.
    # 2022) without the suffix array: hashed k-token windows, cross-doc
    # flag via a min/max window on the hash (no join, no
    # count-distinct), gaps-and-islands merge to maximal spans — two
    # narrow-payload shuffles total
    from pero_ocr_spark.operators import dedup

    return dedup.duplicated_passage_spans(
        _t(spark, sf_dir, "documents"), k=10
    )


@register(
    "text_repetition_stats",
    """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(ws) - 1),
                i -> ws[i] || ' ' || ws[i+1])) AS gram
  FROM w WHERE len(ws) >= 2),
top AS (
  SELECT doc_id, max(c) AS best FROM (
    SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2) GROUP BY 1)
SELECT w.doc_id,
       round(1.0 - len(list_distinct(ws)) * 1.0 / len(ws), 6)
         AS dup_word_frac,
       CASE WHEN len(ws) >= 2
            THEN round(t.best * 1.0 / (len(ws) - 1), 6)
            ELSE 0.0 END AS top_2gram_frac
FROM w LEFT JOIN top t USING (doc_id)
""",
)
def q_text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import textstats

    return textstats.repetition_stats(_t(spark, sf_dir, "documents"))


@register(
    "sample_stratified",
    """
SELECT doc_id, source,
       CAST(10 + (CAST(substr(source, 4) AS BIGINT) * 7) % 80 AS BIGINT)
         AS keep_quota
FROM documents
WHERE (doc_id * 69069 + 12345) % 2147483647 % 100
      < 10 + (CAST(substr(source, 4) AS BIGINT) * 7) % 80
""",
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import sampling

    return sampling.sample_stratified(_t(spark, sf_dir, "documents"))


@register(
    "training_pack_sequences",
    """
WITH d AS (
  SELECT doc_id, doc_id % 32 AS bucket,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents),
c AS (
  SELECT *, sum(n_tokens) OVER (
    PARTITION BY bucket ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM d),
p AS (SELECT *, (cum - n_tokens) // 512 AS pack FROM c)
SELECT doc_id,
       CAST(bucket AS BIGINT) AS bucket,
       CAST(pack * 32 + bucket AS BIGINT) AS seq_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(row_number() OVER (
         PARTITION BY bucket, pack ORDER BY doc_id) - 1 AS BIGINT) AS seq_pos
FROM p
""",
)
def q_training_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import sampling

    return sampling.pack_sequences(
        _t(spark, sf_dir, "documents"), budget=512, n_buckets=32
    )


@register(
    "corpus_filter_pipeline",
    """
WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
f AS (
  SELECT doc_id, text, len(ws) AS n,
         len(list_filter(ws, x -> x IN
             ('the','a','of','and','to','in','is'))) * 1.0 / len(ws) AS en_ratio,
         len(list_distinct(ws)) * 1.0 / len(ws) AS diversity,
         list_sum(list_transform(ws, x -> length(x))) * 1.0 / len(ws) AS mean_len
  FROM d),
g AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(ws) - 1),
                i -> ws[i] || ' ' || ws[i+1])) AS gram
  FROM d WHERE len(ws) >= 2),
top AS (
  SELECT doc_id, max(c) AS best FROM (
    SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2) GROUP BY 1),
feat AS (
  SELECT f.doc_id,
         f.en_ratio,
         (f.diversity
          + (CASE WHEN f.n BETWEEN 50 AND 5000 THEN 1.0 ELSE 0.5 END)
          + (CASE WHEN f.mean_len BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)
         ) / 3.0 AS quality,
         1.0 - f.diversity AS dup_frac,
         CASE WHEN f.n >= 2 THEN coalesce(t.best, 0) * 1.0 / (f.n - 1)
              ELSE 0.0 END AS top2,
         row_number() OVER (PARTITION BY f.text ORDER BY f.doc_id) AS rn
  FROM f LEFT JOIN top t USING (doc_id))
SELECT doc_id,
       CASE WHEN rn > 1 THEN 'exact_duplicate'
            WHEN en_ratio < 0.04 THEN 'language'
            WHEN quality < 0.6 THEN 'quality'
            WHEN dup_frac > 0.6 THEN 'repetition_words'
            WHEN top2 > 0.3 THEN 'repetition_2gram'
            ELSE 'ok' END AS reason,
       (rn = 1 AND en_ratio >= 0.04 AND quality >= 0.6
        AND dup_frac <= 0.6 AND top2 <= 0.3) AS keep
FROM feat
""",
)
def q_corpus_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import textstats

    return textstats.corpus_filter(_t(spark, sf_dir, "documents"))


@register(
    "text_redact_pii",
    """
WITH seeded AS (
  -- the corpus has no organic PII; inject a deterministic email and
  -- account number per doc so the redaction has real work to do
  SELECT doc_id,
         text || ' user' || CAST(doc_id AS VARCHAR)
              || '@example.com acct ' || CAST(1000000 + doc_id AS VARCHAR)
           AS text
  FROM documents)
SELECT doc_id,
       regexp_replace(
         regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}',
                        '<EMAIL>', 'g'),
         '[0-9]{6,}', '<NUM>', 'g') AS text
FROM seeded
""",
)
def q_text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import textstats

    seeded = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com acct "),
            (F.col("doc_id") + 1_000_000).cast("string"),
        ).alias("text"),
    )
    return textstats.redact_pii(seeded)


@register(
    "vocab_topk",
    """
SELECT word, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
GROUP BY word
ORDER BY n DESC, word ASC
LIMIT 100
""",
)
def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import textstats

    return textstats.vocab_topk(_t(spark, sf_dir, "documents"), k=100)


@register(
    "layout_postprocess",
    _LINES_CTE
    + """
, r AS (
  SELECT doc_id, region_id, min(x0) AS rx0, max(x1) AS rx1
  FROM lines GROUP BY doc_id, region_id)
SELECT l.doc_id, l.line_id,
       greatest(r.rx0, l.x0 - 20) AS sx0,
       least(r.rx1, l.x1 + 20) AS sx1,
       round(greatest(r.rx0, l.x0 - 20)
             + 4 * (least(r.rx1, l.x1 + 20)
                    - greatest(r.rx0, l.x0 - 20)) / 9.0, 6) AS x_p5,
       l.y AS y,
       CAST(10 AS BIGINT) AS n_pts,
       row_number() OVER (
         PARTITION BY l.doc_id, l.region_id
         ORDER BY l.x1 - l.x0 DESC, l.y, l.x0) = 1 AS is_dominant
FROM lines l
JOIN r ON l.doc_id = r.doc_id AND l.region_id = r.region_id
""",
)
def q_layout_postprocess(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L15 resample + L17 stretch/dominant through the REAL numpy
    # kernels; the oracle is the closed form for straight baselines
    # (stretch clamps to region bounds, deg-1 resample keeps y, the
    # 5th of 10 linspace points sits at sx0 + 4/9 of the span)
    from pero_ocr_spark.operators import layout

    return layout.postprocess_lines(layout.lines_table(spark, sf_dir))


@register(
    "image_folder_scan",
    """
SELECT CAST(doc_id AS VARCHAR) AS file_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes
FROM documents WHERE doc_id < 64
""",
)
def q_image_folder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S1: spark.read.format("binaryFile") folder scan round trip over a
    # BOUNDED deterministic sample (64 files — the operator's unit is
    # the folder scan, not corpus scale; the corpus-scale path is the
    # parquet/iceberg table). Payload = utf-8 text; the oracle's
    # strlen() is DuckDB's byte length, exact for any content.
    import os

    from pero_ocr_spark.sources import images

    folder = _scratch("image_folder")
    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 64)
        .select("doc_id", "text")
        .collect()
    )
    for r in docs:
        with open(os.path.join(folder, f"{r['doc_id']}.bin"), "wb") as f:
            f.write(r["text"].encode("utf-8"))
    return images.scan_image_folder(spark, folder, glob="*.bin").select(
        "file_id", "n_bytes"
    )


@register(
    "layout_adaptive_downsample",
    """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0
              THEN CAST(160 + (doc_id % 3) * 40 AS DOUBLE)
              ELSE CAST(20 + (doc_id % 7) * 8 AS DOUBLE) END AS h,
         CASE WHEN doc_id % 13 = 0 THEN 8.0 ELSE 4.0 END AS ds0,
         doc_id % 11 = 0 AS sparse
  FROM documents),
c AS (
  SELECT doc_id, h, ds0, sparse,
         h / ds0 AS med,
         greatest(1.0, least(8.0, ds0 * ((h / ds0) / 12.0))) AS ds2
  FROM d)
SELECT doc_id,
       CASE WHEN sparse THEN ds0
            WHEN med >= 9 AND med <= 15 THEN ds0
            WHEN ds2 / ds0 < 0.8 OR ds2 / ds0 > 1.2 THEN round(ds2, 6)
            ELSE ds0 END AS ds,
       CAST(CASE WHEN sparse THEN 1
                 WHEN med >= 9 AND med <= 15 THEN 1
                 WHEN ds2 / ds0 < 0.8 OR ds2 / ds0 > 1.2 THEN 2
                 ELSE 1 END AS BIGINT) AS n_runs
FROM c
""",
)
def q_layout_adaptive_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L4: the control loop converges per doc. Heights 20..68 at ds0=4:
    # in-band (36-60) keep the first pass, out-of-band rerun at h/12
    # (clamped, ±20% gate). doc_id % 13 == 0 docs start at ds0=8 with
    # h >= 160 (med > 15): the correction clamps to max_downsample=8,
    # ratio 1.0 — the gate KEEPS the first pass, so deleting the gate
    # flips these to 2 runs and fails the oracle. Sparse maps
    # (doc_id % 11 == 0) skip adaptation entirely.
    from pero_ocr_spark.operators import linedet

    big = F.col("doc_id") % 13 == 0
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(big, 160 + (F.col("doc_id") % 3) * 40)
        .otherwise(20 + (F.col("doc_id") % 7) * 8)
        .cast("double")
        .alias("line_h"),
        (F.col("doc_id") % 11 == 0).alias("sparse"),
        F.when(big, 8.0).otherwise(4.0).alias("ds0"),
    )
    return linedet.adaptive_resolution_stage(d)


def _kmeans_cte(k: int = 8, iters: int = 3, dims: int = 64) -> str:
    """Unrolled Lloyd iterations in DuckDB ending at the assignment CTE
    ``a{iters-1}``: assign (argmin L2, ties to the lowest cell) against
    the current codebook, then per-dim means rounded to 6 — identical
    arithmetic to similarity.kmeans_assign."""
    sql = f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings),
dims AS (SELECT unnest(generate_series(1, {dims})) AS i),
c0 AS (
  SELECT vec_id AS cell,
         list_transform(embedding, x -> round(CAST(x AS DOUBLE), 6)) AS cent
  FROM e WHERE vec_id < {k})"""
    for t in range(iters):
        sql += f""",
a{t} AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_sum(list_transform(generate_series(1, {dims}),
                       i -> (CAST(e.embedding[i] AS DOUBLE) - c.cent[i])
                            * (CAST(e.embedding[i] AS DOUBLE) - c.cent[i]))),
                      c.cell) AS rn
    FROM e CROSS JOIN c{t} c) WHERE rn = 1)"""
        if t < iters - 1:
            sql += f""",
c{t + 1} AS (
  SELECT cell, list(v ORDER BY i) AS cent FROM (
    SELECT a.cell, d.i,
           round(avg(CAST(e.embedding[d.i] AS DOUBLE)), 6) AS v
    FROM a{t} a JOIN e USING (vec_id) CROSS JOIN dims d
    GROUP BY a.cell, d.i) GROUP BY cell)"""
    return sql


@register(
    "embedding_kmeans_assign",
    _kmeans_cte() + "\nSELECT vec_id, CAST(cell AS BIGINT) AS cell FROM a2\n",
)
def q_embedding_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SemDeDup-shaped curation clustering: Lloyd k-means, deterministic
    # init (first k ids), broadcast codebook per iteration, rounded
    # means so both engines agree on the fixed point
    from pero_ocr_spark.operators import similarity

    return similarity.kmeans_assign(
        _t(spark, sf_dir, "embeddings"), k=8, iters=3
    )


@register(
    "semantic_dedup",
    _kmeans_cte()
    + """
, ne AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
           AS nrm
  FROM e),
va AS (SELECT a2.cell, ne.vec_id, ne.emb, ne.nrm
       FROM a2 JOIN ne USING (vec_id)),
pairs AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM va a JOIN va b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 6) >= 0.35),
edges AS (
  SELECT doc_a AS x, doc_b AS y FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
r AS (
  WITH RECURSIVE reach(x, y) AS (
    SELECT x, y FROM edges
    UNION
    SELECT reach.x, e2.y FROM reach JOIN edges e2 ON reach.y = e2.x)
  SELECT * FROM reach),
comp AS (SELECT x AS vec_id, least(x, min(y)) AS canonical FROM r GROUP BY x)
SELECT a2.vec_id,
       CAST(a2.cell AS BIGINT) AS cell,
       CAST(coalesce(c.canonical, a2.vec_id) AS BIGINT) AS canonical,
       coalesce(c.canonical, a2.vec_id) = a2.vec_id AS keep
FROM a2 LEFT JOIN comp c USING (vec_id)
""",
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SemDeDup (Abbas et al. 2023 shape): cluster the embedding space,
    # find near-duplicates WITHIN each semantic cell only (the cells
    # bound the quadratic — the corpus-wide all-pairs never exists),
    # keep the minimum id of each within-cell duplicate component
    from pero_ocr_spark.operators import dedup, similarity

    emb = _t(spark, sf_dir, "embeddings")
    # localCheckpoint: the assignment subtree (crossJoin + min_by over
    # the corpus) fans out into both pair sides, the CC iteration, and
    # the final join — materialize it once
    assign = similarity.kmeans_assign(emb, k=8, iters=3).localCheckpoint()
    v = (
        similarity.with_norm(emb)
        .join(assign, "vec_id")
        .select("vec_id", "cell", "embedding", "nrm")
    )
    a = v.select(
        "cell",
        F.col("vec_id").alias("doc_a"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = v.select(
        "cell",
        F.col("vec_id").alias("doc_b"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    cos = similarity.cosine_col(
        F.col("ea"), F.col("na"), F.col("eb"), F.col("nb")
    )
    pairs = (
        a.join(b, "cell")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(cos >= 0.35)
        .select("doc_a", "doc_b")
    )
    comp = dedup.duplicate_clusters(pairs)
    return (
        assign.join(comp, assign.vec_id == comp.doc_id, "left")
        .select(
            "vec_id",
            F.col("cell").cast("long").alias("cell"),
            F.coalesce(F.col("cluster_id"), F.col("vec_id"))
            .cast("long")
            .alias("canonical"),
            (
                F.coalesce(F.col("cluster_id"), F.col("vec_id"))
                == F.col("vec_id")
            ).alias("keep"),
        )
    )


@register(
    "sample_temperature",
    """
WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
t AS (SELECT sum(pow(n, 0.5)) AS wtot, sum(n) AS ntot FROM c),
q AS (
  SELECT source,
         CAST(floor(10000 * least(1.0,
              0.3 * t.ntot * (pow(c.n, 0.5) / t.wtot) / c.n)) AS BIGINT)
           AS keep_threshold
  FROM c CROSS JOIN t)
SELECT d.doc_id, d.source, q.keep_threshold
FROM documents d JOIN q USING (source)
WHERE (d.doc_id * 69069 + 12345) % 2147483647 % 10000 < q.keep_threshold
""",
)
def q_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    # alpha=0.5 tempering: small sources keep a larger share than their
    # corpus proportion, large sources a smaller one — total ~30%
    from pero_ocr_spark.operators import sampling

    return sampling.sample_temperature(_t(spark, sf_dir, "documents"))


# shared paragraph model for the HTML round-trip oracles: the page
# synthesizer (operators/html.synthesize_html) chunks text into
# 12-word <p> blocks behind constant nav/h1/aside/footer furniture;
# these CTEs predict the parser+classifier output in closed form
_HTML_PARA_CTE = """
w AS (
  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
),
par0 AS (
  SELECT doc_id, ws,
         CAST(unnest(generate_series(0, (len(ws)-1)//12)) AS INT) AS pi
  FROM w
),
par AS (
  SELECT doc_id, pi,
         CAST(len(list_slice(ws, pi*12+1, pi*12+12)) AS INT) AS nw,
         array_to_string(list_slice(ws, pi*12+1, pi*12+12), ' ') AS ptext
  FROM par0
),
k AS (
  SELECT doc_id, CAST(max(pi)+1 AS INT) AS np,
         max(CASE WHEN pi = 0 THEN nw END) AS nw0
  FROM par GROUP BY doc_id
)
"""


@register(
    "html_block_classify",
    f"""
WITH {_HTML_PARA_CTE}
SELECT w.doc_id, 0 AS block_id, 'nav' AS tag,
       'home about contact' AS text, 3 AS n_words, 3 AS n_link_words,
       'bad' AS cls
FROM w
UNION ALL
SELECT k.doc_id, 1, 'h1', d.source || ' report', 2, 0,
       CASE WHEN k.nw0 >= 8 THEN 'good' ELSE 'bad' END
FROM k JOIN documents d USING (doc_id)
UNION ALL
SELECT doc_id, 2 + pi, 'p', ptext, nw,
       CASE WHEN pi % 3 = 2 AND nw = 12 THEN 2 ELSE 0 END,
       CASE WHEN nw >= 8 OR pi > 0 THEN 'good' ELSE 'bad' END
FROM par
UNION ALL
SELECT doc_id, 2 + np, 'aside', 'buy now subscribe today', 4, 4, 'bad' FROM k
UNION ALL
SELECT doc_id, 3 + np, 'footer', 'terms privacy copyright', 3, 2, 'bad' FROM k
""",
)
def q_html_block_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    # north-rule DOM heuristics: synthesized page -> stdlib-HTMLParser
    # block segmentation (mapInPandas) -> link-density/word-count
    # classification with jusText neighbour inheritance (windows)
    from pero_ocr_spark.operators import html as H

    docs = _t(spark, sf_dir, "documents")
    return H.classify_blocks(H.parse_html_blocks(H.synthesize_html(docs)))


@register(
    "html_main_content",
    f"""
WITH {_HTML_PARA_CTE},
kept AS (
  SELECT doc_id, pi, ptext FROM par WHERE nw >= 8 OR pi > 0
),
agg AS (
  SELECT doc_id, string_agg(ptext, ' ' ORDER BY pi) AS ptexts,
         count(*) AS nk
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CASE WHEN k.nw0 >= 8 THEN d.source || ' report ' || agg.ptexts
            ELSE coalesce(agg.ptexts, '') END AS main_text,
       CAST(CASE WHEN k.nw0 >= 8 THEN 1 ELSE 0 END
            + coalesce(agg.nk, 0) AS BIGINT) AS n_kept,
       CAST(4 + k.np AS BIGINT) AS n_blocks
FROM documents d
JOIN k USING (doc_id)
LEFT JOIN agg USING (doc_id)
""",
)
def q_html_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    # end-to-end boilerplate strip: parse -> classify -> keep good
    # blocks -> reassemble per doc (single doc_id shuffle end to end)
    from pero_ocr_spark.operators import html as H

    return H.extract_main_content(
        H.synthesize_html(_t(spark, sf_dir, "documents"))
    )


@register(
    "decontam_benchmark_overlap",
    """
WITH r AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         (doc_id*69069 + 12345) % 2147483647 % 41 = 3 AS is_bench
  FROM documents),
g AS (
  SELECT doc_id, is_bench,
         unnest(list_distinct(list_transform(
             generate_series(1, len(ws) - 4),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
                  || ws[i+3] || ' ' || ws[i+4]))) AS shingle
  FROM r WHERE len(ws) >= 4),
b AS (SELECT DISTINCT shingle FROM g WHERE is_bench),
t AS (SELECT doc_id, shingle FROM g WHERE NOT is_bench)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(count(b.shingle) AS BIGINT) AS n_overlap,
       round(count(b.shingle) * 1.0 / count(*), 6) AS overlap_frac,
       round(count(b.shingle) * 1.0 / count(*), 6) >= 0.2 AS contaminated
FROM t LEFT JOIN b ON t.shingle = b.shingle
GROUP BY t.doc_id
""",
)
def q_decontam_benchmark_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pretraining decontamination: word 5-gram collision of each
    # training doc against a held-out "benchmark" split (LCG-residue
    # selected); benchmark shingle set broadcast, corpus never shuffles
    from pero_ocr_spark.operators import dedup, sampling

    docs = _t(spark, sf_dir, "documents")
    is_bench = sampling._residue(41) == 3
    return dedup.decontaminate(
        docs.filter(~is_bench), docs.filter(is_bench), n=5, threshold=0.2
    )


@register(
    "lm_perplexity_filter",
    """
WITH ch AS (
  SELECT doc_id, string_split(text, '') AS cs FROM documents
  WHERE len(text) >= 2),
g AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(cs) - 1),
                i -> cs[i] || cs[i+1])) AS bigram
  FROM ch),
c2 AS (SELECT bigram, count(*) AS n2 FROM g GROUP BY 1),
c1 AS (SELECT substr(bigram, 1, 1) AS ctx, sum(n2) AS n1 FROM c2 GROUP BY 1),
v AS (SELECT count(DISTINCT c) AS vsize
      FROM (SELECT unnest(string_split(text, '')) AS c FROM documents)),
s AS (
  SELECT g.doc_id,
         round(avg(ln((c2.n2 + 1.0) / (c1.n1 + v.vsize))), 6) AS avg_logprob
  FROM g
  JOIN c2 USING (bigram)
  JOIN c1 ON substr(g.bigram, 1, 1) = c1.ctx
  CROSS JOIN v
  GROUP BY g.doc_id)
SELECT doc_id, avg_logprob, avg_logprob >= -1.72 AS keep FROM s
""",
)
def q_lm_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CCNet-style perplexity filter under a self-trained Laplace char
    # bigram LM — count tables are two tiny broadcast aggs; the only
    # corpus-wide shuffle is the final per-doc mean
    from pero_ocr_spark.operators import textstats

    return textstats.lm_perplexity_scores(
        _t(spark, sf_dir, "documents"), keep_threshold=-1.72
    )


@register(
    "html_interleaved_spans",
    f"""
WITH {_HTML_PARA_CTE},
kept AS (
  SELECT k.doc_id, -1 AS bk, 'text' AS kind,
         d.source || ' report' AS text, NULL AS media_ref
  FROM k JOIN documents d USING (doc_id) WHERE k.nw0 >= 8
  UNION ALL
  SELECT doc_id, pi*2, 'text', ptext, NULL
  FROM par WHERE nw >= 8 OR pi > 0
  UNION ALL
  SELECT doc_id, pi*2 + 1, 'media', NULL,
         'img://' || doc_id || '/' || pi
  FROM par WHERE pi % 2 = 1
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY bk) - 1
            AS BIGINT) AS ord,
       kind, text, media_ref
FROM kept
""",
)
def q_html_interleaved_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    # north-star ingest: interleaved web page -> DOM parse ->
    # boilerplate strip -> ordered (kind, text, media_ref, ord) spans;
    # content-column <img> elements survive as media spans, furniture
    # imagery is dropped with its surroundings
    from pero_ocr_spark.operators import html as H

    return H.html_to_spans(
        H.synthesize_html_interleaved(_t(spark, sf_dir, "documents"))
    )


@register(
    "html_template_strip",
    f"""
WITH {_HTML_PARA_CTE},
blocks AS (
  SELECT w.doc_id, d.source AS host, 0 AS bk,
         'nav' AS tag, 'home about contact' AS text
  FROM w JOIN documents d USING (doc_id)
  UNION ALL
  SELECT k.doc_id, d.source, 1, 'h1', d.source || ' report'
  FROM k JOIN documents d USING (doc_id)
  UNION ALL
  SELECT p.doc_id, d.source, 2 + p.pi, 'p', p.ptext
  FROM par p JOIN documents d USING (doc_id)
  UNION ALL
  SELECT k.doc_id, d.source, 2 + k.np, 'aside', 'buy now subscribe today'
  FROM k JOIN documents d USING (doc_id)
  UNION ALL
  SELECT k.doc_id, d.source, 3 + k.np, 'footer', 'terms privacy copyright'
  FROM k JOIN documents d USING (doc_id)
),
hd AS (
  SELECT host, count(DISTINCT doc_id) AS host_docs FROM blocks GROUP BY host
),
tpl AS (
  SELECT b.host, b.tag, b.text
  FROM blocks b JOIN hd USING (host)
  GROUP BY b.host, b.tag, b.text, hd.host_docs
  HAVING count(DISTINCT doc_id) >= 2
     AND count(DISTINCT doc_id) >= hd.host_docs * 0.5
)
SELECT doc_id, host,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY bk) - 1
            AS BIGINT) AS ord,
       'text' AS kind, text, CAST(NULL AS VARCHAR) AS media_ref
FROM blocks b
WHERE NOT EXISTS (
  SELECT 1 FROM tpl t
  WHERE t.host = b.host AND t.tag = b.tag AND t.text = b.text
)
""",
)
def q_html_template_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # inter-page template detection: a block whose normalized content
    # repeats on >=50% of its host's pages is site chrome regardless of
    # per-page features — one (host, fp) shuffle learns the per-site
    # template table (site-bounded -> broadcast), an anti-join strips
    # it, doc_id windows re-rank the survivors. Catches long link-free
    # furniture that jusText keeps (ref analog: pero-ocr drops
    # repeated page furniture by layout position; across a web corpus
    # the repeat signal is inter-page, not geometric)
    from pero_ocr_spark.operators import html as H

    docs = _t(spark, sf_dir, "documents")
    pages = H.synthesize_html(docs, keep=("source",))
    return H.strip_template_blocks(pages, host_col="source")


@register(
    "corpus_shard_shuffle",
    """
SELECT doc_id,
       CAST((doc_id*69069 + 12345) % 2147483647 % 64 AS INT) AS shard,
       CAST(row_number() OVER (
              PARTITION BY (doc_id*69069 + 12345) % 2147483647 % 64
              ORDER BY (doc_id*48271 + 11) % 2147483647, doc_id) - 1
            AS BIGINT) AS pos
FROM documents
""",
)
def q_corpus_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    # training-data global shuffle without a total order: one hash
    # shuffle on shard, per-shard local rank over an independent LCG key
    from pero_ocr_spark.operators import sampling

    return sampling.shard_shuffle(_t(spark, sf_dir, "documents"), n_shards=64)


@register(
    "quality_classifier_filter",
    f"""
WITH s AS (
  SELECT doc_id,
         round(1.0 / (1.0 + exp(-4.0 *
           list_sum(list_transform(string_split(text, ' '),
             w -> ({_DUCK_POLY.format(col="w")} % 4096 * 2654435761) % 9973
                  / 9973.0 - 0.5))
           / len(string_split(text, ' ')))), 6) AS quality_prob
  FROM documents)
SELECT doc_id, quality_prob, quality_prob >= 0.5 AS keep FROM s
""",
)
def q_quality_classifier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fastText-style hashed linear classifier, zero-shuffle in-row
    # aggregate (hash -> bucket weight -> mean logit -> sigmoid)
    from pero_ocr_spark.operators import textstats

    return textstats.quality_classifier_scores(
        _t(spark, sf_dir, "documents"), threshold=0.5
    )


_WINNOW_ORACLE = f"""
WITH wds AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
h AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, len(w) - 2),
           i -> {_DUCK_POLY.format(
               col="array_to_string(list_slice(w, i, i + 2), ' ')")}) AS hs
  FROM wds
  WHERE len(w) >= 3),
sel AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(0, greatest(len(hs) - 3, 1) - 1),
           j -> hs[j + list_max(list_filter(generate_series(0, 3),
                  p -> hs[j + p + 1] = list_min(list_slice(hs, j + 1, j + 4))))
                + 1])) AS fps
  FROM h),
fp AS (SELECT doc_id, unnest(fps) AS fp FROM sel),
kept AS (
  SELECT doc_id, fp FROM fp
  WHERE fp IN (SELECT fp FROM fp GROUP BY fp
               HAVING count(DISTINCT doc_id) <= 100)),
sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING count(*) >= 5)
SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared,
       round(n_shared * 1.0 / (sa.n + sb.n - n_shared), 6) AS fp_jaccard
FROM shared
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
"""


@register("dedup_winnowing", _WINNOW_ORACLE)
def q_dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    # MOSS-style winnowing (Schleimer et al. 2003) at word
    # granularity: word-3-gram hashes, window-4 minima with rightmost
    # tie-break — any shared passage of >= 6 words yields a shared
    # fingerprint. Selection is all in-row codegen array math;
    # too-common fingerprints (corpus boilerplate) are dropped before
    # the inverted-index self-join, which bounds the worst posting
    # list.
    from pero_ocr_spark.operators import dedup

    return dedup.winnowing_pairs(
        _t(spark, sf_dir, "documents"), k=3, w=4, min_shared=5, max_df=100
    )


_KN_ORACLE = """
WITH ws AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= 2),
g AS (
  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
  FROM ws, LATERAL unnest(generate_series(1, len(w) - 1)) t(i)),
pair AS (SELECT w1, w2, count(*) AS n12 FROM g GROUP BY w1, w2),
ctx AS (SELECT w1, sum(n12) AS c1, count(*) AS n1_fwd FROM pair GROUP BY w1),
cont AS (SELECT w2, count(*) AS n1_bwd FROM pair GROUP BY w2),
np AS (SELECT count(*) AS npairs FROM pair),
terms AS (
  SELECT g.doc_id,
         CAST(round(log2(
           greatest(pair.n12 - 0.75, 0.0) / ctx.c1
           + 0.75 * ctx.n1_fwd / ctx.c1 * cont.n1_bwd / np.npairs
         ), 9) AS DECIMAL(24,9)) AS lp
  FROM g
  JOIN pair ON g.w1 = pair.w1 AND g.w2 = pair.w2
  JOIN ctx ON g.w1 = ctx.w1
  JOIN cont ON g.w2 = cont.w2
  CROSS JOIN np)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(pow(2.0, -(CAST(sum(lp) AS DOUBLE) / count(*))), 6) AS ppl,
       round(pow(2.0, -(CAST(sum(lp) AS DOUBLE) / count(*))), 6) <= 30.0
         AS keep
FROM terms GROUP BY doc_id
"""


@register("lm_kneser_ney_perplexity", _KN_ORACLE)
def q_lm_kneser_ney_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Interpolated Kneser-Ney word-bigram perplexity (Kneser & Ney
    # 1995) — the smoothing upgrade over the add-one CCNet filter: the
    # continuation probability scores words by how many CONTEXTS they
    # follow. Pair counts hash-join the bigram stream; unigram tables
    # broadcast; per-term log2 rounded 9 dp and DECIMAL-summed so the
    # distributed addition order is ulp-exact vs the serial oracle.
    from pero_ocr_spark.operators import textstats

    return textstats.kneser_ney_perplexity(_t(spark, sf_dir, "documents"))


_HEAPS_ORACLE = """
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS wd FROM documents),
per AS (
  SELECT source, count(*) AS n_tokens, count(DISTINCT wd) AS n_vocab
  FROM w GROUP BY source),
pts AS (
  SELECT CAST(round(ln(n_tokens), 10) AS DECIMAL(38,12)) AS x,
         CAST(round(ln(n_vocab), 10) AS DECIMAL(38,12)) AS y,
         CAST(round(round(ln(n_tokens), 10) * round(ln(n_vocab), 10), 10)
              AS DECIMAL(38,12)) AS xy,
         CAST(round(round(ln(n_tokens), 10) * round(ln(n_tokens), 10), 10)
              AS DECIMAL(38,12)) AS xx
  FROM per),
s AS (
  SELECT count(*) AS n, CAST(sum(x) AS DOUBLE) AS sx,
         CAST(sum(y) AS DOUBLE) AS sy, CAST(sum(xy) AS DOUBLE) AS sxy,
         CAST(sum(xx) AS DOUBLE) AS sxx
  FROM pts)
SELECT CAST(n AS BIGINT) AS n_sources,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS beta,
       round(exp((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                 / n), 6) AS k
FROM s
"""


@register("corpus_heaps_fit", _HEAPS_ORACLE)
def q_corpus_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Heaps'-law vocabulary-growth fit across sources (V ~ K·N^beta):
    # the zipf_fit companion — template-heavy sources flatten beta,
    # noise inflates it. One map-side-combinable (source, word)
    # aggregation pair; the regression runs on the |sources| frame
    # with exact-decimal term sums.
    from pero_ocr_spark.operators import textstats

    return textstats.heaps_fit(_t(spark, sf_dir, "documents"))


def _walk_hop_sql(step: int, prev: str) -> str:
    """One unrolled hop of the deterministic walk: LEFT join the
    frontier to the edges, integer-composite argmin per walker,
    dead-ends carry their position."""
    return f"""
h{step} AS (
  SELECT f.start,
         min((((f.cur * 69069 + e.dst) % 2147483647 * 48271
               + {step} * 12345) % 2147483647) * 4294967296 + e.dst) AS mk,
         min(f.cur) AS pcur, min(f.walk) AS pwalk
  FROM {prev} f LEFT JOIN e ON e.src = f.cur
  GROUP BY f.start),
f{step} AS (
  SELECT start,
         CASE WHEN mk IS NULL THEN pcur ELSE mk % 4294967296 END AS cur,
         CASE WHEN mk IS NULL THEN pwalk
              ELSE pwalk || '->' || CAST(mk % 4294967296 AS VARCHAR)
         END AS walk
  FROM h{step})"""


_WALKS_ORACLE = (
    """
WITH n AS (SELECT count(*) AS c FROM documents),
e0 AS (
  SELECT d.doc_id AS src, (d.doc_id * 7 + t.j * 13 + 1) % n.c AS dst
  FROM documents d, n, generate_series(0, 4) t(j)
  WHERE t.j <= d.doc_id % 3 + 1),
e AS (SELECT src, dst FROM e0 WHERE src <> dst),
f0 AS (SELECT doc_id AS start, doc_id AS cur,
              CAST(doc_id AS VARCHAR) AS walk
       FROM documents),"""
    + ",".join(_walk_hop_sql(s, f"f{s - 1}") for s in (1, 2, 3))
    + """
SELECT start, walk, CAST(cur AS BIGINT) AS end_node FROM f3
"""
)


@register("web_random_walks", _WALKS_ORACLE)
def q_web_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DeepWalk/node2vec walk corpus (Perozzi et al. 2014): one
    # deterministic 3-hop walk per node — next hop = hash-argmin over
    # the current node's out-edges (the A-ES stateless-randomness
    # trick), so the walk corpus is identical at any partitioning or
    # cluster size. Each hop is one frontier-edges equi-join + a
    # map-side-combinable integer-min per walker; the composite
    # (hash << 32 | dst) key makes tie-breaking bit-identical in the
    # unrolled SQL oracle.
    from pero_ocr_spark.operators import linkgraph

    docs = _t(spark, sf_dir, "documents")
    return linkgraph.random_walks(docs, n_docs=docs.count(), steps=3)


_PMI_ORACLE = """
WITH ws AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (
  SELECT w[i] AS w1, w[i + 1] AS w2
  FROM ws, LATERAL unnest(generate_series(1, len(w) - 1)) t(i)
  WHERE len(w) >= 2),
pair AS (SELECT w1, w2, count(*) AS n12 FROM g GROUP BY w1, w2),
uni AS (
  SELECT unnest(w) AS wd FROM ws),
uc AS (SELECT wd, count(*) AS nw FROM uni GROUP BY wd),
np AS (SELECT sum(n12) AS n_bigrams FROM pair),
nt AS (SELECT sum(nw) AS n_tokens FROM uc)
SELECT p.w1, p.w2, CAST(p.n12 AS BIGINT) AS n_pair,
       round(log2(
         (p.n12 / np.n_bigrams)
         / ((u1.nw / nt.n_tokens) * (u2.nw / nt.n_tokens))
       ), 6) AS pmi
FROM pair p
JOIN uc u1 ON u1.wd = p.w1
JOIN uc u2 ON u2.wd = p.w2
CROSS JOIN np CROSS JOIN nt
WHERE p.n12 >= 5
  AND round(log2(
        (p.n12 / np.n_bigrams)
        / ((u1.nw / nt.n_tokens) * (u2.nw / nt.n_tokens))
      ), 6) >= 0.4
"""


@register("text_pmi_collocations", _PMI_ORACLE)
def q_text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    # collocation / phrase mining by pointwise mutual information
    # (Church & Hanks 1990) over adjacent word pairs, with the
    # min-count gate that kills the hapax-pair PMI blowup. Two narrow
    # explodes reduced map-side; all joins on the vocabulary-sized
    # aggregates (broadcast); exact integer counts through one
    # identically-parenthesized log ratio.
    from pero_ocr_spark.operators import textstats

    return textstats.pmi_collocations(
        _t(spark, sf_dir, "documents"), min_count=5, min_pmi=0.4
    )


_DOREMI_ORACLE = (
    "WITH kn AS (" + _KN_ORACLE + """),
dl AS (
  SELECT d.source, CAST(round(log2(kn.ppl), 6) AS DECIMAL(18,6)) AS loss
  FROM kn JOIN documents d ON d.doc_id = kn.doc_id),
per AS (
  SELECT source, count(*) AS n_docs,
         round(CAST(sum(loss) AS DOUBLE) / count(*), 6) AS mean_loss
  FROM dl GROUP BY source),
b AS (SELECT min(mean_loss) AS best FROM per),
s AS (
  SELECT source, n_docs, mean_loss,
         round(mean_loss - b.best, 6) AS excess,
         CAST(round(exp(0.1 * (mean_loss - b.best)), 9) AS DECIMAL(20,9))
           AS e
  FROM per, b),
z AS (SELECT sum(e) AS z FROM s)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs, mean_loss, excess,
       round(CAST(e AS DOUBLE) / CAST(z.z AS DOUBLE), 6) AS weight
FROM s, z
"""
)


@register("sample_doremi_mixture", _DOREMI_ORACLE)
def q_sample_doremi_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DoReMi-style domain reweighting (Xie et al. 2023, one honest EG
    # step without a trainable proxy): per-source mean Kneser-Ney
    # log2-perplexity, excess over the best source, exp(eta*excess)
    # normalized. One corpus aggregation; everything downstream runs
    # on the |sources| frame with DECIMAL sums for cross-engine
    # float parity.
    from pero_ocr_spark.operators import sampling, textstats

    docs = _t(spark, sf_dir, "documents")
    losses = (
        textstats.kneser_ney_perplexity(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("doc_id", "source", F.round(F.log2("ppl"), 6).alias("loss"))
    )
    return sampling.doremi_mixture(losses, eta=0.1)


# shared oracle CTE for the evaluation suite: the hashed-classifier
# probability (the score under test) and the heuristic quality gate
# (the stand-in ground truth) computed per document, identical
# arithmetic to quality_classifier_filter / text_quality_score
_EVAL_SCORED_CTE = f"""
WITH q0 AS (
  SELECT doc_id, text,
         string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n
  FROM documents),
scored AS (
  SELECT doc_id,
         round(1.0 / (1.0 + exp(-4.0 *
           list_sum(list_transform(w,
             x -> ({_DUCK_POLY.format(col="x")} % 4096 * 2654435761) % 9973
                  / 9973.0 - 0.5))
           / n)), 6) AS prob,
         round((len(list_distinct(w)) * 1.0 / n
                + (CASE WHEN n BETWEEN 50 AND 5000 THEN 1.0 ELSE 0.5 END)
                + (CASE WHEN list_sum(list_transform(w, x -> length(x)))
                        * 1.0 / n BETWEEN 3.0 AND 10.0
                   THEN 1.0 ELSE 0.5 END)) / 3.0, 6) >= 0.75 AS label
  FROM q0)
"""


def _eval_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import textstats

    docs = _t(spark, sf_dir, "documents")
    prob = textstats.quality_classifier_scores(docs).select(
        "doc_id", F.col("quality_prob").alias("prob")
    )
    label = textstats.quality_score(docs).select(
        "doc_id", (F.col("quality") >= 0.75).alias("label")
    )
    # both are zero-shuffle per-row projections of the same scan; the
    # equi-join on doc_id is the only exchange and AQE broadcasts the
    # smaller build side locally
    return prob.join(label, "doc_id")


@register(
    "quality_classifier_auc",
    _EVAL_SCORED_CTE
    + """
, per AS (
  SELECT prob AS s,
         sum(CASE WHEN label THEN 1 ELSE 0 END) AS np,
         sum(CASE WHEN label THEN 0 ELSE 1 END) AS nn
  FROM scored GROUP BY prob),
cum AS (
  SELECT np, nn,
         coalesce(sum(nn) OVER (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
  FROM per)
SELECT CAST(sum(np) AS BIGINT) AS n_pos,
       CAST(sum(nn) AS BIGINT) AS n_neg,
       round(CAST(sum(np * (2 * c + nn)) AS DOUBLE)
             / (2.0 * sum(np) * sum(nn)), 6) AS auc
FROM cum
""",
)
def q_quality_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # How well does the cheap hashed classifier rank documents against
    # the heuristic quality gate? Exact Mann-Whitney AUC — but the
    # textbook global rank is a corpus-wide single-partition window;
    # here scores are quantized (already 6 dp), ONE map-side
    # aggregation groups by score value, and the only ordered walk is
    # the cumulative sum over the score DOMAIN (≤ 10^6 + 1 rows,
    # corpus-independent). Integer arithmetic until the final divide.
    from pero_ocr_spark.operators import evaluate

    return evaluate.binary_auc(
        _eval_scored(spark, sf_dir), label_col="label", score_col="prob"
    )


@register(
    "quality_calibration_bins",
    _EVAL_SCORED_CTE
    + """
, b AS (
  SELECT least(CAST(floor(prob * 10) AS BIGINT), 9) AS bin,
         CAST(prob AS DECIMAL(18,6)) AS s,
         CASE WHEN label THEN 1 ELSE 0 END AS y
  FROM scored),
agg AS (
  SELECT bin, count(*) AS n, sum(s) AS sum_s, sum(y) AS n_pos
  FROM b GROUP BY bin)
SELECT bin, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
       round(CAST(sum_s AS DOUBLE) / n, 6) AS mean_predicted,
       round(n_pos * 1.0 / n, 6) AS frac_positive,
       round(round(CAST(sum_s AS DOUBLE) / n, 6)
             - round(n_pos * 1.0 / n, 6), 6) AS gap
FROM agg
""",
)
def q_quality_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Reliability diagram for the classifier's probabilities: one
    # aggregation over ≤ 10 bin keys; score sums ride DECIMAL so the
    # distributed addition order cannot flip a final double ulp.
    from pero_ocr_spark.operators import evaluate

    return evaluate.calibration_bins(
        _eval_scored(spark, sf_dir), label_col="label", score_col="prob"
    )


@register(
    "merge_engine_agreement",
    _EVAL_SCORED_CTE
    + """
, v AS (SELECT prob >= 0.5 AS a, label AS b FROM scored)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
       CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
       CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01,
       CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
         AS n00,
       round((sum(CASE WHEN a = b THEN 1 ELSE 0 END)) * 1.0 / count(*), 6)
         AS p_observed,
       round((sum(CASE WHEN a THEN 1 ELSE 0 END) * 1.0 / count(*))
             * (sum(CASE WHEN b THEN 1 ELSE 0 END) * 1.0 / count(*))
             + (1 - sum(CASE WHEN a THEN 1 ELSE 0 END) * 1.0 / count(*))
             * (1 - sum(CASE WHEN b THEN 1 ELSE 0 END) * 1.0 / count(*)), 6)
         AS p_expected,
       round(((sum(CASE WHEN a = b THEN 1 ELSE 0 END)) * 1.0 / count(*)
              - ((sum(CASE WHEN a THEN 1 ELSE 0 END) * 1.0 / count(*))
                 * (sum(CASE WHEN b THEN 1 ELSE 0 END) * 1.0 / count(*))
                 + (1 - sum(CASE WHEN a THEN 1 ELSE 0 END) * 1.0 / count(*))
                 * (1 - sum(CASE WHEN b THEN 1 ELSE 0 END) * 1.0
                    / count(*))))
             / (1 - ((sum(CASE WHEN a THEN 1 ELSE 0 END) * 1.0 / count(*))
                 * (sum(CASE WHEN b THEN 1 ELSE 0 END) * 1.0 / count(*))
                 + (1 - sum(CASE WHEN a THEN 1 ELSE 0 END) * 1.0 / count(*))
                 * (1 - sum(CASE WHEN b THEN 1 ELSE 0 END) * 1.0
                    / count(*)))), 6) AS kappa
FROM v
""",
)
def q_merge_engine_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Cohen's kappa between the model gate and the heuristic gate —
    # chance-corrected agreement between two document filters. Both
    # verdicts are computed in the same row; one global aggregate,
    # zero joins beyond the shared scored frame.
    from pero_ocr_spark.operators import evaluate

    scored = _eval_scored(spark, sf_dir).select(
        (F.col("prob") >= 0.5).alias("model_keep"), "label"
    )
    return evaluate.rater_kappa(scored, "model_keep", "label")


@register(
    "similarity_recall_eval",
    None,  # oracle assembled below from the exact + ANN oracle CTEs
)
def q_similarity_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    # recall@5 of the LSH-bucketed ANN index against exact brute-force
    # cosine top-k, per query — the measurement that licenses swapping
    # the approximate index in at 100 TB. Both sides are k·|queries|
    # rows; the comparison join is evaluation-sized, not corpus-sized.
    from pero_ocr_spark.operators import evaluate, similarity

    emb = _t(spark, sf_dir, "embeddings")
    exact = similarity.cosine_topk(emb, _QUERY_IDS, k=5)
    approx = similarity.ann_bucketed_topk(emb, _QUERY_IDS, k=5)
    return evaluate.recall_at_k(approx, exact, k=5)


def _finalize_recall_oracle() -> None:
    exact_cte = _TOPK_ORACLE.strip()
    approx_cte = _ann_oracle().strip()
    # re-head the two standalone oracles as CTE bodies
    sql = f"""
WITH exact_k AS ({exact_cte}),
approx_k AS ({approx_cte}),
h AS (
  SELECT e.query_id,
         CASE WHEN a.neighbor_id IS NULL THEN 0 ELSE 1 END AS hit
  FROM exact_k e LEFT JOIN approx_k a
    ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id)
SELECT query_id, CAST(sum(hit) AS BIGINT) AS n_hits,
       round(sum(hit) / 5.0, 6) AS recall
FROM h GROUP BY query_id
"""
    fn, _ = _REGISTRY["similarity_recall_eval"]
    _REGISTRY["similarity_recall_eval"] = (fn, sql)


_finalize_recall_oracle()


@register(
    "dedup_incremental",
    f"""
WITH __w AS (
  SELECT doc_id, text, string_split(text, ' ') AS w,
         (doc_id*69069 + 12345) % 2147483647 % 100 < 33 AS is_snap
  FROM documents),
keyed AS (
  SELECT doc_id, is_snap, sha256(text) AS h_exact,
         CASE WHEN len(w) >= 3 THEN
           list_min(list_transform(
             list_transform(generate_series(1, len(w) - 2),
                            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
             s -> {_DUCK_POLY.format(col="s")}))
         END AS fp
  FROM __w),
se AS (SELECT DISTINCT h_exact FROM keyed WHERE is_snap),
sn AS (SELECT DISTINCT fp FROM keyed WHERE is_snap AND fp IS NOT NULL),
b AS (
  SELECT doc_id, h_exact, fp,
         row_number() OVER (PARTITION BY coalesce(fp::VARCHAR, h_exact)
                            ORDER BY doc_id) = 1 AS first_in_batch
  FROM keyed WHERE NOT is_snap)
SELECT b.doc_id,
       se.h_exact IS NOT NULL AS known_exact,
       sn.fp IS NOT NULL AS known_near,
       b.first_in_batch,
       sn.fp IS NULL AND se.h_exact IS NULL AND b.first_in_batch AS keep
FROM b
LEFT JOIN se ON b.h_exact = se.h_exact
LEFT JOIN sn ON b.fp = sn.fp
""",
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    # daily-crawl shape: dedup the new batch against a frozen snapshot
    # that contributes only two key columns (sha256 + 1-perm minhash)
    from pero_ocr_spark.operators import dedup, sampling

    docs = _t(spark, sf_dir, "documents")
    # NB: mod must be coprime-scattering with the LCG constants —
    # both 69069 and 12345 are divisible by 3, so _residue(3) is
    # constant 0 for small ids; mod 100 (69 coprime to 100) permutes
    return dedup.incremental_dedup(
        docs.filter(~(sampling._residue(100) < 33)),
        docs.filter(sampling._residue(100) < 33),
    )


@register(
    "training_render_interleaved",
    f"""
{_EXTRACTED_CTE}
SELECT doc_id,
       string_agg(CASE WHEN kind = 'media' THEN '<|image|>' ELSE text END,
                  ' ' ORDER BY ord) AS train_text,
       CAST(sum(CASE WHEN kind = 'text' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_text_spans,
       CAST(sum(CASE WHEN kind = 'media' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_media_spans
FROM extracted
GROUP BY doc_id
""",
)
def q_training_render_interleaved(spark: SparkSession, sf_dir: str) -> DataFrame:
    # serialization step between extraction and the tokenizer: text
    # spans verbatim, media spans as a sentinel, reading order kept;
    # reuses the flagship plan's doc_id exchange (zero extra shuffles)
    from pero_ocr_spark import corpus
    from pero_ocr_spark.operators import extract

    spans = corpus.extracted_spans(spark, sf_dir)
    return extract.render_training_text(spans)


@register(
    "training_chunk_documents",
    """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
c AS (
  SELECT doc_id, ws,
         CAST(unnest(generate_series(0,
              greatest(0, CAST(ceil((len(ws) - 64)*1.0/56) AS BIGINT))))
           AS BIGINT) AS chunk_id
  FROM w)
SELECT doc_id, chunk_id,
       CAST(len(list_slice(ws, chunk_id*56+1, chunk_id*56+64)) AS BIGINT)
         AS n_tokens,
       array_to_string(list_slice(ws, chunk_id*56+1, chunk_id*56+64), ' ')
         AS chunk_text
FROM c
""",
)
def q_training_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # context-window chunking: 64-token windows, 8-token overlap,
    # built in-row and exploded — no shuffle anywhere in the plan
    from pero_ocr_spark.operators import textstats

    return textstats.chunk_documents(
        _t(spark, sf_dir, "documents"), max_tokens=64, overlap=8
    )


@register(
    "media_context_pairs",
    f"""
{_EXTRACTED_CTE}
, wnd AS (
  SELECT doc_id, ord, kind, media_ref,
         last_value(CASE WHEN kind = 'text' THEN text END IGNORE NULLS)
           OVER (PARTITION BY doc_id ORDER BY ord
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_text,
         first_value(CASE WHEN kind = 'text' THEN text END IGNORE NULLS)
           OVER (PARTITION BY doc_id ORDER BY ord
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS next_text
  FROM extracted)
SELECT doc_id, ord, media_ref, prev_text, next_text,
       coalesce(prev_text, next_text) AS caption
FROM wnd WHERE kind = 'media'
""",
)
def q_media_context_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # contrastive image-text pair mining over the interleaved spans:
    # nearest text neighbours of every media span, zero extra shuffles
    from pero_ocr_spark import corpus
    from pero_ocr_spark.operators import extract, media

    spans = corpus.extracted_spans(spark, sf_dir)
    return media.media_context_pairs(spans)


@register(
    "curation_pipeline_e2e",
    f"""
WITH cs AS (
  SELECT doc_id, string_split(text, '') AS c FROM documents
  WHERE len(text) >= 2),
g AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(c) - 1),
                i -> c[i] || c[i+1])) AS bigram
  FROM cs),
c2 AS (SELECT bigram, count(*) AS n2 FROM g GROUP BY 1),
c1 AS (SELECT substr(bigram, 1, 1) AS ctx, sum(n2) AS n1 FROM c2 GROUP BY 1),
v AS (SELECT count(DISTINCT ch) AS vsize
      FROM (SELECT unnest(string_split(text, '')) AS ch FROM documents)),
lp AS (
  SELECT g.doc_id,
         round(avg(ln((c2.n2 + 1.0) / (c1.n1 + v.vsize))), 6) AS avg_logprob
  FROM g JOIN c2 USING (bigram)
  JOIN c1 ON substr(g.bigram, 1, 1) = c1.ctx
  CROSS JOIN v GROUP BY g.doc_id),
clf AS (
  SELECT doc_id,
         round(1.0 / (1.0 + exp(-4.0 *
           list_sum(list_transform(string_split(text, ' '),
             w -> ({_DUCK_POLY.format(col="w")} % 4096 * 2654435761) % 9973
                  / 9973.0 - 0.5))
           / len(string_split(text, ' ')))), 6) AS quality_prob
  FROM documents),
firsts AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1 AS is_first
  FROM documents),
kept AS (
  SELECT d.doc_id, string_split(d.text, ' ') AS ws
  FROM documents d
  JOIN lp USING (doc_id) JOIN clf USING (doc_id) JOIN firsts USING (doc_id)
  WHERE lp.avg_logprob >= -1.72 AND clf.quality_prob >= 0.5 AND firsts.is_first),
chunks AS (
  SELECT doc_id, ws,
         CAST(unnest(generate_series(0,
              greatest(0, CAST(ceil((len(ws) - 64)*1.0/56) AS BIGINT))))
           AS BIGINT) AS chunk_id
  FROM kept)
SELECT doc_id, chunk_id,
       CAST(len(list_slice(ws, chunk_id*56+1, chunk_id*56+64)) AS BIGINT)
         AS n_tokens,
       array_to_string(list_slice(ws, chunk_id*56+1, chunk_id*56+64), ' ')
         AS chunk_text
FROM chunks
""",
)
def q_curation_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the full curation chain in ONE Catalyst plan: model-quality gate
    # (zero-shuffle classifier) AND LM-perplexity gate AND exact-dedup
    # first-occurrence gate, then context-window chunking of survivors
    # — composing operators composes plans; the optimizer sees it all
    from pero_ocr_spark.operators import dedup, textstats

    docs = _t(spark, sf_dir, "documents")
    clf = textstats.quality_classifier_scores(docs, threshold=0.5)
    lp = textstats.lm_perplexity_scores(docs, keep_threshold=-1.72)
    w = Window.partitionBy("text").orderBy("doc_id")
    firsts = docs.select(
        "doc_id", (F.row_number().over(w) == 1).alias("is_first")
    )
    kept = (
        docs.join(clf.filter("keep").select("doc_id"), "doc_id")
        .join(lp.filter("keep").select("doc_id"), "doc_id")
        .join(firsts.filter("is_first").select("doc_id"), "doc_id")
        .select("doc_id", "text")
    )
    return textstats.chunk_documents(kept, max_tokens=64, overlap=8)


# ---------------------------------------------------------------------------
# RTL shaping oracle: the contextual-joining decisions are POSITIONALLY
# LOCAL (prev_joins(i) == joins_forward(c[i-1]) AND joins_backward(c[i]);
# ligature membership depends only on the adjacent char, and an alef never
# joins forward so post-ligature state collapses to the same local rule),
# and on an all-Arabic+spaces line the reference reorder degenerates to
# full string reversal — so R18 is SQL-expressible after all. The form
# tables are public Unicode data interpolated from functions/arabic.py.
# ---------------------------------------------------------------------------

def _rtl_oracle_sql() -> str:
    from pero_ocr_spark.functions import arabic as _ar

    def b(x: bool) -> str:
        return "TRUE" if x else "FALSE"

    rows = ",\n    ".join(
        f"('{base}','{iso}','{fin}','{ini}','{med}',"
        f"{b(bool(ini or med))},{b(bool(fin or med))})"
        for base, (iso, fin, ini, med) in _ar.FORMS.items()
    )
    ligs = ",".join(
        f"('{alef}','{iso}','{fin}')"
        for alef, (iso, fin) in _ar.LIGATURES.items()
    )
    alefs = ",".join(f"'{a}'" for a in _ar.LIGATURES)
    latin = "abcdefghijklmnopqrstuvwxyz"
    ar = "ابتثجحخدذرزسشصضطظعغفقكلمنه"
    return f"""
WITH f(base, iso, fin, ini, med, jf, jb) AS (VALUES
    {rows}),
lig(alef, liso, lfin) AS (VALUES {ligs}),
t AS (
  SELECT doc_id,
         string_split(translate(lower(text), '{latin}', '{ar}'), '') AS cs
  FROM documents),
pos AS (
  SELECT doc_id, cs,
         CAST(unnest(generate_series(1, len(cs))) AS INT) AS i
  FROM t),
ch AS (
  SELECT doc_id, i, cs[i] AS cur,
         CASE WHEN i > 1 THEN cs[i-1] ELSE '' END AS prv,
         CASE WHEN i < len(cs) THEN cs[i+1] ELSE '' END AS nxt
  FROM pos),
sel AS (
  SELECT ch.doc_id, ch.i,
    CASE
      WHEN ch.cur IN ({alefs}) AND ch.prv = '{_ar.LAM}' THEN NULL
      WHEN ch.cur = '{_ar.LAM}' AND ch.nxt IN ({alefs}) THEN
        CASE WHEN coalesce(fp.jf, FALSE) THEN lg.lfin ELSE lg.liso END
      WHEN fc.base IS NULL THEN ch.cur
      ELSE CASE
        WHEN coalesce(fp.jf, FALSE) AND fc.jb
             AND fc.jf AND coalesce(fn.jb, FALSE)
          THEN coalesce(nullif(fc.med, ''), fc.iso)
        WHEN coalesce(fp.jf, FALSE) AND fc.jb
          THEN coalesce(nullif(fc.fin, ''), fc.iso)
        WHEN fc.jf AND coalesce(fn.jb, FALSE)
          THEN coalesce(nullif(fc.ini, ''), fc.iso)
        ELSE fc.iso END
    END AS glyph
  FROM ch
  LEFT JOIN f fc ON ch.cur = fc.base
  LEFT JOIN f fp ON ch.prv = fp.base
  LEFT JOIN f fn ON ch.nxt = fn.base
  LEFT JOIN lig lg ON ch.nxt = lg.alef)
SELECT doc_id, string_agg(glyph, '' ORDER BY i DESC) AS text
FROM sel WHERE glyph IS NOT NULL
GROUP BY doc_id
"""


_REGISTRY["rtl_visual_form"] = (_REGISTRY["rtl_visual_form"][0], _rtl_oracle_sql())


@register(
    "corpus_train_val_split",
    """
SELECT doc_id, source,
       CASE WHEN (doc_id*69069 + 12345) % 2147483647 % 100 < 10 THEN 'test'
            WHEN (doc_id*69069 + 12345) % 2147483647 % 100 < 20 THEN 'val'
            ELSE 'train' END AS split
FROM documents
""",
)
def q_corpus_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    # frozen eval splits: hash-residue assignment is stable under
    # corpus growth and stratifies by construction — a narrow CASE
    from pero_ocr_spark.operators import sampling

    return sampling.train_val_test_split(
        _t(spark, sf_dir, "documents"), val_pct=10, test_pct=10
    )


@register(
    "dedup_keep_best",
    _SHINGLE_CTE
    + f"""
, sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT da AS doc_a, db AS doc_b
  FROM common JOIN sizes x ON da = x.doc_id JOIN sizes y ON db = y.doc_id
  WHERE round(c * 1.0 / (x.n + y.n - c), 6) >= 0.8),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
r AS (
  WITH RECURSIVE reach(a, b) AS (
    SELECT a, b FROM edges
    UNION
    SELECT reach.a, e.b FROM reach JOIN edges e ON reach.b = e.a)
  SELECT * FROM reach),
clus AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM r GROUP BY a),
member AS (
  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN clus c USING (doc_id)),
q AS (
  SELECT doc_id,
         round(1.0 / (1.0 + exp(-4.0 *
           list_sum(list_transform(string_split(text, ' '),
             w -> ({_DUCK_POLY.format(col="w")} % 4096 * 2654435761) % 9973
                  / 9973.0 - 0.5))
           / len(string_split(text, ' ')))), 6) AS qp
  FROM documents),
win AS (
  SELECT cluster_id, doc_id AS keep_doc FROM (
    SELECT m.cluster_id, m.doc_id,
           row_number() OVER (PARTITION BY m.cluster_id
                              ORDER BY q.qp DESC, m.doc_id ASC) AS rn
    FROM member m JOIN q USING (doc_id)) WHERE rn = 1),
cnt AS (SELECT cluster_id, count(*) AS n_members FROM member GROUP BY 1)
SELECT m.doc_id, CAST(m.cluster_id AS BIGINT) AS cluster_id,
       CAST(cnt.n_members AS BIGINT) AS n_members,
       m.doc_id = win.keep_doc AS keep
FROM member m JOIN win USING (cluster_id) JOIN cnt USING (cluster_id)
""",
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    # retention-priority dedup: the cluster survivor is the cleanest
    # copy (classifier score), not the arbitrary min id
    from pero_ocr_spark.operators import dedup, textstats

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.8).select(
        "doc_a", "doc_b"
    )
    quality = textstats.quality_classifier_scores(docs).select(
        "doc_id", "quality_prob"
    )
    return dedup.keep_best_per_cluster(docs, pairs, quality)


# ---------------------------------------------------------------------------
# Round-4 curation additions: Bloom-filter incremental dedup (broadcast
# bitset instead of a snapshot key join), canonical-URL dedup (crawl
# frontier), intra-doc paragraph self-dedup (exact-substring family).
# ---------------------------------------------------------------------------

# m = 1024 bits (not the 2^20 production default) so the filter is
# loaded enough at sf0.01 that FALSE POSITIVES actually occur and the
# oracle must reproduce them bit-for-bit; the batch replays every
# snapshot doc under a shifted id (a recrawl), so true hits occur too.
_BLOOM_ORACLE = f"""
WITH h0 AS (
  SELECT doc_id,
         (doc_id*69069 + 12345) % 2147483647 % 100 < 33 AS is_snap,
         {_DUCK_POLY.format(col="text")} AS h
  FROM documents),
h AS (
  SELECT doc_id, is_snap, h FROM h0
  UNION ALL
  SELECT doc_id + 1000000, FALSE, h FROM h0 WHERE is_snap),
seeds AS (SELECT * FROM (VALUES (40503, 9973), (69621, 30011),
                                (48271, 104729), (16807, 65537)) AS t(a, b)),
spos AS (
  SELECT DISTINCT (h.h * CAST(s.a AS BIGINT) + s.b) % 2147483647 % 1024 AS p
  FROM h, seeds s WHERE is_snap),
bpos AS (
  SELECT doc_id, (h.h * CAST(s.a AS BIGINT) + s.b) % 2147483647 % 1024 AS p
  FROM h, seeds s WHERE NOT is_snap)
SELECT b.doc_id,
       count(sp.p) = 4 AS maybe_dup,
       count(sp.p) <> 4 AS keep
FROM bpos b LEFT JOIN spos sp ON b.p = sp.p
GROUP BY b.doc_id
"""


@register("dedup_bloom_filter", _BLOOM_ORACLE)
def q_dedup_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # crawl-dedup with a BROADCAST Bloom bitset instead of a snapshot
    # key join: the batch side never shuffles, and the oracle
    # reproduces the exact false-positive set because bit positions
    # are portable BIGINT arithmetic on the polynomial text hash. The
    # batch = fresh docs + a replay of the snapshot under shifted ids
    # (recrawl): replays must flag maybe_dup (no false negatives).
    from pero_ocr_spark.operators import dedup, sampling

    docs = _t(spark, sf_dir, "documents")
    snap = docs.filter(sampling._residue(100) < 33)
    batch = docs.filter(~(sampling._residue(100) < 33)).unionByName(
        snap.withColumn("doc_id", F.col("doc_id") + F.lit(1000000))
    )
    return dedup.bloom_dedup(batch, snap, m=1024)


# URL synthesis shared by the Spark query and the oracle: deterministic
# from (doc_id, source), with case noise, duplicate slashes, tracking
# params and fragments that canonicalization must strip. Canonical key
# collapses to (source, doc_id%50, doc_id%25) -> real duplicate groups.
_URL_SQL = """
  CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' ELSE 'https://www.' END
  || source || '.Example.COM'
  || CASE WHEN doc_id % 4 = 0 THEN '//p' ELSE '/p' END
  || CAST(doc_id % 50 AS VARCHAR)
  || CASE WHEN doc_id % 3 = 0
          THEN '/?utm_source=feed&utm_campaign=x&id='
          ELSE '/?id=' END
  || CAST(doc_id % 25 AS VARCHAR)
  || CASE WHEN doc_id % 5 = 0 THEN '#section-2' ELSE '' END
"""

_URL_CANON_SQL = """
  SELECT doc_id, url,
         regexp_replace(
           replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   lower(regexp_extract(url, '^([^:]+://[^/]*)', 1))
                   || regexp_replace(url, '^[^:]+://[^/]*', ''),
                   '#.*$', ''),
                 '(utm_[a-z]+|fbclid|gclid)=[^&]*&?', '', 'g'),
               '[?&]+$', ''),
             '://', ':~~'),
           '/{2,}', '/', 'g') AS c0
  FROM u
"""


@register(
    "dedup_canonical_url",
    f"""
WITH u AS (SELECT doc_id, {_URL_SQL} AS url FROM documents),
c AS ({_URL_CANON_SQL}),
canon AS (
  SELECT doc_id,
         regexp_replace(replace(c0, ':~~', '://'), '/$', '') AS canonical_url
  FROM c)
SELECT doc_id, canonical_url,
       row_number() OVER (PARTITION BY canonical_url ORDER BY doc_id) = 1
         AS keep
FROM canon
""",
)
def q_dedup_canonical_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import dedup

    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 2 == 0, F.lit("HTTPS://WWW.")).otherwise(F.lit("https://www.")),
        F.col("source"), F.lit(".Example.COM"),
        F.when(d % 4 == 0, F.lit("//p")).otherwise(F.lit("/p")),
        (d % 50).cast("string"),
        F.when(d % 3 == 0, F.lit("/?utm_source=feed&utm_campaign=x&id="))
         .otherwise(F.lit("/?id=")),
        (d % 25).cast("string"),
        F.when(d % 5 == 0, F.lit("#section-2")).otherwise(F.lit("")),
    )
    docs = _t(spark, sf_dir, "documents").select("doc_id", url.alias("url"))
    return dedup.canonical_url_dedup(docs).drop("url")


@register(
    "text_dedup_paragraphs",
    """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws0 FROM documents),
amp AS (
  -- prepend the first 20 words, so paragraphs 1-2 duplicate 3-4:
  -- guaranteed aligned intra-doc repetition to exercise the dedup
  SELECT doc_id, list_concat(ws0[1:20], ws0) AS ws FROM w),
p AS (
  SELECT doc_id, ws,
         list_transform(
           generate_series(0, greatest(1, CAST(ceil(len(ws)/10.0) AS BIGINT)) - 1),
           i -> array_to_string(list_slice(ws, i*10 + 1, i*10 + 10), ' ')
         ) AS paras
  FROM amp),
k AS (
  SELECT doc_id, paras,
         list_filter(paras, (x, i) -> list_position(paras, x) = i) AS kept
  FROM p)
SELECT doc_id,
       CAST(len(paras) AS BIGINT) AS n_paras,
       CAST(len(kept) AS BIGINT) AS n_kept,
       array_to_string(kept, ' ') AS deduped_text
FROM k
""",
)
def q_text_dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pero_ocr_spark.operators import textstats

    ws = F.split(F.col("text"), " ")
    amp = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_join(F.concat(F.slice(ws, 1, 20), ws), " ").alias("text"),
    )
    return textstats.dedup_paragraphs(amp, para_words=10)


@register(
    "pdf_roundtrip",
    _EXTRACTED_CTE
    + """
SELECT doc_id, ord, kind, text, media_ref FROM extracted
""",
)
def q_pdf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S11: extracted spans -> one searchable PDF per document (stdlib
    # byte-accurate writer: invisible Courier text layer in render mode
    # 3 with the reference's fit/stretch math in closed form, media as
    # embedded image XObjects tagged /Figure ActualText; emission order
    # scrambled within each page) -> content-stream parser that
    # reconstructs the span sequence from glyph GEOMETRY. The oracle is
    # the extraction CTE itself: span-sequence equality
    # (kind, text, media_ref, order) straight through PDF bytes.
    # Ref semantics: document_ocr/pdf_production.py:99-145 (PDFWriter),
    # with the read path the reference lacks.
    from pero_ocr_spark import corpus
    from pero_ocr_spark.operators import extract
    from pero_ocr_spark.sources import pdf

    spans = corpus.extracted_spans(spark, sf_dir)
    return pdf.parse_pdf_spans(pdf.render_pdfs(spans))


@register(
    "warc_ingest",
    """
SELECT doc_id,
       CAST(doc_id % 32 AS BIGINT) AS shard_id,
       CAST(row_number() OVER (PARTITION BY doc_id % 32 ORDER BY doc_id) - 1
            AS BIGINT) AS rec_index,
       'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR)
         AS url,
       CAST(CASE WHEN doc_id % 50 = 7 THEN 404 ELSE 200 END AS BIGINT)
         AS status,
       'text/html; charset=utf-8' AS content_type
FROM documents
""",
)
def q_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # web-ingest container tier: documents -> deterministic HTTP
    # captures -> length-framed WARC shards (ISO 28500 / Common Crawl
    # shape) -> record parse. Verifies framing, per-shard record order,
    # WARC+HTTP header fields, and the 404-capture branch.
    from pero_ocr_spark.operators import html as H
    from pero_ocr_spark.sources import warc as W

    docs = _t(spark, sf_dir, "documents")
    pages = H.synthesize_html(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    shards = W.synthesize_warc_shards(W.capture_table(pages), n_shards=32)
    return W.parse_warc_records(shards).select(
        "doc_id", "shard_id", "rec_index", "url", "status", "content_type"
    )


@register(
    "warc_html_spans",
    f"""
WITH {_HTML_PARA_CTE},
kept AS (
  SELECT k.doc_id, -1 AS bk, 'text' AS kind,
         d.source || ' report' AS text, NULL AS media_ref
  FROM k JOIN documents d USING (doc_id) WHERE k.nw0 >= 8
  UNION ALL
  SELECT doc_id, pi*2, 'text', ptext, NULL
  FROM par WHERE nw >= 8 OR pi > 0
  UNION ALL
  SELECT doc_id, pi*2 + 1, 'media', NULL,
         'img://' || doc_id || '/' || pi
  FROM par WHERE pi % 2 = 1
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY bk) - 1
            AS BIGINT) AS ord,
       kind, text, media_ref
FROM kept
WHERE doc_id % 50 <> 7
""",
)
def q_warc_html_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the full web path in one plan: WARC container -> record framing
    # -> HTTP parse -> DOM block segmentation -> boilerplate strip ->
    # interleaved (kind, text, media_ref, ord) spans. Oracle = the
    # html_interleaved_spans closed form minus the 404 captures.
    from pero_ocr_spark.operators import html as H
    from pero_ocr_spark.sources import warc as W

    docs = _t(spark, sf_dir, "documents")
    pages = H.synthesize_html_interleaved(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    shards = W.synthesize_warc_shards(W.capture_table(pages), n_shards=32)
    recs = W.parse_warc_records(shards).filter(F.col("status") == 200)
    return H.html_to_spans(
        recs.select("doc_id", F.col("body").alias("html"))
    )


_PAGERANK_ORACLE = """
WITH cnt AS (SELECT count(*) AS n FROM documents),
j AS (
  SELECT doc_id AS src,
         unnest(generate_series(0, doc_id % 3 + 1)) AS j
  FROM documents),
e AS (
  SELECT src, (src*7 + j*13 + 1) % (SELECT n FROM cnt) AS dst
  FROM j
  WHERE (src*7 + j*13 + 1) % (SELECT n FROM cnt) <> src),
od AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
ew AS (SELECT e.src, e.dst, od.deg FROM e JOIN od USING (src)),
r0 AS (SELECT doc_id, 1.0/(SELECT n FROM cnt) AS rank FROM documents),
r1 AS (
  SELECT d.doc_id,
         (1.0-0.85)/(SELECT n FROM cnt) + 0.85*coalesce(s.inflow, 0.0) AS rank
  FROM documents d LEFT JOIN (
    SELECT ew.dst AS doc_id, sum(r0.rank/ew.deg) AS inflow
    FROM ew JOIN r0 ON r0.doc_id = ew.src GROUP BY ew.dst) s USING (doc_id)),
r2 AS (
  SELECT d.doc_id,
         (1.0-0.85)/(SELECT n FROM cnt) + 0.85*coalesce(s.inflow, 0.0) AS rank
  FROM documents d LEFT JOIN (
    SELECT ew.dst AS doc_id, sum(r1.rank/ew.deg) AS inflow
    FROM ew JOIN r1 ON r1.doc_id = ew.src GROUP BY ew.dst) s USING (doc_id)),
r3 AS (
  SELECT d.doc_id,
         (1.0-0.85)/(SELECT n FROM cnt) + 0.85*coalesce(s.inflow, 0.0) AS rank
  FROM documents d LEFT JOIN (
    SELECT ew.dst AS doc_id, sum(r2.rank/ew.deg) AS inflow
    FROM ew JOIN r2 ON r2.doc_id = ew.src GROUP BY ew.dst) s USING (doc_id))
SELECT doc_id, round(rank, 9) AS rank FROM r3
"""


@register("web_pagerank", _PAGERANK_ORACLE)
def q_web_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cross-document web structure: 3 power-iteration steps over the
    # deterministic doc_id link graph. The iterated shuffle shape —
    # rank joins edges on src, re-agg by dst, NOTHING broadcast (at
    # 10^12 docs the rank vector is corpus-sized); edge list persisted
    # once. Oracle = the same three iterations unrolled as CTEs.
    from pero_ocr_spark.operators import linkgraph

    docs = _t(spark, sf_dir, "documents")
    return linkgraph.pagerank(docs, n_docs=docs.count(), iterations=3)


@register(
    "host_quality_priors",
    """
WITH q AS (
  SELECT doc_id, source,
         string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n
  FROM documents),
s AS (
  SELECT doc_id, source || '.example.com' AS host,
         round((len(list_distinct(w)) * 1.0 / n
                + (CASE WHEN n BETWEEN 50 AND 5000 THEN 1.0 ELSE 0.5 END)
                + (CASE WHEN list_sum(list_transform(w, x -> length(x))) * 1.0 / n
                        BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)) / 3.0, 6)
           AS doc_quality
  FROM q),
h AS (
  SELECT host, round(avg(doc_quality), 6) AS host_prior,
         CAST(count(*) AS BIGINT) AS host_docs
  FROM s GROUP BY host)
SELECT s.doc_id, s.host, s.doc_quality, h.host_prior, h.host_docs,
       0.5*s.doc_quality + 0.5*h.host_prior AS combined,
       0.5*s.doc_quality + 0.5*h.host_prior > 0.55 AS keep
FROM s JOIN h USING (host)
""",
)
def q_host_quality_priors(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RefinedWeb/CCNet-style host-level curation: per-doc quality
    # blended with the host mean. Agg to hosts (1000x reduction at
    # scale) + broadcast join back - no window over the corpus.
    from pero_ocr_spark.operators import linkgraph

    return linkgraph.host_quality_priors(_t(spark, sf_dir, "documents"))


@register(
    "similarity_quantized_topk",
    f"""
WITH e0 AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
sq AS (
  SELECT vec_id,
         CASE WHEN list_max(list_transform(emb, x -> abs(x))) = 0
              THEN 1.0
              ELSE list_max(list_transform(emb, x -> abs(x))) / 127.0
         END AS s,
         emb
  FROM e0),
eq AS (
  SELECT vec_id,
         list_transform(emb, x -> round(x / s)) AS q
  FROM sq),
en AS (
  SELECT vec_id, q, sqrt(list_dot_product(q, q)) AS qn FROM eq),
sims AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round(list_dot_product(a.q, b.q) / (a.qn * b.qn), 6) AS qcosine
  FROM en a JOIN en b ON b.vec_id <> a.vec_id
  WHERE a.vec_id IN ({", ".join(str(i) for i in _QUERY_IDS)}))
SELECT query_id, neighbor_id, qcosine, CAST(rn AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY qcosine DESC, neighbor_id) AS rn
  FROM sims)
WHERE rn <= 5
""",
)
def q_similarity_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SQ8 similarity: int8 codes (4x smaller scan at 100 TB), cosine
    # computed on the quantized vectors directly - the per-vector
    # scales cancel, so ranking never dequantizes. Same deterministic
    # tiebreak as the exact baseline.
    from pero_ocr_spark.operators import similarity

    return similarity.quantized_topk(
        _t(spark, sf_dir, "embeddings"), _QUERY_IDS, k=5
    )


@register(
    "warc_stream_ingest",
    f"""
WITH {_HTML_PARA_CTE},
kept AS (
  SELECT k.doc_id, -1 AS bk, 'text' AS kind,
         d.source || ' report' AS text, NULL AS media_ref
  FROM k JOIN documents d USING (doc_id) WHERE k.nw0 >= 8
  UNION ALL
  SELECT doc_id, pi*2, 'text', ptext, NULL
  FROM par WHERE nw >= 8 OR pi > 0
  UNION ALL
  SELECT doc_id, pi*2 + 1, 'media', NULL,
         'img://' || doc_id || '/' || pi
  FROM par WHERE pi % 2 = 1
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY bk) - 1
            AS BIGINT) AS ord,
       kind, text, media_ref
FROM kept
WHERE doc_id % 50 <> 7
""",
)
def q_warc_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Structured-Streaming web ingest, externally verified: WARC shard
    # blobs land as files, an availableNow foreachBatch run parses and
    # extracts them with the exactly-once (batch_id, shard) dynamic-
    # overwrite write, and the sink contents must equal the SAME
    # closed form as the batch path (warc_html_spans oracle) — the
    # streaming engine may split shards across micro-batches however
    # it likes, the union of idempotent batch writes must not care.
    import os

    from pero_ocr_spark.operators import html as H
    from pero_ocr_spark.sources import warc as W
    from pero_ocr_spark.streaming import ingest

    root = _scratch("warc_stream")
    warc_dir, out_dir, ckpt = (
        os.path.join(root, d) for d in ("shards", "spans", "ckpt")
    )
    docs = _t(spark, sf_dir, "documents")
    pages = H.synthesize_html_interleaved(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    W.synthesize_warc_shards(W.capture_table(pages), n_shards=32).coalesce(
        4
    ).write.mode("overwrite").parquet(warc_dir)
    q = ingest.stream_ingest_warc(spark, warc_dir, out_dir, ckpt)
    q.awaitTermination(300)
    return spark.read.parquet(out_dir).select(
        "doc_id", "ord", "kind", "text", "media_ref"
    )


def _redirect_iter(i: int) -> str:
    return f"""
r{i + 1} AS (
  SELECT r.doc_id,
         CASE WHEN s.status = 301 THEN h.nxt ELSE r.cur END AS cur,
         r.hops + CASE WHEN s.status = 301 THEN 1 ELSE 0 END AS hops
  FROM r{i} r JOIN st s ON s.doc_id = r.cur JOIN hop h ON h.doc_id = r.cur)"""


@register(
    "warc_redirect_resolution",
    """
WITH cnt AS (SELECT count(*) AS n FROM documents),
u AS (
  SELECT doc_id,
         'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR)
           AS url
  FROM documents),
st AS (
  SELECT doc_id,
         CASE WHEN doc_id % 40 IN (3, 10, 17) THEN 301
              WHEN doc_id % 50 = 7 THEN 404 ELSE 200 END AS status
  FROM documents),
hop AS (SELECT doc_id, (doc_id + 7) % (SELECT n FROM cnt) AS nxt FROM documents),
r0 AS (SELECT doc_id, doc_id AS cur, 0 AS hops FROM documents),"""
    + ",".join(_redirect_iter(i) for i in range(4))
    + """
SELECT r.doc_id, u0.url AS start_url, u1.url AS final_url,
       CAST(s.status AS BIGINT) AS final_status,
       CAST(r.hops AS BIGINT) AS hops,
       s.status <> 301 AS resolved
FROM r4 r
JOIN u u0 ON u0.doc_id = r.doc_id
JOIN u u1 ON u1.doc_id = r.cur
JOIN st s ON s.doc_id = r.cur
""",
)
def q_warc_redirect_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # crawl post-processing: 301 chains followed by URL equi-joins over
    # the parsed archive (chains of length 1-3 by construction: 17->24,
    # 10->17->24, 3->10->17->24); oracle = hops unrolled over id
    # arithmetic. Nothing broadcast - at corpus scale the record table
    # and the frontier are both corpus-sized.
    from pero_ocr_spark.operators import html as H
    from pero_ocr_spark.sources import warc as W

    docs = _t(spark, sf_dir, "documents")
    n = docs.count()
    pages = H.synthesize_html(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    caps = W.capture_table(pages, with_redirects=True, n_docs=n)
    recs = W.parse_warc_records(W.synthesize_warc_shards(caps, n_shards=32))
    return W.resolve_redirects(recs, max_hops=4)


@register(
    "warc_robots_filter",
    """
WITH cap AS (
  SELECT doc_id,
         'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR)
           AS url,
         source || '.example.com' AS host,
         CAST(regexp_extract(source, '(\\d+)$', 1) AS BIGINT) AS src_idx
  FROM documents)
SELECT doc_id, url, host,
       CASE WHEN src_idx % 5 = 0 THEN 'disallow_all'
            WHEN src_idx % 5 = 2 THEN 'disallow_odd'
            ELSE 'allow' END AS rule,
       CASE WHEN src_idx % 5 = 0 THEN FALSE
            WHEN src_idx % 5 = 2 AND doc_id % 2 = 1 THEN FALSE
            ELSE TRUE END AS allowed
FROM cap
""",
)
def q_warc_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # crawl compliance: parsed per-host robots rules (host-sized table,
    # broadcast) applied to the capture urls - the corpus side never
    # shuffles; rule kinds cover full-block, pattern-block and allow.
    from pero_ocr_spark.operators import html as H
    from pero_ocr_spark.sources import warc as W

    docs = _t(spark, sf_dir, "documents")
    pages = H.synthesize_html(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    caps = W.capture_table(pages).select("doc_id", "url")
    return W.robots_filter(caps, W.synth_robots(docs))


@register(
    "warc_charset_decode",
    """
SELECT doc_id,
       CASE doc_id % 10
         WHEN 1 THEN 'utf-16-le' WHEN 6 THEN 'utf-16-le'
         WHEN 2 THEN 'utf-16-be' WHEN 7 THEN 'utf-16-be'
         WHEN 3 THEN 'latin-1'   WHEN 9 THEN 'latin-1'
         WHEN 8 THEN 'cp1252'
         ELSE 'utf-8' END AS charset,
       CASE doc_id % 10
         WHEN 1 THEN 'bom' WHEN 6 THEN 'bom'
         WHEN 2 THEN 'bom' WHEN 7 THEN 'bom'
         WHEN 8 THEN 'meta'
         WHEN 4 THEN 'sniff' WHEN 9 THEN 'sniff'
         ELSE 'header' END AS charset_source,
       text || ' café' AS text
FROM documents
""",
)
def q_warc_charset_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # byte→text front door: deterministic multi-encoding synthesis
    # (BOM / header / meta / sniff rungs, non-ascii probe suffix) then
    # the WHATWG-ordered detection ladder; every decoded text must
    # equal original + probe regardless of which rung fired. Narrow
    # Arrow map end-to-end — zero shuffles.
    from pero_ocr_spark.operators import charset

    return charset.decode_corpus(_t(spark, sf_dir, "documents"))


@register(
    "warc_gzip_ingest",
    """
SELECT doc_id,
       CAST(doc_id % 32 AS BIGINT) AS shard_id,
       CAST(row_number() OVER (PARTITION BY doc_id % 32 ORDER BY doc_id) - 1
            AS BIGINT) AS rec_index,
       CAST(CASE WHEN doc_id % 50 = 7 THEN 404 ELSE 200 END AS BIGINT)
         AS status
FROM documents
""",
)
def q_warc_gzip_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # .warc.gz container form (the actual Common Crawl layout): one
    # gzip member per record, members walked by decompressor handoff
    # (never delimiter-searched); record set, order and status branch
    # must equal the plain-framed parse exactly.
    from pero_ocr_spark.operators import html as H
    from pero_ocr_spark.sources import warc as W

    docs = _t(spark, sf_dir, "documents")
    pages = H.synthesize_html(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    shards = W.synthesize_warc_shards(
        W.capture_table(pages), n_shards=32, gzip_members=True
    )
    return W.parse_warc_records(shards).select(
        "doc_id", "shard_id", "rec_index", "status"
    )


@register(
    "warc_cdx_index",
    """
SELECT CAST(doc_id % 32 AS BIGINT) AS shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(COUNT(*) AS BIGINT) AS n_verified
FROM documents
GROUP BY doc_id % 32
""",
)
def q_warc_cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CDX offset index over .warc.gz shards: every entry's (offset,
    # length) byte slice is independently re-parsed in-task; the
    # oracle pins n_verified == n_records, so a single entry whose
    # slice does not stand alone fails the external hash check.
    from pero_ocr_spark.operators import html as H
    from pero_ocr_spark.sources import warc as W

    docs = _t(spark, sf_dir, "documents")
    pages = H.synthesize_html(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    shards = W.synthesize_warc_shards(
        W.capture_table(pages), n_shards=32, gzip_members=True
    )
    return W.cdx_index(shards).groupBy("shard_id").agg(
        F.count("*").alias("n_records"),
        F.sum("verified").alias("n_verified"),
    )


@register(
    "iceberg_snapshot_reads",
    _EXTRACTED_CTE
    + """
, tags AS (
  SELECT 'current' AS tag, doc_id, ord, text FROM extracted
  UNION ALL
  SELECT 'time_travel_v1', doc_id, ord, text FROM extracted
  WHERE doc_id % 2 = 0
  UNION ALL
  SELECT 'incremental_v1_v2', doc_id, ord, text FROM extracted
  WHERE doc_id % 2 = 1
  UNION ALL
  SELECT 'pruned_range', doc_id, ord, text FROM extracted
  WHERE doc_id BETWEEN 100 AND 149
)
SELECT tag,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(SUM(ord) AS BIGINT) AS sum_ord,
       CAST(SUM(length(text)) AS BIGINT) AS sum_text_len
FROM tags
GROUP BY tag
""",
)
def q_iceberg_snapshot_reads(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Snapshot-table lifecycle over the extraction output (the
    # north-rule Iceberg sink): commit the even-doc half as v1,
    # append the odd half as v2, then verify four read paths against
    # closed-form arithmetic — current, time travel to v1,
    # incremental v1->v2, and a stats-pruned range read (pruning is
    # an optimization, so the exact predicate is applied on top).
    from pero_ocr_spark.sources.icetable import IceTable

    spans = corpus.extracted_spans(spark, sf_dir)
    table = IceTable(_scratch("icetable"), stats_cols=("doc_id",))
    table.commit(
        spans.filter(F.col("doc_id") % 2 == 0).repartitionByRange(8, "doc_id")
    )
    table.commit(
        spans.filter(F.col("doc_id") % 2 == 1).repartitionByRange(8, "doc_id")
    )
    reads = [
        ("current", table.read(spark)),
        ("time_travel_v1", table.read(spark, version=1)),
        ("incremental_v1_v2", table.incremental(spark, 1, 2)),
        (
            "pruned_range",
            table.read(spark, prune={"doc_id": (100, 149)}).filter(
                F.col("doc_id").between(100, 149)
            ),
        ),
    ]
    parts = [
        df.select(F.lit(tag).alias("tag"), "doc_id", "ord", "text")
        for tag, df in reads
    ]
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    return union.groupBy("tag").agg(
        F.count("*").alias("n_spans"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("ord").alias("sum_ord"),
        F.sum(F.length("text")).alias("sum_text_len"),
    )


@register(
    "icetable_upsert_delete",
    """
WITH res AS (
  SELECT doc_id, text, source,
         (doc_id*69069 + 12345) % 2147483647 % 100 AS r
  FROM documents),
merged AS (
  SELECT doc_id,
         CASE WHEN r < 10 THEN 'rev2 ' || text ELSE text END AS text,
         source
  FROM res
  UNION ALL
  SELECT doc_id + 5000000, 'ins ' || source, source FROM res WHERE r = 55
)
SELECT doc_id, text, source FROM merged
WHERE NOT (doc_id % 2 = 1 AND doc_id < 100)
""",
)
def q_icetable_upsert_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Row-level table ops on the snapshot format: commit the corpus
    # range-clustered, MERGE a revision batch (10% revised + new docs
    # far outside the key range), copy-on-write DELETE a narrow key
    # band, then read the final snapshot. The upsert's binary-search
    # key probe keeps non-overlapping files carried by reference (the
    # insert batch at +5M does not widen the rewrite set), and the
    # delete's stats prune bounds the rewrite to the low-key files —
    # both snapshots are O(files touched), verified row-exact against
    # the closed-form merge in DuckDB.
    from pero_ocr_spark.operators import sampling
    from pero_ocr_spark.sources.icetable import IceTable

    docs = _t(spark, sf_dir, "documents")
    table = IceTable(_scratch("icetable_rowops"), stats_cols=("doc_id",))
    base = docs.select("doc_id", "text", "source")
    table.commit(base.repartitionByRange(8, "doc_id"))
    r = sampling._residue(100)
    upd = docs.filter(r < 10).select(
        "doc_id", F.concat(F.lit("rev2 "), F.col("text")).alias("text"), "source"
    )
    ins = docs.filter(r == 55).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"),
        F.concat(F.lit("ins "), F.col("source")).alias("text"),
        "source",
    )
    table.upsert(upd.unionByName(ins), key="doc_id")
    table.delete_where(
        spark, "doc_id % 2 = 1 AND doc_id < 100", prune={"doc_id": (0, 99)}
    )
    return table.read(spark)


@register(
    "icetable_bloom_skipping",
    """
SELECT doc_id, text, source FROM documents
WHERE doc_id IN (7, 93, 211, 348, 499)
""",
)
def q_icetable_bloom_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Point-lookup planning from per-file Bloom filters: the table is
    # committed hash-partitioned on source (deliberately NOT clustered
    # by doc_id, so min/max stats span the whole keyspace and range
    # pruning is useless), yet each point probe plans a strict subset
    # of files from manifest arithmetic alone — the bloom's clear bit
    # proves absence, driver-side, no job. No false negatives: every
    # looked-up row must surface, verified row-exact against the plain
    # SQL lookup. The Iceberg/Parquet bloom-metrics analog.
    from pero_ocr_spark.sources.icetable import IceTable

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    table = IceTable(
        _scratch("icetable_bloom"), stats_cols=(), bloom_cols=("doc_id",)
    )
    table.commit(docs.repartition(8, "source"))
    keys = [7, 93, 211, 348, 499]
    total = len(table.files())
    # Pruning is an optimization, never a correctness gate: at rows-
    # per-file well past BLOOM_FILE_M the filter saturates and a probe
    # keeps every file — that must degrade to a full scan, not an
    # error (round-4 advice). The achieved ratio is recorded on the
    # query function (`last_pruning`) for tests/bench to inspect.
    planned_files = 0
    parts = []
    for key in keys:
        planned = table.files(point={"doc_id": key})
        planned_files += len(planned)
        parts.append(
            table.read(spark, point={"doc_id": key}).filter(
                F.col("doc_id") == key
            )
        )
    q_icetable_bloom_skipping.last_pruning = {
        "files_total": total * len(keys),
        "files_planned": planned_files,
    }
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    return union


@register(
    "icetable_wap_publish",
    """
WITH stages AS (
  SELECT 'head_during_audit' AS stage, doc_id FROM documents
  WHERE doc_id % 2 = 0
  UNION ALL
  SELECT 'after_publish', doc_id FROM documents
  UNION ALL
  SELECT 'after_failed_audit', doc_id FROM documents
)
SELECT stage,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
FROM stages GROUP BY stage
""",
)
def q_icetable_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Write-audit-publish on the snapshot table: a staged commit is
    # invisible to readers (the version pointer never moves) until its
    # audit passes; a poison batch (null texts) fails the audit and is
    # abandoned — its version slot freed, its files deleted — so the
    # published table only ever holds audited data. This is the
    # production ingestion gate for a 10^12-doc table: quality checks
    # run against real committed files via time travel, and publish is
    # one atomic pointer swap.
    from pero_ocr_spark.sources.icetable import IceTable

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    table = IceTable(_scratch("icetable_wap"), stats_cols=("doc_id",))
    table.commit(docs.filter(F.col("doc_id") % 2 == 0))
    staged = table.commit(docs.filter(F.col("doc_id") % 2 == 1), audit=True)
    head_during_audit = table.read(spark)  # pointer still on v1
    assert (
        table.read(spark, version=staged).filter("text IS NULL").count() == 0
    ), "good batch must pass audit"
    table.publish(staged)
    after_publish = table.read(spark)
    poison = docs.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.lit(None).cast("string").alias("text"),
    ).limit(10)
    bad = table.commit(poison, audit=True)
    assert (
        table.read(spark, version=bad).filter("text IS NULL").count() > 0
    ), "poison batch must fail audit"
    table.abandon(bad)
    after_failed = table.read(spark)
    parts = [
        ("head_during_audit", head_during_audit),
        ("after_publish", after_publish),
        ("after_failed_audit", after_failed),
    ]
    union = parts[0][1].select(F.lit(parts[0][0]).alias("stage"), "doc_id")
    for tag, df in parts[1:]:
        union = union.unionByName(df.select(F.lit(tag).alias("stage"), "doc_id"))
    return union.groupBy("stage").agg(
        F.count("*").alias("n_rows"),
        F.sum("doc_id").alias("sum_doc_id"),
    )


@register(
    "icetable_mor_deletes",
    """
WITH survivors AS (
  SELECT doc_id, text FROM documents
  WHERE NOT (doc_id % 10 IN (3, 7))
    AND NOT (source = 'src1' AND doc_id % 10 = 4)),
stages AS (
  SELECT 'pre_delete' AS stage, doc_id, text FROM documents
  UNION ALL SELECT 'post_mor', doc_id, text FROM survivors
  UNION ALL SELECT 'post_compact', doc_id, text FROM survivors
)
SELECT stage,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(length(text)) AS BIGINT) AS sum_text_len
FROM stages GROUP BY stage
""",
)
def q_icetable_mor_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Merge-on-read DELETE on the snapshot table (Iceberg spec-v2
    # positional deletes): two sparse deletes publish position-delete
    # files only — pytest-asserted here that NO data file is rewritten
    # — reads anti-join the (broadcast-sized, known from manifest
    # arithmetic) delete set, and compaction folds the deletes into
    # clean files. This is the only delete shape that works at 100 TB:
    # copy-on-write rewrites every file containing one matching row;
    # MOR writes bytes proportional to the matches. Three read paths
    # verified row-exact: time travel to pre-delete, post-delete
    # (anti-join active), post-compaction (anti-join folded away).
    from pero_ocr_spark.sources.icetable import IceTable

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    table = IceTable(_scratch("icetable_mor"), stats_cols=("doc_id",))
    table.commit(docs.repartitionByRange(8, "doc_id"))
    files_v1 = set(table.files(1))
    table.delete_where_mor(spark, "doc_id % 10 IN (3, 7)")
    table.delete_where_mor(spark, "source = 'src1' AND doc_id % 10 = 4")
    assert set(table.files()) == files_v1, "MOR delete must not rewrite data"
    v_mor = table.current_version()
    assert table.delete_files(v_mor), "expected pending position deletes"
    v_compact = table.compact(spark, target_files=4)
    assert table.delete_files(v_compact) == [], "compaction must fold deletes"
    reads = [
        ("pre_delete", table.read(spark, version=1)),
        ("post_mor", table.read(spark, version=v_mor)),
        ("post_compact", table.read(spark, version=v_compact)),
    ]
    parts = [
        df.select(F.lit(tag).alias("stage"), "doc_id", "text")
        for tag, df in reads
    ]
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    return union.groupBy("stage").agg(
        F.count("*").alias("n_rows"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.sum(F.length("text")).alias("sum_text_len"),
    )


_ZORDER_ORACLE = """
WITH dims AS (
  SELECT user_id % 256 AS zx,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) % 256 AS zy
  FROM events),
keyed AS (
  SELECT zx, zy, {zsql} AS zkey,
         zx BETWEEN 32 AND 47 AND zy BETWEEN 64 AND 95 AS hit
  FROM dims),
assigned AS (
  SELECT *,
         CAST(floor(zkey * 64 / 65536) AS BIGINT) AS file_z,
         CAST(floor(zx * 64 / 256) AS BIGINT) AS file_lin
  FROM keyed),
stats AS (
  SELECT 'zorder' AS layout, file_z AS file_id,
         min(zx) AS min_x, max(zx) AS max_x,
         min(zy) AS min_y, max(zy) AS max_y,
         count(*) AS rows_, sum(CASE WHEN hit THEN 1 ELSE 0 END) AS hits
  FROM assigned GROUP BY file_z
  UNION ALL
  SELECT 'linear', file_lin,
         min(zx), max(zx), min(zy), max(zy),
         count(*), sum(CASE WHEN hit THEN 1 ELSE 0 END)
  FROM assigned GROUP BY file_lin)
SELECT layout,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(CASE WHEN min_x <= 47 AND max_x >= 32
                      AND min_y <= 95 AND max_y >= 64
                THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
       CAST(sum(CASE WHEN min_x <= 47 AND max_x >= 32
                      AND min_y <= 95 AND max_y >= 64
                THEN rows_ ELSE 0 END) AS BIGINT) AS rows_scanned,
       CAST(sum(hits) AS BIGINT) AS rows_matching
FROM stats GROUP BY layout
"""


@register(
    "corpus_zorder_skipping",
    None,  # interpolated below after zorder import
)
def q_corpus_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Z-order (Morton) clustering vs linear sort for two-dimensional
    # file skipping: events bucketized to (user % 256, hour % 256),
    # files simulated as fixed-width key ranges (the write-side
    # equivalent is repartitionByRange on the Morton key), per-file
    # min/max stats evaluated against a rectangular (user-block ×
    # time-window) predicate — exactly the pruning arithmetic
    # IceTable.files() applies from its manifest. The key is a pure
    # bitwise codegen expression, the report two map-side-combinable
    # aggs; identical integer arithmetic runs in DuckDB. The pytest
    # drives the REAL table path: an IceTable committed z-clustered
    # prunes both dims from stats alone.
    from pero_ocr_spark.operators import zorder

    ev = _t(spark, sf_dir, "events")
    return zorder.skipping_report(
        ev,
        x=F.col("user_id") % 256,
        y=F.floor(F.unix_timestamp("ts") / 3600).cast("long") % 256,
        box=(32, 47, 64, 95),
        bits=8,
        n_files=64,
    )


def _finalize_zorder_oracle() -> None:
    from pero_ocr_spark.operators import zorder

    fn, _ = _REGISTRY["corpus_zorder_skipping"]
    _REGISTRY["corpus_zorder_skipping"] = (
        fn,
        _ZORDER_ORACLE.format(zsql=zorder.zorder_sql("zx", "zy", 8)),
    )


_finalize_zorder_oracle()


@register(
    "web_anchor_text",
    """
WITH d AS (
  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
e AS (
  SELECT d.doc_id AS src, d.source,
         (d.doc_id * 7 + t.j * 13 + 1) % n.n_docs AS dst,
         array_to_string(list_slice(d.w, 2 * t.j + 1, 2 * t.j + 2), ' ')
           AS anchor
  FROM d, n, generate_series(0, 3) t(j)
  WHERE t.j <= d.doc_id % 3 + 1)
SELECT dst AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_anchors,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_src_hosts,
       MIN(anchor) AS top_anchor
FROM e
WHERE src <> dst
GROUP BY dst
""",
)
def q_web_anchor_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    # off-page signal: aggregate what linking pages say about each
    # target. Anchor text is derived inside the source row (no
    # edges-to-docs join), one explode + one map-side-combinable
    # shuffle on dst — in-degree skew ships partial aggregates only.
    from pero_ocr_spark.operators import linkgraph

    docs = _t(spark, sf_dir, "documents")
    return linkgraph.anchor_text_corpus(docs, n_docs=docs.count())


@register(
    "crawl_frontier_schedule",
    """
WITH f AS (
  SELECT doc_id, source || '.example.com' AS host,
         CAST((doc_id*69069 + 12345) % 2147483647 % 100 AS INT) AS priority,
         1 + CAST(substr(source, 4) AS INT) % 5 AS delay
  FROM documents)
SELECT doc_id, host, priority,
       CAST(row_number() OVER (
              PARTITION BY host ORDER BY priority DESC, doc_id) - 1
            AS BIGINT) AS slot,
       CAST((row_number() OVER (
              PARTITION BY host ORDER BY priority DESC, doc_id) - 1) * delay
            AS BIGINT) AS fetch_at
FROM f
""",
)
def q_crawl_frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    # politeness-aware crawl scheduling: priority-ranked FIFO slots
    # within each host (robots crawl-delay serialization), fully
    # parallel across hosts — one host shuffle, window = the schedule
    from pero_ocr_spark.operators import linkgraph, sampling

    docs = _t(spark, sf_dir, "documents")
    frontier = docs.select(
        "doc_id",
        F.concat(F.col("source"), F.lit(".example.com")).alias("host"),
        sampling._residue(100).cast("int").alias("priority"),
        (1 + F.substring("source", 4, 10).cast("int") % 5)
        .cast("int")
        .alias("crawl_delay"),
    )
    return linkgraph.frontier_schedule(frontier)


@register(
    "text_tfidf_keywords",
    """
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM t WHERE term <> '' GROUP BY doc_id, term),
n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
s AS (
  SELECT tf.doc_id, tf.term, tf.tf, CAST(dft.df AS BIGINT) AS df,
         round(tf.tf * ln((n.n + 1.0) / (dft.df + 1.0)), 6) AS score
  FROM tf JOIN dft USING (term) CROSS JOIN n)
SELECT doc_id, CAST(rank AS INT) AS rank, term, tf, df, score
FROM (
  SELECT *, row_number() OVER (
           PARTITION BY doc_id ORDER BY score DESC, term) AS rank
  FROM s)
WHERE rank <= 5
""",
)
def q_text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    # corpus-relative term salience: tf map-side on (doc, term), df on
    # the vocabulary table (broadcast back), per-doc top-5 by rounded
    # score with lexical tiebreak
    from pero_ocr_spark.operators import textstats

    return textstats.tfidf_keywords(_t(spark, sf_dir, "documents"), top_k=5)


@register(
    "text_bm25_search",
    """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tok AS (SELECT doc_id, len(ws) * 1.0 AS dl, unnest(ws) AS term FROM w),
hits AS (
  SELECT doc_id, term, count(*) * 1.0 AS tf, any_value(dl) AS dl
  FROM tok WHERE term IN ('spark', 'window', 'merge')
  GROUP BY doc_id, term),
stats AS (SELECT count(*) * 1.0 AS n, avg(len(ws)) AS avgdl FROM w),
dft AS (SELECT term, count(*) * 1.0 AS df FROM hits GROUP BY term),
s AS (
  SELECT h.doc_id,
         ln(1 + (st.n - d.df + 0.5) / (d.df + 0.5)) * h.tf * (1.2 + 1)
           / (h.tf + 1.2 * (1 - 0.75 + 0.75 * h.dl / st.avgdl)) AS c
  FROM hits h JOIN dft d USING (term) CROSS JOIN stats st),
agg AS (
  SELECT doc_id, round(sum(c), 6) AS score,
         CAST(count(*) AS BIGINT) AS n_terms_hit
  FROM s GROUP BY doc_id)
SELECT doc_id, n_terms_hit, score FROM agg
ORDER BY score DESC, doc_id LIMIT 50
""",
)
def q_text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Okapi BM25 top-50: the corpus explode collapses to query-term
    # hits at the scan (filter before any shuffle), avgdl is a one-row
    # broadcast, the cut sorts on the rounded score for a
    # deterministic engine-portable boundary
    from pero_ocr_spark.operators import textstats

    return textstats.bm25_search(
        _t(spark, sf_dir, "documents"), ["spark", "window", "merge"], top_k=50
    )


@register(
    "icetable_schema_evolution",
    """
SELECT doc_id, text,
       CASE WHEN doc_id % 2 = 1 THEN lang END AS lang
FROM documents
""",
)
def q_icetable_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # add-column schema evolution on the snapshot table: v1 commits
    # two columns, v2 appends three; the current read projects every
    # file through the LATEST snapshot schema so pre-evolution rows
    # surface the new column as null — no rewrite of old data files
    from pero_ocr_spark.sources.icetable import IceTable

    docs = _t(spark, sf_dir, "documents")
    table = IceTable(_scratch("icetable_evolve"), stats_cols=("doc_id",))
    table.commit(
        docs.filter(F.col("doc_id") % 2 == 0)
        .select("doc_id", "text")
        .repartitionByRange(4, "doc_id")
    )
    table.commit(
        docs.filter(F.col("doc_id") % 2 == 1)
        .select("doc_id", "text", "lang")
        .repartitionByRange(4, "doc_id")
    )
    return table.read(spark)


@register(
    "crawl_snapshot_diff",
    """
WITH r AS (
  SELECT doc_id, text, source,
         (doc_id*69069 + 12345) % 2147483647 % 20 AS r20
  FROM documents),
o AS (
  SELECT 'https://' || source || '.example.com/doc/' || doc_id AS url,
         text
  FROM r),
n AS (
  SELECT 'https://' || source || '.example.com/doc/' || doc_id AS url,
         CASE WHEN r20 = 0 THEN 'v2 ' || text ELSE text END AS text
  FROM r WHERE r20 <> 1
  UNION ALL
  SELECT 'https://' || source || '.example.com/doc/' || (doc_id + 7000000),
         'new ' || source
  FROM r WHERE r20 = 2),
j AS (
  SELECT coalesce(o.url, n.url) AS url, o.text AS ot, n.text AS nt
  FROM o FULL OUTER JOIN n ON o.url = n.url)
SELECT url,
       CASE WHEN ot IS NULL THEN 'added'
            WHEN nt IS NULL THEN 'removed'
            WHEN ot <> nt THEN 'changed'
            ELSE 'unchanged' END AS status
FROM j
""",
)
def q_crawl_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # recrawl delta: full-outer on url comparing sha-256 content
    # digests (only (url, digest) pairs shuffle; nothing broadcasts —
    # both snapshots are corpus-sized). The synthetic new snapshot
    # changes 1/20 of pages, drops 1/20, adds 1/20 at fresh URLs.
    from pero_ocr_spark.operators import linkgraph, sampling

    docs = _t(spark, sf_dir, "documents")
    r20 = sampling._residue(20)
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
        F.col("doc_id").cast("string"),
    )
    old = docs.select(url.alias("url"), F.sha2(F.col("text"), 256).alias("h"))
    changed = docs.filter(r20 != 1).select(
        url.alias("url"),
        F.sha2(
            F.when(r20 == 0, F.concat(F.lit("v2 "), F.col("text")))
            .otherwise(F.col("text")),
            256,
        ).alias("h"),
    )
    added = docs.filter(r20 == 2).select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
            (F.col("doc_id") + 7_000_000).cast("string"),
        ).alias("url"),
        F.sha2(F.concat(F.lit("new "), F.col("source")), 256).alias("h"),
    )
    return linkgraph.snapshot_diff(
        old, changed.unionByName(added), key="url", cmp_col="h"
    )


@register(
    "html_outlinks",
    f"""
WITH {_HTML_PARA_CTE},
raw AS (
  SELECT k.doc_id, 0 AS grp, 0 AS sub, '/' AS href, 'home' AS anchor FROM k
  UNION ALL
  SELECT doc_id, 0, 1, '/about', 'about' FROM k
  UNION ALL
  SELECT doc_id, 0, 2, '/c', 'contact' FROM k
  UNION ALL
  SELECT doc_id, 1, pi, '#r',
         array_to_string(list_slice(ws, pi*12+1, pi*12+2), ' ')
  FROM par0 JOIN par USING (doc_id, pi)
  WHERE pi % 3 = 2 AND nw = 12
  UNION ALL
  SELECT doc_id, 2, 0, '/ad1', 'buy now' FROM k
  UNION ALL
  SELECT doc_id, 2, 1, '/ad2', 'subscribe today' FROM k
  UNION ALL
  SELECT doc_id, 3, 0, '/tos', 'terms' FROM k
  UNION ALL
  SELECT doc_id, 3, 1, '/priv', 'privacy' FROM k
),
numbered AS (
  SELECT r.doc_id, d.source || '.example.com' AS host, href, anchor,
         CAST(row_number() OVER (
                PARTITION BY r.doc_id ORDER BY grp, sub) - 1 AS INT)
           AS link_id
  FROM raw r JOIN documents d ON r.doc_id = d.doc_id)
SELECT doc_id, link_id, href, anchor,
       CASE WHEN href LIKE '#%'
              THEN 'https://' || host || '/doc/' || doc_id || href
            WHEN href LIKE '/%'
              THEN 'https://' || host || href
            ELSE 'https://' || host || '/' || href END AS url
FROM numbered
""",
)
def q_html_outlinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # outlink harvesting from real markup: one parser walk per page
    # (same Arrow stage family as block parse), hrefs resolved against
    # the page URL with a pure codegen expression — the link-graph
    # feeder (PageRank / anchor aggregation) for DOM-born edges
    from pero_ocr_spark.operators import html as H

    docs = _t(spark, sf_dir, "documents")
    pages = H.synthesize_html(docs, keep=("source",))
    links = H.parse_html_outlinks(pages, carry=("source",))
    host = F.concat(F.col("source"), F.lit(".example.com"))
    base = F.concat(
        F.lit("https://"), host, F.lit("/doc/"), F.col("doc_id").cast("string")
    )
    return links.select(
        "doc_id",
        "link_id",
        "href",
        "anchor",
        H.resolve_href(F.col("href"), host, base).alias("url"),
    )


@register(
    "html_densitometric_classify",
    f"""
WITH {_HTML_PARA_CTE},
blocks AS (
  SELECT w.doc_id, 0 AS block_id, 3 AS nw, 3 AS lw FROM w
  UNION ALL SELECT doc_id, 1, 2, 0 FROM k
  UNION ALL
  SELECT doc_id, 2 + pi, nw,
         CASE WHEN pi % 3 = 2 AND nw = 12 THEN 2 ELSE 0 END
  FROM par
  UNION ALL SELECT doc_id, 2 + np, 4, 4 FROM k
  UNION ALL SELECT doc_id, 3 + np, 3, 2 FROM k
),
f AS (
  SELECT doc_id, block_id, nw,
         lw * 1.0 / greatest(nw, 1) AS ld,
         coalesce(lag(nw) OVER wd, 0) AS pw,
         coalesce(lead(nw) OVER wd, 0) AS nx,
         coalesce(lag(lw * 1.0 / greatest(nw, 1)) OVER wd, 0.0) AS pld
  FROM blocks
  WINDOW wd AS (PARTITION BY doc_id ORDER BY block_id)
)
SELECT doc_id, CAST(block_id AS INT) AS block_id,
       CASE WHEN ld <= 0.333333 THEN
         CASE WHEN pld <= 0.555556 THEN
           CASE WHEN nw > 16 OR nx > 15 OR pw > 4
                THEN 'content' ELSE 'boilerplate' END
         ELSE
           CASE WHEN nw > 40 OR nx > 17
                THEN 'content' ELSE 'boilerplate' END
         END
       ELSE 'boilerplate' END AS cls
FROM f
""",
)
def q_html_densitometric_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the second published extractor family: Boilerpipe's shallow-text
    # decision tree ((prev, curr, next) word counts + link densities),
    # pure Catalyst windows on the same exchange as the jusText
    # classifier — extractor diversity for ensemble/agreement curation
    from pero_ocr_spark.operators import html as H

    docs = _t(spark, sf_dir, "documents")
    blocks = H.parse_html_blocks(H.synthesize_html(docs))
    return H.classify_blocks_densitometric(blocks).select(
        "doc_id", "block_id", "cls"
    )


@register(
    "corpus_rollup_stats",
    """
SELECT coalesce(source, 'ALL') AS source,
       coalesce(lang, 'ALL') AS lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens
FROM documents
GROUP BY ROLLUP (source, lang)
""",
)
def q_corpus_rollup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # corpus reporting cube: per-(source, lang) doc/char/token totals
    # with ROLLUP subtotals and grand total in ONE pass — Catalyst
    # expands grouping sets map-side, so the shuffle still carries
    # partial aggregates only (no per-level rescan)
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            "source", "lang", "n_chars",
            F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        )
        .rollup("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
        )
        .select(
            F.coalesce(F.col("source"), F.lit("ALL")).alias("source"),
            F.coalesce(F.col("lang"), F.lit("ALL")).alias("lang"),
            "n_docs", "sum_chars", "sum_tokens",
        )
    )


@register(
    "html_ensemble_extract",
    f"""
WITH {_HTML_PARA_CTE},
blocks AS (
  SELECT w.doc_id, d.source AS host, 0 AS bk, 'nav' AS tag,
         'home about contact' AS text, 3 AS nw, 3 AS lw, 'bad' AS jt
  FROM w JOIN documents d USING (doc_id)
  UNION ALL
  SELECT k.doc_id, d.source, 1, 'h1', d.source || ' report', 2, 0,
         CASE WHEN k.nw0 >= 8 THEN 'good' ELSE 'bad' END
  FROM k JOIN documents d USING (doc_id)
  UNION ALL
  SELECT p.doc_id, d.source, 2 + p.pi, 'p', p.ptext, p.nw,
         CASE WHEN p.pi % 3 = 2 AND p.nw = 12 THEN 2 ELSE 0 END,
         CASE WHEN p.nw >= 8 OR p.pi > 0 THEN 'good' ELSE 'bad' END
  FROM par p JOIN documents d USING (doc_id)
  UNION ALL
  SELECT k.doc_id, d.source, 2 + k.np, 'aside',
         'buy now subscribe today', 4, 4, 'bad'
  FROM k JOIN documents d USING (doc_id)
  UNION ALL
  SELECT k.doc_id, d.source, 3 + k.np, 'footer',
         'terms privacy copyright', 3, 2, 'bad'
  FROM k JOIN documents d USING (doc_id)
),
f AS (
  SELECT doc_id, host, bk, tag, text, nw, jt,
         lw * 1.0 / greatest(nw, 1) AS ld,
         coalesce(lag(nw) OVER wd, 0) AS pw,
         coalesce(lead(nw) OVER wd, 0) AS nx,
         coalesce(lag(lw * 1.0 / greatest(nw, 1)) OVER wd, 0.0) AS pld
  FROM blocks
  WINDOW wd AS (PARTITION BY doc_id ORDER BY bk)
),
dens AS (
  SELECT *,
         CASE WHEN ld <= 0.333333 THEN
           CASE WHEN pld <= 0.555556 THEN
             CASE WHEN nw > 16 OR nx > 15 OR pw > 4 THEN 1 ELSE 0 END
           ELSE
             CASE WHEN nw > 40 OR nx > 17 THEN 1 ELSE 0 END
           END
         ELSE 0 END AS v_dens
  FROM f
),
hd AS (
  SELECT host, count(DISTINCT doc_id) AS host_docs FROM blocks GROUP BY host),
tpl AS (
  SELECT b.host, b.tag, b.text
  FROM blocks b JOIN hd USING (host)
  GROUP BY b.host, b.tag, b.text, hd.host_docs
  HAVING count(DISTINCT doc_id) >= 2
     AND count(DISTINCT doc_id) >= hd.host_docs * 0.5
),
voted AS (
  SELECT d.doc_id, d.bk, d.text,
         t.text IS NULL AND (d.jt = 'good' OR d.v_dens = 1) AS keep
  FROM dens d LEFT JOIN tpl t
    ON d.host = t.host AND d.tag = t.tag AND d.text = t.text
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY bk) - 1
            AS BIGINT) AS ord,
       'text' AS kind, text, CAST(NULL AS VARCHAR) AS media_ref
FROM voted WHERE keep
""",
)
def q_html_ensemble_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # three-signal ensemble from ONE parser pass: inter-page template
    # frequency VETOES (the per-page classifiers are correlated and
    # would jointly re-admit long link-free chrome), then jusText OR
    # densitometric keeps; windows share one exchange, the template
    # table broadcasts
    from pero_ocr_spark.operators import html as H

    docs = _t(spark, sf_dir, "documents")
    pages = H.synthesize_html(docs, keep=("source",))
    return H.ensemble_extract(pages, host_col="source")


@register(
    "events_asof_join",
    """
WITH c AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = 'purchase'),
v AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view')
SELECT c.event_id, c.user_id, c.value,
       v.event_id AS view_event_id,
       CAST(date_diff('microsecond', v.ts, c.ts) AS BIGINT) AS lag_us
FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND v.ts <= c.ts
""",
)
def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the canonical time-series join Spark lacks natively: each
    # purchase matched to the user's latest at-or-before view via the
    # union-window technique (ONE key shuffle + per-key sort; no
    # inequality theta-join, no pair-space blowup). Oracle = DuckDB's
    # native ASOF LEFT JOIN.
    from pero_ocr_spark.operators import timeseries

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    j = timeseries.asof_join(
        purchases, views, on="user_id", time="ts", right_cols=("event_id",)
    )
    return j.select(
        "event_id",
        "user_id",
        "value",
        F.col("event_id_asof").alias("view_event_id"),
        # ts is TIMESTAMP_NTZ; cast is value-preserving under the
        # pinned UTC session and unix_micros requires TIMESTAMP
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("ts_asof").cast("timestamp"))
        )
        .cast("long")
        .alias("lag_us"),
    )


@register(
    "events_range_join",
    """
WITH c AS (
  SELECT event_id AS click_event_id, user_id, ts FROM events
  WHERE event_type = 'click'),
s AS (
  SELECT event_id AS signup_event_id, user_id, ts FROM events
  WHERE event_type = 'signup')
SELECT c.click_event_id, s.signup_event_id
FROM c JOIN s
  ON c.user_id = s.user_id
 AND c.ts >= s.ts AND c.ts < s.ts + INTERVAL 1 HOUR
""",
)
def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # interval-containment join (clicks within 1h after a same-user
    # signup) WITHOUT the nested-loop plan Spark gives inequality
    # joins: intervals replicate to the <=2 hour-buckets they overlap,
    # points map to exactly one bucket, equi-join on (key, bucket) +
    # exact predicate — the range-join-hint formulation, from scratch
    from pero_ocr_spark.operators import timeseries

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_event_id"), "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("signup_event_id"),
        "ts",
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end_ts"),
    )
    return timeseries.range_join(
        clicks,
        signups,
        on="user_id",
        time="ts",
        start="ts",
        end="end_ts",
        point_cols=("click_event_id",),
        interval_cols=("signup_event_id",),
    )


# ---------------------------------------------------------------------------
# round-4 finale: information-density filtering, DSIR importance
# resampling, and distributed BPE tokenizer training
# ---------------------------------------------------------------------------


def _bpe_oracle_ctes(n_merges: int = 4) -> str:
    """Unrolled DuckDB CTE chain mirroring operators/bpe.train_bpe:
    word-frequency table → k iterations of (pair count → deterministic
    argmax → literal replace application). ``e{k}`` is the final
    encoding table."""
    parts = [
        """
WITH wct AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY 1),
e0 AS (
  SELECT word, freq,
         '<' || array_to_string(string_split(word, ''), '><') || '>' AS enc
  FROM wct)"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f""",
s{i} AS (
  SELECT freq,
         string_split(regexp_replace(enc, '^<|>$', '', 'g'), '><') AS syms
  FROM e{i - 1}),
p{i} AS (
  SELECT pair, sum(freq) AS cnt FROM (
    SELECT freq,
           unnest(list_transform(generate_series(1, len(syms) - 1),
                  j -> syms[j] || '|' || syms[j + 1])) AS pair
    FROM s{i} WHERE len(syms) >= 2)
  GROUP BY 1),
b{i} AS (
  SELECT string_split(pair, '|')[1] AS l,
         string_split(pair, '|')[2] AS r, cnt
  FROM p{i} ORDER BY cnt DESC, pair ASC LIMIT 1),
e{i} AS (
  SELECT word, freq,
         replace(enc, '<' || l || '><' || r || '>',
                 '<' || l || r || '>') AS enc
  FROM e{i - 1} CROSS JOIN b{i})"""
        )
    return "".join(parts)


@register(
    "text_char_entropy",
    """
WITH c AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, length(text)),
                i -> substr(text, i, 1))) AS ch
  FROM documents),
k AS (SELECT doc_id, ch, CAST(count(*) AS DOUBLE) AS k
      FROM c GROUP BY 1, 2),
t AS (SELECT doc_id, sum(k) AS n FROM k GROUP BY 1),
e AS (SELECT k.doc_id,
             round(-sum((k / n) * log2(k / n)), 6) AS char_entropy
      FROM k JOIN t USING (doc_id) GROUP BY 1)
SELECT doc_id, char_entropy, char_entropy >= 3.0 AS keep FROM e
""",
)
def q_text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # character-level Shannon entropy as an information-density
    # quality gate — computed in-row (sorted-array run-length fold,
    # zero shuffles), the compression-ratio-filter analog
    from pero_ocr_spark.operators import textstats

    return textstats.char_entropy(_t(spark, sf_dir, "documents"))


@register(
    "sample_dsir_importance",
    f"""
WITH w AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS word
  FROM documents),
b AS (
  SELECT doc_id, source,
         {_DUCK_POLY.format(col="word")} % 64 AS b
  FROM w WHERE word <> ''),
t AS (SELECT b, CAST(count(*) AS DOUBLE) AS ct FROM b
      WHERE source = 'src0' GROUP BY 1),
r AS (SELECT b, CAST(count(*) AS DOUBLE) AS cr FROM b GROUP BY 1),
tt AS (SELECT sum(ct) AS tt FROM t),
tr AS (SELECT sum(cr) AS tr FROM r),
s AS (
  SELECT doc_id,
         round(avg(ln((coalesce(ct, 0) + 1) / (tt + 64))
                   - ln((cr + 1) / (tr + 64))), 6) AS avg_logratio
  FROM b LEFT JOIN t USING (b) JOIN r USING (b)
  CROSS JOIN tt CROSS JOIN tr
  GROUP BY 1)
SELECT doc_id, avg_logratio, avg_logratio > 0 AS keep FROM s
""",
)
def q_sample_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DSIR importance resampling: hashed-unigram target/raw
    # log-likelihood ratio; distributions are two <=64-row broadcast
    # aggs, the only corpus shuffle is the per-doc mean
    from pero_ocr_spark.operators import sampling

    return sampling.sample_dsir(_t(spark, sf_dir, "documents"))


@register(
    "vocab_bpe_train",
    _bpe_oracle_ctes(4)
    + """
SELECT * FROM (
  SELECT CAST(1 AS INT) AS merge_rank, l AS left_sym, r AS right_sym,
         l || r AS merged, CAST(cnt AS BIGINT) AS pair_count FROM b1
  UNION ALL
  SELECT CAST(2 AS INT), l, r, l || r, CAST(cnt AS BIGINT) FROM b2
  UNION ALL
  SELECT CAST(3 AS INT), l, r, l || r, CAST(cnt AS BIGINT) FROM b3
  UNION ALL
  SELECT CAST(4 AS INT), l, r, l || r, CAST(cnt AS BIGINT) FROM b4)
""",
)
def q_vocab_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    # distributed BPE merge learning: one corpus-wide word count, then
    # vocabulary-sized pair aggs + one-row argmax collects per merge
    # (broadcast-codebook pattern); ties break on the pair string so
    # training is deterministic and DuckDB-reproducible
    from pero_ocr_spark.operators import bpe

    merges, _vocab = bpe.train_bpe(_t(spark, sf_dir, "documents"), 4)
    return merges


@register(
    "training_bpe_subword_counts",
    _bpe_oracle_ctes(4)
    + """,
wd AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
wsub AS (
  SELECT word,
         len(string_split(regexp_replace(enc, '^<|>$', '', 'g'),
             '><')) AS nsub
  FROM e4)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(nsub) AS BIGINT) AS n_subwords
FROM wd JOIN wsub USING (word) WHERE word <> '' GROUP BY 1
""",
)
def q_training_bpe_subword_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # tokenizer application: the trained word→encoding table broadcasts
    # onto the exploded word stream; per-doc re-agg is the only
    # exchange (map-side combined)
    from pero_ocr_spark.operators import bpe

    docs = _t(spark, sf_dir, "documents")
    _merges, vocab = bpe.train_bpe(docs, 4)
    return bpe.subword_counts(docs, vocab)


@register(
    "icetable_stream_ingest",
    f"""
WITH {_HTML_PARA_CTE},
kept AS (
  SELECT k.doc_id, -1 AS bk, 'text' AS kind,
         d.source || ' report' AS text, NULL AS media_ref
  FROM k JOIN documents d USING (doc_id) WHERE k.nw0 >= 8
  UNION ALL
  SELECT doc_id, pi*2, 'text', ptext, NULL
  FROM par WHERE nw >= 8 OR pi > 0
  UNION ALL
  SELECT doc_id, pi*2 + 1, 'media', NULL,
         'img://' || doc_id || '/' || pi
  FROM par WHERE pi % 2 = 1
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY bk) - 1
            AS BIGINT) AS ord,
       kind, text, media_ref
FROM kept
""",
)
def q_icetable_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # streaming → snapshot-table TRANSACTIONAL sink, externally
    # verified: HTML pages ingest through availableNow micro-batches,
    # each one atomic tagged APPEND commit (replays skip via the
    # commit log, crash-mid-commit leaves no snapshot); the TABLE
    # read-back must equal the batch pipeline's closed form however
    # the engine slices the input into micro-batches.
    import os

    from pero_ocr_spark.operators import html as H
    from pero_ocr_spark.sources.icetable import IceTable
    from pero_ocr_spark.streaming import ingest

    root = _scratch("icetable_stream")
    pages_dir, table_root, ckpt = (
        os.path.join(root, d) for d in ("pages", "table", "ckpt")
    )
    docs = _t(spark, sf_dir, "documents")
    H.synthesize_html_interleaved(docs).coalesce(4).write.mode(
        "overwrite"
    ).parquet(pages_dir)
    q = ingest.stream_ingest_pages_icetable(spark, pages_dir, table_root, ckpt)
    q.awaitTermination(300)
    return (
        IceTable(table_root)
        .read(spark)
        .select("doc_id", "ord", "kind", "text", "media_ref")
    )


@register(
    "icetable_incremental_agg",
    """
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY source
""",
)
def q_icetable_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # incremental materialized-view maintenance over the snapshot
    # table's changelog (the Iceberg-CDC consumption pattern): the
    # per-source rollup is seeded from snapshot v1, the v1→v2 delta
    # comes from the changelog read — ONLY v2's files are scanned,
    # never the table — and partial aggregates merge by summation.
    # The merged view must equal the full recompute (the oracle);
    # at 10^12 docs the delta is the day's crawl, not the corpus.
    from pero_ocr_spark.sources.icetable import IceTable

    root = _scratch("ice_increment")
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    table = IceTable(root)
    v1 = table.commit(docs.filter(F.col("doc_id") % 2 == 0), "append")
    base = table.read(spark, v1).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    v2 = table.commit(docs.filter(F.col("doc_id") % 2 == 1), "append")
    delta = table.incremental(spark, v1, v2).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    return (
        base.unionByName(delta)
        .groupBy("source")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("total_chars").cast("long").alias("total_chars"),
        )
    )


@register(
    "sample_epoch_mixing",
    """
WITH d AS (
  SELECT doc_id, source, CAST(substr(source, 4) AS BIGINT) AS sid,
         (doc_id * 69069 + 12345) % 2147483647 % 1000 AS res
  FROM documents),
w AS (SELECT *, 0.25 + (sid * 7 % 10) / 4.0 AS wt FROM d),
c AS (SELECT doc_id, source,
             CAST(floor(wt) + CASE WHEN res < (wt - floor(wt)) * 1000
                                   THEN 1 ELSE 0 END AS INT) AS n_copies
      FROM w)
SELECT doc_id, source,
       CAST(unnest(generate_series(1, n_copies)) AS INT) AS epoch,
       n_copies
FROM c WHERE n_copies > 0
""",
)
def q_sample_epoch_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    # epoch-weighted training mixture: per-source repetition factors
    # (fractional part = deterministic LCG-residue keep), zero-shuffle
    # in-row replication via a bounded explode
    from pero_ocr_spark.operators import sampling

    return sampling.sample_epoch_mixing(_t(spark, sf_dir, "documents"))


@register(
    "dedup_cdc_chunks",
    """
WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
c AS (
  SELECT doc_id, text,
         list_concat(list_concat([0],
           list_filter(generate_series(8, n),
             i -> i < n AND
                  list_reduce(list_prepend(0::BIGINT,
                    list_transform(string_split(substr(text, i - 7, 8), ''),
                                   ch -> ascii(ch)::BIGINT)),
                    (a, b) -> (a * 31 + b) % 2147483647) % 32 = 0)),
           [n]) AS bounds
  FROM d),
ch AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(bounds) - 1),
                j -> substr(text, bounds[j] + 1,
                            bounds[j + 1] - bounds[j]))) AS chunk
  FROM c),
h AS (
  SELECT doc_id, length(chunk) AS clen,
         list_reduce(list_prepend(0::BIGINT,
           list_transform(string_split(chunk, ''),
                          ch2 -> ascii(ch2)::BIGINT)),
           (a, b) -> (a * 31 + b) % 2147483647) AS chash
  FROM ch),
f AS (
  SELECT *,
         min(doc_id) OVER (PARTITION BY chash)
           <> max(doc_id) OVER (PARTITION BY chash) AS dup
  FROM h)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       round(sum(CASE WHEN dup THEN clen ELSE 0 END) * 1.0 / sum(clen), 6)
         AS dup_char_frac
FROM f GROUP BY 1
""",
)
def q_dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # content-defined chunking: boundaries from a rolling k-char hash
    # move WITH the content, so early edits don't shift downstream
    # dedup hits (the property fixed-stride passage windows lack);
    # chunking/hashing fully in-row, two fixed-width shuffles
    from pero_ocr_spark.operators import dedup

    return dedup.cdc_chunk_dedup(_t(spark, sf_dir, "documents"))


@register(
    "media_duplicate_groups",
    _EXTRACTED_CTE
    + """,
m AS (
  SELECT doc_id, media_ref,
         list_sum(list_transform(string_split(media_ref, ''),
                  c -> ascii(c))) % 997 AS seed
  FROM extracted WHERE kind = 'media')
SELECT min(media_ref) AS rep_ref,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM m GROUP BY seed
""",
)
def q_media_duplicate_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    # image dedup over encoder outputs: identical feature vectors
    # collapse to one group (signature = rounded components — works
    # unchanged under a real encoder). The oracle reproduces the
    # stub encoder's seed arithmetic: equal seed <=> equal vector
    # (integer seeds can never differ by a multiple of 2*pi, and the
    # nearest misses differ by >=0.018 rad >> the 4dp signature).
    from pero_ocr_spark.operators import media

    return media.media_duplicate_groups(
        media.media_features(_decoded_media(spark, sf_dir))
    )


@register(
    "sketch_hll_shingles",
    """
WITH toks AS (
  SELECT source, string_split(text, ' ') AS ws FROM documents),
sh AS (
  SELECT source, unnest(list_transform(
      generate_series(1, len(ws) - 4),
      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
           || ws[i+3] || ' ' || ws[i+4])) AS shingle
  FROM toks WHERE len(ws) >= 4),
hx AS (SELECT source, sha256(shingle) AS h FROM sh),
nib AS (
  SELECT source,
    ((CASE WHEN ascii(substr(h,1,1)) >= 97
           THEN ascii(substr(h,1,1)) - 87 ELSE ascii(substr(h,1,1)) - 48 END) * 256
   + (CASE WHEN ascii(substr(h,2,1)) >= 97
           THEN ascii(substr(h,2,1)) - 87 ELSE ascii(substr(h,2,1)) - 48 END) * 16
   + (CASE WHEN ascii(substr(h,3,1)) >= 97
           THEN ascii(substr(h,3,1)) - 87 ELSE ascii(substr(h,3,1)) - 48 END)
    ) % 1024 AS idx,
    regexp_replace(substr(h, 4, 12), '^0*', '') AS tail
  FROM hx),
rk AS (
  SELECT source, idx,
    CASE WHEN tail = '' THEN 49
         ELSE 4 * (12 - length(tail))
              + CASE WHEN substr(tail,1,1) = '1' THEN 3
                     WHEN substr(tail,1,1) IN ('2','3') THEN 2
                     WHEN substr(tail,1,1) IN ('4','5','6','7') THEN 1
                     ELSE 0 END
              + 1 END AS rnk
  FROM nib),
regs AS (SELECT source AS scope, idx, max(rnk) AS m FROM rk GROUP BY source, idx),
allregs AS (SELECT 'ALL' AS scope, idx, max(m) AS m FROM regs GROUP BY idx),
est AS (
  SELECT scope, count(*) AS used, sum(power(2.0, -m)) AS s
  FROM (SELECT * FROM regs UNION ALL SELECT * FROM allregs) u GROUP BY scope),
fin AS (
  SELECT scope,
         (0.7213 / (1 + 1.079 / 1024.0)) * 1024.0 * 1024.0
           / (s + (1024.0 - used)) AS raw,
         1024.0 - used AS zeros
  FROM est),
hll AS (
  SELECT scope,
         round(CASE WHEN raw <= 2.5 * 1024.0 AND zeros > 0
                    THEN 1024.0 * ln(1024.0 / zeros) ELSE raw END, 6)
           AS hll_shingles
  FROM fin),
exact AS (
  SELECT source AS scope, count(DISTINCT shingle) AS exact_shingles
  FROM sh GROUP BY source
  UNION ALL
  SELECT 'ALL', count(DISTINCT shingle) FROM sh)
SELECT h.scope, CAST(e.exact_shingles AS BIGINT) AS exact_shingles,
       h.hll_shingles,
       round((h.hll_shingles - e.exact_shingles) / e.exact_shingles, 6)
         AS rel_err
FROM hll h JOIN exact e USING (scope)
""",
)
def q_sketch_hll_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HyperLogLog cardinality planning: distinct 5-gram count per
    # source + merged-ALL WITHOUT a corpus-wide distinct — the only
    # corpus shuffle carries (scope, register, rank) triples with
    # map-side combine; the ALL row merges the per-source registers
    # (element-wise max), proving sketch mergeability. The exact
    # column is the demonstration baseline a 100 TB run would drop.
    # Per-source counts (~1.4k) exercise the linear-counting branch,
    # the ALL row (~24k) the raw estimator.
    from pero_ocr_spark.operators import sketch

    return sketch.hll_shingle_cardinality(_t(spark, sf_dir, "documents"))


_CMS_NIB = (
    "(CASE WHEN ascii(substr(h, {p}, 1)) >= 97 "
    "THEN ascii(substr(h, {p}, 1)) - 87 "
    "ELSE ascii(substr(h, {p}, 1)) - 48 END)"
)


def _cms_idx_sql(r_expr: str) -> str:
    return (
        _CMS_NIB.format(p=f"3*{r_expr}+1") + " * 256 + "
        + _CMS_NIB.format(p=f"3*{r_expr}+2") + " * 16 + "
        + _CMS_NIB.format(p=f"3*{r_expr}+3")
    )


@register(
    "sketch_cms_heavy_hitters",
    f"""
WITH toks AS (
  SELECT string_split(text, ' ') AS ws FROM documents),
sh AS (
  SELECT unnest(list_transform(
      generate_series(1, len(ws) - 2),
      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
  FROM toks WHERE len(ws) >= 3),
probes AS (
  SELECT shingle, r, {_cms_idx_sql('r')} AS idx
  FROM (SELECT shingle, sha256(shingle) AS h FROM sh) hx,
       (VALUES (0), (1), (2), (3)) rs(r)),
counters AS (
  SELECT r, idx, count(*) AS n FROM probes GROUP BY r, idx),
top AS (
  SELECT shingle, count(*) AS exact_n FROM sh GROUP BY shingle
  ORDER BY exact_n DESC, shingle LIMIT 10),
topprobes AS (
  SELECT shingle, exact_n, r, {_cms_idx_sql('r')} AS idx
  FROM (SELECT shingle, exact_n, sha256(shingle) AS h FROM top) tx,
       (VALUES (0), (1), (2), (3)) rs(r))
SELECT t.shingle, CAST(t.exact_n AS BIGINT) AS exact_n,
       CAST(min(c.n) AS BIGINT) AS cms_n
FROM topprobes t JOIN counters c ON t.r = c.r AND t.idx = c.idx
GROUP BY t.shingle, t.exact_n
""",
)
def q_sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Count-Min heavy hitters: 3-gram frequency estimation from a
    # FIXED d*w counter table (the only corpus shuffle, map-side
    # combinable) probed for the exact top-10 — the exact frequency
    # table is the demonstration baseline a 100 TB run would replace
    # with a sampled candidate shortlist. All-integer arithmetic:
    # the oracle matches bit-exactly, and cms_n >= exact_n always.
    from pero_ocr_spark.operators import sketch

    return sketch.cms_heavy_hitters(_t(spark, sf_dir, "documents"))


def _h48_sql() -> str:
    expr = "CAST(0 AS BIGINT)"  # 48-bit fold overflows INT32
    for i in range(1, 13):
        expr = f"({expr}) * 16 + " + _CMS_NIB.format(p=str(i))
    return expr


@register(
    "sketch_kmv_snapshot_overlap",
    f"""
WITH olds AS (
  SELECT DISTINCT 'https://' || source || '.example.com/doc/'
         || CAST(doc_id AS VARCHAR) AS url
  FROM documents),
news AS (
  SELECT 'https://' || source || '.example.com/doc/'
         || CAST(doc_id AS VARCHAR) AS url
  FROM documents WHERE (doc_id*69069 + 12345) % 2147483647 % 20 <> 1
  UNION
  SELECT 'https://' || source || '.example.com/doc/'
         || CAST(doc_id + 7000000 AS VARCHAR)
  FROM documents WHERE (doc_id*69069 + 12345) % 2147483647 % 20 = 2),
ska AS (
  SELECT DISTINCT {_h48_sql()} AS v
  FROM (SELECT sha256(url) AS h FROM olds) x
  ORDER BY v LIMIT 256),
skb AS (
  SELECT DISTINCT {_h48_sql()} AS v
  FROM (SELECT sha256(url) AS h FROM news) x
  ORDER BY v LIMIT 256),
sku AS (
  SELECT DISTINCT v
  FROM (SELECT v FROM ska UNION ALL SELECT v FROM skb) x
  ORDER BY v LIMIT 256),
uest AS (
  SELECT CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
              ELSE CAST(255 AS DOUBLE) * CAST(281474976710656 AS DOUBLE)
                   / max(v) END AS eu
  FROM sku),
jest AS (
  SELECT round(
      (SELECT count(*) FROM sku
       WHERE v IN (SELECT v FROM ska) AND v IN (SELECT v FROM skb))
      * 1.0 / (SELECT count(*) FROM sku), 6) AS ej),
ex AS (
  SELECT (SELECT count(*) FROM (SELECT url FROM olds
                                UNION SELECT url FROM news) u) AS xu,
         (SELECT count(*)
          FROM olds o JOIN (SELECT DISTINCT url FROM news) n
            ON o.url = n.url) AS xi)
SELECT round(uest.eu, 6) AS est_union,
       CAST(ex.xu AS BIGINT) AS exact_union,
       jest.ej AS est_jaccard,
       round(ex.xi * 1.0 / ex.xu, 6) AS exact_jaccard
FROM uest, jest, ex
""",
)
def q_sketch_kmv_snapshot_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bottom-k (KMV) sketch: snapshot-overlap jaccard + union
    # cardinality from two 256-value sketches — the set-operation
    # sketch HLL can't provide; at 10^12 URLs only the k-row sketches
    # ever meet, the exact columns are the demo baseline. Same
    # snapshot synthesis as crawl_snapshot_diff (1/20 drop, 1/20 add).
    from pero_ocr_spark.operators import sampling, sketch

    docs = _t(spark, sf_dir, "documents")
    r20 = sampling._residue(20)
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
        F.col("doc_id").cast("string"),
    )
    old = docs.select(url.alias("url"))
    new = docs.filter(r20 != 1).select(url.alias("url")).unionByName(
        docs.filter(r20 == 2).select(
            F.concat(
                F.lit("https://"), F.col("source"),
                F.lit(".example.com/doc/"),
                (F.col("doc_id") + 7_000_000).cast("string"),
            ).alias("url")
        )
    )
    return sketch.kmv_snapshot_overlap(old, new)


@register(
    "sketch_histogram_quantiles",
    """
WITH base AS (
  SELECT source AS scope, CAST(n_chars AS DOUBLE) AS v FROM documents),
hist AS (
  SELECT scope, CAST(floor(v / 16) AS BIGINT) AS b, count(*) AS cnt
  FROM base GROUP BY scope, b),
ch AS (
  SELECT scope, b, cnt,
         sum(cnt) OVER (PARTITION BY scope ORDER BY b) AS cum
  FROM hist),
ch2 AS (SELECT scope, b, cnt, cum, cum - cnt AS cum_before FROM ch),
totals AS (SELECT scope, max(cum) AS n FROM ch GROUP BY scope),
tq AS (
  SELECT scope, n, q, q * n AS t
  FROM totals, (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)),
                       (CAST(0.99 AS DOUBLE))) qs(q)),
sel AS (
  SELECT tq.scope, tq.q, tq.t,
         CAST(ch2.b AS DOUBLE) * 16
           + 16 * (tq.t - ch2.cum_before) / ch2.cnt AS approx,
         CAST(ceil(tq.t) AS BIGINT) AS r
  FROM tq JOIN ch2 ON tq.scope = ch2.scope
  WHERE ch2.cum_before < tq.t AND ch2.cum >= tq.t),
ranked AS (
  SELECT scope, v,
         row_number() OVER (PARTITION BY scope ORDER BY v) AS r
  FROM base)
SELECT s.scope, s.q, round(s.approx, 6) AS approx_v,
       r.v AS exact_v,
       round(abs(round(s.approx, 6) - r.v), 6) AS abs_err
FROM sel s JOIN ranked r ON s.scope = r.scope AND s.r = r.r
""",
)
def q_sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # numeric-quantile sketch: per-source p50/p90/p99 of doc length
    # from a fixed-width histogram (ONE map-side-combinable count
    # shuffle, size bounded by value_range/width per group) vs the
    # exact rank-select baseline (a per-group sort the sketch replaces
    # at 100 TB). abs_err is bounded by the bucket width (16 chars).
    from pero_ocr_spark.operators import sketch

    return sketch.histogram_quantiles(
        _t(spark, sf_dir, "documents"), "n_chars", "source"
    )


@register(
    "sample_weighted_aes",
    f"""
WITH keyed AS (
  SELECT source, doc_id, CAST(n_chars AS DOUBLE) AS w,
         ln((({_h48_sql()}) + 1) / CAST(281474976710656 AS DOUBLE))
           / CAST(n_chars AS DOUBLE) AS k
  FROM (SELECT source, doc_id, n_chars,
               sha256(CAST(doc_id AS VARCHAR)) AS h
        FROM documents WHERE n_chars > 0) x),
r AS (
  SELECT source, doc_id, w,
         row_number() OVER (PARTITION BY source
                            ORDER BY k DESC, doc_id) AS rk
  FROM keyed)
SELECT source, doc_id, w AS weight, CAST(rk AS INT) AS rk
FROM r WHERE rk <= 10
""",
)
def q_sample_weighted_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Efraimidis-Spirakis one-pass weighted sampling w/o replacement:
    # inclusion probability proportional to doc length, NO RNG state —
    # the same corpus yields the same sample at any partitioning or
    # cluster size (a per-task seeded RNG cannot promise that). Key
    # arithmetic is in-row; the only exchange is the per-source rank
    # window.
    from pero_ocr_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents")
    return sampling.weighted_sample_aes(
        docs, F.col("n_chars").cast("double"), k=10
    )


@register(
    "events_stream_hll_users",
    """
WITH ev AS (
  SELECT time_bucket(INTERVAL '60 minutes', ts) AS scope,
         sha256(CAST(user_id AS VARCHAR)) AS h
  FROM events),
nib AS (
  SELECT scope,
    ((CASE WHEN ascii(substr(h,1,1)) >= 97
           THEN ascii(substr(h,1,1)) - 87 ELSE ascii(substr(h,1,1)) - 48 END) * 256
   + (CASE WHEN ascii(substr(h,2,1)) >= 97
           THEN ascii(substr(h,2,1)) - 87 ELSE ascii(substr(h,2,1)) - 48 END) * 16
   + (CASE WHEN ascii(substr(h,3,1)) >= 97
           THEN ascii(substr(h,3,1)) - 87 ELSE ascii(substr(h,3,1)) - 48 END)
    ) % 1024 AS idx,
    regexp_replace(substr(h, 4, 12), '^0*', '') AS tail
  FROM ev),
rk AS (
  SELECT scope, idx,
    CASE WHEN tail = '' THEN 49
         ELSE 4 * (12 - length(tail))
              + CASE WHEN substr(tail,1,1) = '1' THEN 3
                     WHEN substr(tail,1,1) IN ('2','3') THEN 2
                     WHEN substr(tail,1,1) IN ('4','5','6','7') THEN 1
                     ELSE 0 END
              + 1 END AS rnk
  FROM nib),
regs AS (SELECT scope, idx, max(rnk) AS m FROM rk GROUP BY scope, idx),
est AS (
  SELECT scope, count(*) AS used, sum(power(2.0, -m)) AS s
  FROM regs GROUP BY scope),
fin AS (
  SELECT scope,
         (0.7213 / (1 + 1.079 / 1024.0)) * 1024.0 * 1024.0
           / (s + (1024.0 - used)) AS raw,
         1024.0 - used AS zeros
  FROM est),
hll AS (
  SELECT scope,
         round(CASE WHEN raw <= 2.5 * 1024.0 AND zeros > 0
                    THEN 1024.0 * ln(1024.0 / zeros) ELSE raw END, 6)
           AS hll_users
  FROM fin),
ex AS (
  SELECT time_bucket(INTERVAL '60 minutes', ts) AS scope,
         count(DISTINCT user_id) AS exact_users
  FROM events GROUP BY 1)
SELECT h.scope AS window_start,
       CAST(ex.exact_users AS BIGINT) AS exact_users,
       h.hll_users,
       round((h.hll_users - ex.exact_users) / ex.exact_users, 6) AS rel_err
FROM hll h JOIN ex ON h.scope = ex.scope
""",
)
def q_events_stream_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    # streaming sketch: HLL register max is ASSOCIATIVE, so the
    # cardinality sketch composes natively with Structured Streaming's
    # incremental aggregation — per-window state is bounded by m
    # registers where an exact streaming count-distinct would hold
    # every user id in state. Run as a REAL streaming query (memory
    # sink); estimate derived batch-side from the register table.
    from pero_ocr_spark.streaming import events as ev

    return ev.window_distinct_users_hll_streaming(spark, sf_dir)


@register(
    "corpus_zipf_fit",
    """
WITH toks AS (
  SELECT string_split(text, ' ') AS ws FROM documents),
sh AS (
  SELECT unnest(list_transform(
      generate_series(1, len(ws) - 2),
      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
  FROM toks WHERE len(ws) >= 3),
counts AS (SELECT g, count(*) AS c FROM sh GROUP BY g),
ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, g) AS r FROM counts),
pts AS (
  SELECT CAST(round(ln(CAST(r AS DOUBLE)), 10) AS DECIMAL(38,12)) AS x,
         CAST(round(ln(CAST(c AS DOUBLE)), 10) AS DECIMAL(38,12)) AS y,
         CAST(round(round(ln(CAST(r AS DOUBLE)), 10)
                    * round(ln(CAST(c AS DOUBLE)), 10), 10)
              AS DECIMAL(38,12)) AS xy,
         CAST(round(round(ln(CAST(r AS DOUBLE)), 10)
                    * round(ln(CAST(r AS DOUBLE)), 10), 10)
              AS DECIMAL(38,12)) AS xx
  FROM ranked WHERE r <= 500),
s AS (
  SELECT count(*) AS n,
         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         CAST(sum(xy) AS DOUBLE) AS sxy, CAST(sum(xx) AS DOUBLE) AS sxx
  FROM pts)
SELECT CAST(n AS BIGINT) AS n_grams,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
         AS intercept
FROM s
""",
)
def q_corpus_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Zipf diagnostic: least-squares ln(freq)~ln(rank) over the top
    # 500 3-grams. Regression terms are 10dp-rounded and summed as
    # DECIMAL(38,12) so the distributed sum is exact and
    # order-independent — the float-parity technique that lets a
    # distributed regression match a sequential oracle bit-for-bit.
    from pero_ocr_spark.operators import textstats

    return textstats.zipf_fit(_t(spark, sf_dir, "documents"))


@register(
    "training_pack_interleaved",
    _EXTRACTED_CTE
    + """,
cost AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN kind = 'media' THEN 64
                       ELSE len(string_split(text, ' ')) END) AS BIGINT)
           AS n_tokens,
         CAST(SUM(CASE WHEN kind = 'media' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_media
  FROM extracted GROUP BY doc_id),
b AS (
  SELECT doc_id, n_tokens, n_media,
         CAST(doc_id % 32 AS BIGINT) AS bucket
  FROM cost),
c AS (
  SELECT *, sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id)
            AS cum
  FROM b),
p AS (
  SELECT *, CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS pack
  FROM c)
SELECT doc_id, bucket,
       CAST(pack * 32 + bucket AS BIGINT) AS seq_id,
       n_tokens, n_media,
       CAST(row_number() OVER (PARTITION BY bucket, pack
                               ORDER BY doc_id) - 1 AS BIGINT) AS seq_pos
FROM p
""",
)
def q_training_pack_interleaved(spark: SparkSession, sf_dir: str) -> DataFrame:
    # multimodal sequence packing: media spans cost the vision
    # encoder's fixed 64-token patch budget, text spans their word
    # count — the cost model a multimodal trainer actually packs
    # against. Reuses the extraction exchange for the per-doc cost
    # agg; packing adds only the bucket-window exchange.
    from pero_ocr_spark.operators import sampling

    spans = corpus.extracted_spans(spark, sf_dir)
    return sampling.pack_sequences_interleaved(spans)


@register(
    "corpus_drift_kl",
    """
WITH cur AS (
  SELECT source, count(*) AS n_cur FROM documents GROUP BY source),
snap AS (
  SELECT source, count(*) AS n_snap FROM documents
  WHERE (doc_id*69069 + 12345) % 2147483647 % 100 < 33
  GROUP BY source),
j AS (
  SELECT COALESCE(cur.source, snap.source) AS source,
         COALESCE(n_cur, 0) AS n_cur, COALESCE(n_snap, 0) AS n_snap
  FROM cur FULL OUTER JOIN snap ON cur.source = snap.source),
tot AS (
  SELECT sum(n_cur) AS nc, sum(n_snap) AS ns, count(*) AS g FROM j),
t AS (
  SELECT CAST(n_cur + 1 AS DOUBLE) / (nc + g) AS p,
         CAST(n_snap + 1 AS DOUBLE) / (ns + g) AS q
  FROM j CROSS JOIN tot),
terms AS (
  SELECT CAST(round(p * ln(p / q), 10) AS DECIMAL(38,12)) AS kl_t,
         CAST(round(p * ln(p / ((p + q) / 2)) / 2
                    + q * ln(q / ((p + q) / 2)) / 2, 10)
              AS DECIMAL(38,12)) AS js_t,
         CAST(round(abs(p - q) / 2, 10) AS DECIMAL(38,12)) AS tv_t
  FROM t)
SELECT CAST(count(*) AS BIGINT) AS n_groups,
       round(CAST(sum(kl_t) AS DOUBLE), 6) AS kl_div,
       round(CAST(sum(js_t) AS DOUBLE), 6) AS js_div,
       round(CAST(sum(tv_t) AS DOUBLE), 6) AS tv_dist
FROM terms
""",
)
def q_corpus_drift_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    # distribution-drift monitor: KL / Jensen-Shannon / total-variation
    # between the current corpus's source composition and a previous
    # snapshot's (deterministic LCG-residue 33% subset — the engine's
    # portable snapshot stand-in). Add-one smoothing over the union of
    # groups keeps KL finite when a source exists on one side only;
    # per-group terms are 10dp-rounded and decimal-summed (zipf_fit's
    # float-parity technique). The corpus contributes two count aggs;
    # everything else runs on |sources| rows.
    from pero_ocr_spark.operators import sampling, textstats

    docs = _t(spark, sf_dir, "documents")
    snapshot = docs.filter(sampling._residue(100) < 33)
    return textstats.corpus_drift(docs, snapshot)


@register(
    "events_stream_enrich",
    """
WITH dim AS (
  SELECT DISTINCT user_id,
         CASE WHEN (user_id*69069 + 12345) % 2147483647 % 100 < 20 THEN 'vip'
              WHEN (user_id*69069 + 12345) % 2147483647 % 100 < 60 THEN 'core'
              ELSE 'casual' END AS tier
  FROM events)
SELECT time_bucket(INTERVAL '1440 minutes', e.ts) AS window_start,
       d.tier, e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(e.value), 4) AS total_value
FROM events e JOIN dim d ON e.user_id = d.user_id
GROUP BY 1, 2, 3
""",
)
def q_events_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    # stream-static enrichment join (the dimension-lookup pattern): a
    # broadcast user-tier dim hash-joined onto each micro-batch
    # STATELESSLY; only the daily windowed agg carries state. Run as a
    # real Structured Streaming query into a memory sink; the oracle is
    # the equivalent batch join + window.
    from pero_ocr_spark.streaming import events as ev

    return ev.enriched_tier_totals_streaming(spark, sf_dir)


@register(
    "events_stream_join",
    """
SELECT v.user_id,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(CAST(sum(CAST(floor(epoch(c.cts)) AS BIGINT)
                      - CAST(floor(epoch(v.vts)) AS BIGINT)) AS DOUBLE)
             / (60.0 * count(*)), 6) AS avg_lag_min
FROM (SELECT user_id, ts AS vts FROM events WHERE event_type = 'view') v
JOIN (SELECT user_id, ts AS cts FROM events WHERE event_type = 'click') c
  ON v.user_id = c.user_id
 AND c.cts >= v.vts AND c.cts <= v.vts + INTERVAL 6 HOUR
GROUP BY 1
""",
)
def q_events_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # stream-stream interval join with watermarks (the attribution
    # pattern): clicks matched to the same user's views from the
    # preceding 6 hours, both sides independent watermarked streams —
    # the time-range predicate is what lets Spark EVICT join state
    # (views older than watermark + lag can never match). Lag summed in
    # whole seconds (exact integers) so the per-user mean is
    # order-independent; oracle = the equivalent batch interval join.
    from pero_ocr_spark.streaming import events as ev

    return ev.view_click_attribution_streaming(spark, sf_dir)


@register(
    "decontam_span_mask",
    """
WITH r AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         (doc_id*69069 + 12345) % 2147483647 % 41 = 3 AS is_bench
  FROM documents),
g AS (
  SELECT doc_id, is_bench,
         CAST(unnest(generate_series(0, len(ws) - 4)) AS INT) AS pos, ws
  FROM r WHERE len(ws) >= 4),
g2 AS (
  SELECT doc_id, is_bench, pos,
         array_to_string(list_slice(ws, pos + 1, pos + 4), ' ') AS gram
  FROM g),
b AS (SELECT DISTINCT gram FROM g2 WHERE is_bench),
d AS (
  SELECT doc_id, pos FROM g2
  WHERE NOT is_bench AND gram IN (SELECT gram FROM b)),
bk AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 4
              THEN 1 ELSE 0 END AS brk
  FROM d),
i AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM bk)
SELECT doc_id,
       CAST(min(pos) AS INT) AS span_start,
       CAST(max(pos) + 4 AS INT) AS span_end,
       CAST(max(pos) + 4 - min(pos) AS INT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_grams
FROM i GROUP BY doc_id, island
""",
)
def q_decontam_span_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    # span-level decontamination: the maximal word spans of each
    # training doc covered by a benchmark-colliding 4-gram — mask the
    # spans, keep the doc (vs decontam_benchmark_overlap's doc-level
    # flag). Benchmark split = the same LCG residue rule; bench gram
    # hashes broadcast, corpus shuffles once (doc_id islands).
    from pero_ocr_spark.operators import dedup, sampling

    docs = _t(spark, sf_dir, "documents")
    is_bench = sampling._residue(41) == 3
    return dedup.mask_contaminated_spans(
        docs.filter(~is_bench), docs.filter(is_bench), n=4
    )


@register(
    "corpus_balanced_shards",
    """
WITH t AS (
  SELECT CAST((sum(n_chars) + 63) // 64 AS BIGINT) AS target
  FROM documents),
c AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS cost,
         sum(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
           - n_chars AS cb
  FROM documents)
SELECT doc_id, cost, CAST(cb // target AS INT) AS shard
FROM c, t
""",
)
def q_corpus_balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    # size-balanced contiguous sharding via the two-level distributed
    # prefix sum (bucket totals -> tiny offsets window -> parallel
    # within-bucket cumsum) — the oracle states the same function as
    # ONE global cumsum window, which is exactly the single-partition
    # plan the operator exists to avoid.
    from pero_ocr_spark.operators import sampling

    return sampling.balanced_shards(
        _t(spark, sf_dir, "documents"), n_shards=64
    )


@register(
    "corpus_leakage_safe_split",
    _SHINGLE_CTE
    + """
, sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT da AS doc_a, db AS doc_b
  FROM common JOIN sizes x ON da = x.doc_id JOIN sizes y ON db = y.doc_id
  WHERE round(c * 1.0 / (x.n + y.n - c), 6) >= 0.8),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
r AS (
  WITH RECURSIVE reach(a, b) AS (
    SELECT a, b FROM edges
    UNION
    SELECT reach.a, e.b FROM reach JOIN edges e ON reach.b = e.a)
  SELECT * FROM reach),
cl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM r GROUP BY a),
g AS (
  SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS group_id
  FROM documents d LEFT JOIN cl USING (doc_id))
SELECT doc_id, group_id,
       CASE WHEN (group_id*69069 + 12345) % 2147483647 % 100 < 10
              THEN 'test'
            WHEN (group_id*69069 + 12345) % 2147483647 % 100 < 20
              THEN 'val'
            ELSE 'train' END AS split
FROM g
""",
)
def q_corpus_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    # eval-leakage guard: the split residue is computed on the
    # duplicate-CLUSTER id (min doc_id of the connected component from
    # MinHash-LSH pairs at 0.8 jaccard), so near-duplicate docs can
    # never straddle train/val/test — plain per-doc hashing puts a
    # training doc's near-twin in the eval set ~20% of the time
    from pero_ocr_spark.operators import dedup, sampling

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.8)
    clusters = dedup.duplicate_clusters(pairs)
    return sampling.leakage_safe_split(docs, clusters)


@register(
    "events_gap_fill",
    """
WITH obs AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket_ts,
         arg_max(value, ts) AS v, count(*) AS n
  FROM events GROUP BY 1, 2),
b AS (SELECT user_id, min(bucket_ts) h0, max(bucket_ts) h1
      FROM obs GROUP BY 1),
grid AS (
  SELECT user_id,
         unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS bucket_ts
  FROM b),
j AS (
  SELECT g.user_id, g.bucket_ts, o.v, coalesce(o.n, 0) AS n
  FROM grid g LEFT JOIN obs o USING (user_id, bucket_ts))
SELECT user_id, bucket_ts,
       round(last_value(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY bucket_ts
         ROWS UNBOUNDED PRECEDING), 6) AS filled_value,
       CAST(n AS BIGINT) AS n_obs,
       n = 0 AS is_gap
FROM j
""",
)
def q_events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    # LOCF gap-filling onto a fixed hourly grid (the TimescaleDB
    # time_bucket_gapfill + locf analog): per-user grid generated
    # in-row via sequence(), last-observation carry via ONE
    # ignorenulls running window — O(1) carry state per key
    from pero_ocr_spark.operators import timeseries

    return timeseries.gap_fill(_t(spark, sf_dir, "events"))


@register(
    "events_funnel",
    """
WITH s0 AS (
  SELECT user_id, min(ts) AS t_signup FROM events
  WHERE event_type = 'signup' GROUP BY 1),
s1 AS (
  SELECT e.user_id, min(e.ts) AS t_view FROM events e
  JOIN s0 USING (user_id)
  WHERE e.event_type = 'view' AND e.ts > s0.t_signup GROUP BY 1),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t_click FROM events e
  JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t_view GROUP BY 1),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t_purchase FROM events e
  JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t_click GROUP BY 1)
SELECT s0.user_id, t_signup, t_view, t_click, t_purchase,
       CAST(1 + (t_view IS NOT NULL)::INT + (t_click IS NOT NULL)::INT
              + (t_purchase IS NOT NULL)::INT AS INT) AS funnel_stage
FROM s0 LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        LEFT JOIN s3 USING (user_id)
""",
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ordered conversion funnel (signup -> view -> click -> purchase):
    # one conditional-min per stage, every exchange on the same key —
    # no per-user event arrays are ever buffered
    from pero_ocr_spark.operators import timeseries

    return timeseries.funnel(
        _t(spark, sf_dir, "events"),
        ("signup", "view", "click", "purchase"),
    )


def _hard_neg_oracle() -> str:
    return f"""
{_COS_E_CTE}
, eb AS (SELECT vec_id, emb, nrm, label, {_duck_bucket_expr()} AS bucket
         FROM e JOIN embeddings USING (vec_id))
, sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 6) AS cosine
  FROM eb q JOIN eb c
    ON bit_count(xor(c.bucket, q.bucket)) <= 2
   AND c.vec_id <> q.vec_id AND c.label <> q.label
  WHERE q.vec_id IN ({", ".join(str(i) for i in _QUERY_IDS)}))
SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
  FROM sims WHERE cosine < 0.98)
WHERE rn <= 5
"""


@register("similarity_hard_negatives", _hard_neg_oracle())
def q_similarity_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    # contrastive hard-negative mining: per anchor, the top-5 most-
    # similar DIFFERENT-label vectors through the LSH candidate join
    # (hamming <= 2 probes), with a 0.98-cosine dup gate dropping
    # probable false negatives before ranking
    from pero_ocr_spark.operators import similarity

    return similarity.hard_negative_topk(
        _t(spark, sf_dir, "embeddings"), _QUERY_IDS, k=5
    )


@register(
    "events_retention_cohorts",
    """
WITH first AS (
  SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
  FROM events GROUP BY 1),
active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events)
SELECT f.cohort_week,
       CAST((CAST(floor(epoch(a.week)) AS BIGINT)
             - CAST(floor(epoch(f.cohort_week)) AS BIGINT))
            / (7 * 86400) AS INT) AS week_offset,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM active a JOIN first f USING (user_id)
GROUP BY 1, 2
""",
)
def q_events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cohort retention triangle: users bucketed by first-event week,
    # distinct-active counts at each later week offset; the final agg
    # key domain is weeks^2, so only the user-keyed stages carry data
    from pero_ocr_spark.operators import timeseries

    return timeseries.retention_cohorts(_t(spark, sf_dir, "events"))


@register(
    "events_rolling_window",
    """
WITH t AS (
  SELECT event_id, user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         CAST(round(value * 10000) AS BIGINT) AS tk
  FROM events)
SELECT event_id, user_id, ts_s,
       CAST(count(*) OVER w AS BIGINT) AS rolling_n,
       round(sum(tk) OVER w / 10000.0, 4) AS rolling_sum,
       round(max(tk) OVER w / 10000.0, 4) AS rolling_max
FROM t
WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
             RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
""",
)
def q_events_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    # trailing 24h per-user velocity features over a time-RANGE frame
    # (irregular spacing handled exactly); the sum runs on 1e-4 integer
    # ticks so intra-frame addition order can't flip a final ulp
    from pero_ocr_spark.operators import timeseries

    return timeseries.rolling_window_stats(_t(spark, sf_dir, "events"))


@register(
    "corpus_skew_profile",
    """
WITH per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_cost
  FROM documents GROUP BY 1),
t AS (SELECT sum(total_cost) AS tot, count(*) AS nkeys FROM per)
SELECT source, n_docs, total_cost,
       round(total_cost / tot, 6) AS cost_share,
       round(total_cost * nkeys / tot, 6) AS skew_factor,
       CAST(greatest(1, ceil(total_cost * 32 / tot)) AS INT) AS salt_factor
FROM per, t
""",
)
def q_corpus_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pre-flight shuffle-skew profiler for a candidate key: byte share,
    # skew factor vs uniform, and the salt factor a skew-aware job
    # feeds to its salted repartition — the measurement half of
    # "partitioning / shuffle / skew handled explicitly"
    from pero_ocr_spark.operators import sampling

    return sampling.skew_profile(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Session-6 wave: n-gram novelty, containment dedup, CCNet buckets,
# margin pair mining, T5 span corruption, HITS.
# ---------------------------------------------------------------------------

@register(
    "text_ngram_novelty",
    """
WITH r AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
             generate_series(1, len(ws) - 4),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
                  || ws[i+3] || ' ' || ws[i+4]))) AS shingle
  FROM r WHERE len(ws) >= 5),
f AS (SELECT shingle, min(doc_id) AS first_doc FROM g GROUP BY 1)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       round(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
             * 1.0 / count(*), 6) AS novelty
FROM g JOIN f USING (shingle)
GROUP BY g.doc_id
""",
)
def q_text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-doc novelty vs crawl order: fraction of a doc's distinct word
    # 5-grams first introduced by that doc (first = min doc_id); one
    # window min on the gram key, one agg back on doc_id — no join
    from pero_ocr_spark.operators import textstats

    return textstats.ngram_novelty(_t(spark, sf_dir, "documents"), n=5)


@register(
    "dedup_containment_pairs",
    """
WITH r AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
             generate_series(1, len(ws) - 2),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
  FROM r WHERE len(ws) >= 3),
sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
c AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM g a JOIN g b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
p AS (
  SELECT c.doc_a, c.doc_b, c.common, sa.n AS na, sb.n AS nb
  FROM c JOIN sz sa ON sa.doc_id = c.doc_a
         JOIN sz sb ON sb.doc_id = c.doc_b)
SELECT doc_a, doc_b,
       CAST(common AS BIGINT) AS n_common,
       CAST(na AS BIGINT) AS size_a,
       CAST(nb AS BIGINT) AS size_b,
       round(greatest(common * 1.0 / na, common * 1.0 / nb), 6)
         AS containment,
       round(common * 1.0 / (na + nb - common), 6) AS jaccard,
       CASE WHEN common * 1.0 / na >= common * 1.0 / nb
            THEN 'a_in_b' ELSE 'b_in_a' END AS direction
FROM p
WHERE round(greatest(common * 1.0 / na, common * 1.0 / nb), 6) >= 0.5
""",
)
def q_dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # asymmetric subsumption dedup: directional shingle containment
    # |A∩B|/|A| over the same inverted-index join as exact Jaccard —
    # catches truncated mirrors and boilerplate-wrapped copies that a
    # symmetric Jaccard threshold ignores
    from pero_ocr_spark.operators import dedup

    return dedup.containment_pairs(
        _t(spark, sf_dir, "documents"), n=3, min_containment=0.5
    )


_CCNET_BUCKETS_ORACLE = """
WITH ch AS (
  SELECT doc_id, string_split(text, '') AS cs FROM documents
  WHERE len(text) >= 2),
g AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(cs) - 1),
                i -> cs[i] || cs[i+1])) AS bigram
  FROM ch),
c2 AS (SELECT bigram, count(*) AS n2 FROM g GROUP BY 1),
c1 AS (SELECT substr(bigram, 1, 1) AS ctx, sum(n2) AS n1 FROM c2 GROUP BY 1),
v AS (SELECT count(DISTINCT c) AS vsize
      FROM (SELECT unnest(string_split(text, '')) AS c FROM documents)),
s AS (
  SELECT g.doc_id,
         round(avg(ln((c2.n2 + 1.0) / (c1.n1 + v.vsize))), 6) AS avg_logprob
  FROM g
  JOIN c2 USING (bigram)
  JOIN c1 ON substr(g.bigram, 1, 1) = c1.ctx
  CROSS JOIN v
  GROUP BY g.doc_id)
SELECT s.doc_id, d.lang, s.avg_logprob,
       (['head', 'middle', 'tail'])[
         ntile(3) OVER (PARTITION BY d.lang
                        ORDER BY s.avg_logprob DESC, s.doc_id)] AS bucket
FROM s JOIN documents d ON d.doc_id = s.doc_id
"""


@register("corpus_ccnet_buckets", _CCNET_BUCKETS_ORACLE)
def q_corpus_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CCNet head/middle/tail terciles per language under the
    # self-trained char-bigram LM; EXACT ntile with a deterministic
    # (score, doc_id) ordering, not approx-percentile thresholds
    from pero_ocr_spark.operators import textstats

    return textstats.ccnet_buckets(_t(spark, sf_dir, "documents"))


_MARGIN_ORACLE = f"""
{_COS_E_CTE}
, pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 6) AS cosine
  FROM e q JOIN e c ON c.vec_id <> q.vec_id
  WHERE q.vec_id IN ({", ".join(str(i) for i in _QUERY_IDS)})),
rk AS (
  SELECT *,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rq,
         row_number() OVER (PARTITION BY neighbor_id
                            ORDER BY cosine DESC, query_id) AS rc
  FROM pairs),
aq AS (SELECT query_id, avg(cosine) AS avgk_q FROM rk WHERE rq <= 4 GROUP BY 1),
ac AS (SELECT neighbor_id, avg(cosine) AS avgk_c FROM rk WHERE rc <= 4 GROUP BY 1),
m AS (
  SELECT p.query_id, p.neighbor_id, p.cosine,
         round(p.cosine * 2 / (aq.avgk_q + ac.avgk_c), 6) AS margin
  FROM pairs p JOIN aq USING (query_id) JOIN ac USING (neighbor_id))
SELECT query_id, neighbor_id, cosine, margin, CAST(rn AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY margin DESC, neighbor_id) AS rn
      FROM m)
WHERE rn <= 3
"""


@register("similarity_margin_pairs", _MARGIN_ORACLE)
def q_similarity_margin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Artetxe–Schwenk margin criterion: pair score = cosine over the
    # mean of both sides' k-NN neighborhoods — hub vectors score no
    # margin; top-3 candidates per query from one broadcast cross
    # product and three windows
    from pero_ocr_spark.operators import similarity

    return similarity.margin_topk(
        _t(spark, sf_dir, "embeddings"), _QUERY_IDS, k_nn=4, k_out=3
    )


@register(
    "training_span_corruption",
    """
WITH r AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
t AS (
  SELECT doc_id,
         unnest(generate_series(1, len(ws))) AS pos,
         unnest(ws) AS token
  FROM r),
m AS (
  SELECT doc_id, pos, token,
         ((doc_id*1103515245 + pos*69069 + 12345) % 2147483647) % 100 < 15
           AS masked
  FROM t),
s AS (
  SELECT *,
         masked AND NOT coalesce(
           lag(masked) OVER (PARTITION BY doc_id ORDER BY pos), FALSE)
           AS span_start
  FROM m),
x AS (
  SELECT *,
         sum(CASE WHEN span_start THEN 1 ELSE 0 END) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS UNBOUNDED PRECEDING) AS span_idx
  FROM s),
p AS (
  SELECT doc_id, pos, span_idx,
         CASE WHEN NOT masked THEN token
              WHEN span_start
              THEN '<extra_id_' || (span_idx - 1) || '>' END AS ip,
         CASE WHEN masked AND span_start
              THEN '<extra_id_' || (span_idx - 1) || '>' || ' ' || token
              WHEN masked THEN token END AS tp
  FROM x)
SELECT doc_id,
       string_agg(ip, ' ' ORDER BY pos) AS input_text,
       CASE WHEN max(span_idx) = 0 THEN '<extra_id_0>'
            ELSE string_agg(tp, ' ' ORDER BY pos)
                 || ' <extra_id_' || max(span_idx) || '>' END AS target_text,
       CAST(max(span_idx) AS BIGINT) AS n_spans
FROM p
GROUP BY doc_id
""",
)
def q_training_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    # T5 denoising pairs generated in-engine: LCG position mask,
    # consecutive masked tokens collapse to one sentinel; one doc_id
    # shuffle total (three windows share one sort)
    from pero_ocr_spark.operators import sampling

    return sampling.span_corruption(
        _t(spark, sf_dir, "documents"), mask_pct=15
    )


_HITS_ORACLE = """
WITH cnt AS (SELECT count(*) AS n FROM documents),
j AS (
  SELECT doc_id AS src,
         unnest(generate_series(0, doc_id % 3 + 1)) AS j
  FROM documents),
e AS (
  SELECT src, (src*7 + j*13 + 1) % (SELECT n FROM cnt) AS dst
  FROM j
  WHERE (src*7 + j*13 + 1) % (SELECT n FROM cnt) <> src),
h0 AS (SELECT doc_id, 1.0 AS hub FROM documents),
a1r AS (
  SELECT d.doc_id,
         coalesce((SELECT sum(h0.hub) FROM e JOIN h0 ON h0.doc_id = e.src
                   WHERE e.dst = d.doc_id), 0.0) AS a
  FROM documents d),
a1 AS (SELECT doc_id, a / (SELECT max(a) FROM a1r) AS auth FROM a1r),
h1r AS (
  SELECT d.doc_id,
         coalesce((SELECT sum(a1.auth) FROM e JOIN a1 ON a1.doc_id = e.dst
                   WHERE e.src = d.doc_id), 0.0) AS h
  FROM documents d),
h1 AS (SELECT doc_id, h / (SELECT max(h) FROM h1r) AS hub FROM h1r),
a2r AS (
  SELECT d.doc_id,
         coalesce((SELECT sum(h1.hub) FROM e JOIN h1 ON h1.doc_id = e.src
                   WHERE e.dst = d.doc_id), 0.0) AS a
  FROM documents d),
a2 AS (SELECT doc_id, a / (SELECT max(a) FROM a2r) AS auth FROM a2r),
h2r AS (
  SELECT d.doc_id,
         coalesce((SELECT sum(a2.auth) FROM e JOIN a2 ON a2.doc_id = e.dst
                   WHERE e.src = d.doc_id), 0.0) AS h
  FROM documents d),
h2 AS (SELECT doc_id, h / (SELECT max(h) FROM h2r) AS hub FROM h2r),
a3r AS (
  SELECT d.doc_id,
         coalesce((SELECT sum(h2.hub) FROM e JOIN h2 ON h2.doc_id = e.src
                   WHERE e.dst = d.doc_id), 0.0) AS a
  FROM documents d),
a3 AS (SELECT doc_id, a / (SELECT max(a) FROM a3r) AS auth FROM a3r),
h3r AS (
  SELECT d.doc_id,
         coalesce((SELECT sum(a3.auth) FROM e JOIN a3 ON a3.doc_id = e.dst
                   WHERE e.src = d.doc_id), 0.0) AS h
  FROM documents d),
h3 AS (SELECT doc_id, h / (SELECT max(h) FROM h3r) AS hub FROM h3r)
SELECT a3.doc_id, round(a3.auth, 6) AS authority, round(h3.hub, 6) AS hub
FROM a3 JOIN h3 USING (doc_id)
"""


@register("web_hits", _HITS_ORACLE)
def q_web_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HITS hubs/authorities over the deterministic link graph: 3
    # mutual-reinforcement steps, max-normalized (max is FP-order-
    # independent, so the oracle's serial reduction agrees exactly);
    # same iterated corpus-sized shuffle shape as pagerank
    from pero_ocr_spark.operators import linkgraph

    docs = _t(spark, sf_dir, "documents")
    return linkgraph.hits(docs, n_docs=docs.count(), iterations=3)


def _power_iter_cte(iters: int = 3, dims: int = 64) -> str:
    """Unrolled distributed power iteration in DuckDB: per-dim sums of
    round(x_i * round(x·v, 9), 9) as DECIMAL(38,12) (exact,
    order-independent — zipf_fit's float-parity technique), then
    max-|v|-normalize and re-round to 6 — identical arithmetic to
    similarity.top_component."""
    sql = f"""
WITH e AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS d
           FROM embeddings),
dims AS (SELECT unnest(generate_series(1, {dims})) AS i),
v0 AS (SELECT list_transform(generate_series(1, {dims}), i -> 1.0) AS v)"""
    for t in range(1, iters + 1):
        sql += f""",
s{t} AS (
  SELECT dims.i,
         sum(CAST(round(e.d[dims.i]
                        * round(list_dot_product(e.d, v{t-1}.v), 9), 9)
             AS DECIMAL(38,12))) AS s
  FROM e CROSS JOIN v{t-1} CROSS JOIN dims GROUP BY dims.i),
m{t} AS (SELECT max(abs(s)) AS m FROM s{t}),
v{t} AS (SELECT list(round(CAST(s AS DOUBLE) / CAST(m AS DOUBLE), 6)
                     ORDER BY i) AS v
         FROM s{t} CROSS JOIN m{t})"""
    sql += f"""
SELECT vec_id, round(list_dot_product(d, v{iters}.v), 6) AS projection
FROM e CROSS JOIN v{iters}
"""
    return sql


@register("embedding_top_component", _power_iter_cte())
def q_embedding_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 1-component PCA by distributed power iteration: each step is ONE
    # shuffle-free map-side-combinable agg of dim decimal partial sums
    # (exact, order-independent); driver holds dim scalars; projection
    # onto the dominant axis = the curation outlier score
    from pero_ocr_spark.operators import similarity

    return similarity.top_component(
        _t(spark, sf_dir, "embeddings"), iterations=3
    )


_RRF_ORACLE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tok AS (SELECT doc_id, len(ws) * 1.0 AS dl, unnest(ws) AS term FROM w),
hits AS (
  SELECT doc_id, term, count(*) * 1.0 AS tf, any_value(dl) AS dl
  FROM tok WHERE term IN ('spark', 'window', 'merge')
  GROUP BY doc_id, term),
stats AS (SELECT count(*) * 1.0 AS n, avg(len(ws)) AS avgdl FROM w),
dft AS (SELECT term, count(*) * 1.0 AS df FROM hits GROUP BY term),
sc AS (
  SELECT h.doc_id,
         ln(1 + (st.n - d.df + 0.5) / (d.df + 0.5)) * h.tf * (1.2 + 1)
           / (h.tf + 1.2 * (1 - 0.75 + 0.75 * h.dl / st.avgdl)) AS c
  FROM hits h JOIN dft d USING (term) CROSS JOIN stats st),
lexlist AS (
  SELECT doc_id, round(sum(c), 6) AS score FROM sc GROUP BY doc_id
  ORDER BY score DESC, doc_id LIMIT 50),
lex AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
           AS lex_rank
  FROM lexlist),
e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
           AS nrm
  FROM embeddings),
q AS (SELECT emb, nrm FROM e WHERE vec_id = 0),
semlist AS (
  SELECT c.vec_id AS doc_id,
         round(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 6) AS cosine
  FROM e c CROSS JOIN q WHERE c.vec_id <> 0
  ORDER BY cosine DESC, doc_id LIMIT 50),
sem AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY cosine DESC, doc_id) AS BIGINT)
           AS sem_rank
  FROM semlist),
f AS (
  SELECT doc_id, lex_rank, sem_rank,
         round(coalesce(1.0 / (60 + lex_rank), 0.0)
               + coalesce(1.0 / (60 + sem_rank), 0.0), 9) AS rrf_score
  FROM lex FULL OUTER JOIN sem USING (doc_id))
SELECT doc_id, lex_rank, sem_rank, rrf_score,
       CAST(rn AS BIGINT) AS fused_rank
FROM (SELECT *, row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS rn
      FROM f)
WHERE rn <= 20
"""


@register("search_rank_fusion", _RRF_ORACLE)
def q_search_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hybrid retrieval: reciprocal-rank fusion of BM25 (lexical) and
    # cosine (semantic) top-50 lists — rank-only, so the incomparable
    # score scales never mix; one full-outer join of two tiny lists
    from pero_ocr_spark.operators import similarity

    return similarity.rank_fusion(
        _t(spark, sf_dir, "documents"),
        _t(spark, sf_dir, "embeddings"),
        ["spark", "window", "merge"],
        query_vec_id=0,
    )


@register(
    "events_anomaly_mad",
    """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY 1),
dev AS (
  SELECT e.event_id, e.event_type, e.value, m.med,
         abs(e.value - m.med) AS d
  FROM events e JOIN med m USING (event_type)),
mad AS (
  SELECT event_type, quantile_cont(d, 0.5) AS mad FROM dev GROUP BY 1),
z AS (
  SELECT dev.event_id, dev.event_type, dev.value, dev.med, dev.d, mad.mad,
         CASE WHEN mad.mad = 0 THEN 0.0
              ELSE round(0.6745 * dev.d / mad.mad, 6) END AS mod_z
  FROM dev JOIN mad USING (event_type))
SELECT event_id, event_type AS group_key, value,
       round(med, 6) AS group_median, round(mad, 6) AS group_mad,
       mod_z, mod_z > 3.5 AS is_anomaly
FROM z
""",
)
def q_events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hampel/MAD robust anomaly gate: per-group exact medians via two
    # broadcast-back aggs; modified z = 0.6745*|x-med|/MAD; zero MAD
    # (>=50% ties) disables the rule instead of dividing by zero
    from pero_ocr_spark.operators import timeseries

    return timeseries.mad_anomalies(_t(spark, sf_dir, "events"))


def _pq_cte(m: int = 4, ksub: int = 16, iters: int = 3, dims: int = 64,
            k: int = 5) -> str:
    """Unrolled product quantization in DuckDB: per subspace, the
    Lloyd CTE chain on the dim slice (same arithmetic as _kmeans_cte:
    init rounded 6, ties to lowest cell, means re-rounded 6), then the
    query LUTs (subdistances rounded 9) and the fixed-order ADC sum —
    identical arithmetic to similarity.pq_topk."""
    w = dims // m
    ids = ", ".join(str(i) for i in _QUERY_IDS)
    sql = f"""
WITH e AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS d
           FROM embeddings),
dimw AS (SELECT unnest(generate_series(1, {w})) AS i)"""
    for j in range(m):
        a, b = j * w + 1, (j + 1) * w
        sql += f""",
es{j} AS (SELECT vec_id, d[{a}:{b}] AS s FROM e),
c{j}_0 AS (
  SELECT vec_id AS cell, list_transform(s, x -> round(x, 6)) AS cent
  FROM es{j} WHERE vec_id < {ksub})"""
        for t in range(iters):
            sql += f""",
a{j}_{t} AS (
  SELECT vec_id, cell FROM (
    SELECT es.vec_id, c.cell,
           row_number() OVER (
             PARTITION BY es.vec_id
             ORDER BY list_sum(list_transform(generate_series(1, {w}),
                       i -> (es.s[i] - c.cent[i]) * (es.s[i] - c.cent[i]))),
                      c.cell) AS rn
    FROM es{j} es CROSS JOIN c{j}_{t} c) WHERE rn = 1)"""
            if t < iters - 1:
                sql += f""",
c{j}_{t + 1} AS (
  SELECT cell, list(v ORDER BY i) AS cent FROM (
    SELECT a.cell, dimw.i, round(avg(es.s[dimw.i]), 6) AS v
    FROM a{j}_{t} a JOIN es{j} es USING (vec_id) CROSS JOIN dimw
    GROUP BY a.cell, dimw.i) GROUP BY cell)"""
        sql += f""",
lut{j} AS (
  SELECT q.vec_id AS query_id, c.cell,
         round(list_sum(list_transform(generate_series(1, {w}),
               i -> (q.s[i] - c.cent[i]) * (q.s[i] - c.cent[i]))), 9) AS l
  FROM es{j} q CROSS JOIN c{j}_{iters - 1} c
  WHERE q.vec_id IN ({ids}))"""
    T = iters - 1
    joins = "\n  ".join(
        f"JOIN a{j}_{T} a{j} USING (vec_id)" for j in range(1, m)
    )
    lut_joins = "\n  ".join(
        f"JOIN lut{j} l{j} ON l{j}.cell = enc.k{j} "
        f"AND l{j}.query_id = l0.query_id"
        for j in range(1, m)
    )
    adc_sum = " + ".join(f"l{j}.l" for j in range(m))
    sql += f""",
enc AS (
  SELECT a0.vec_id, {", ".join(f"a{j}.cell AS k{j}" for j in range(m))}
  FROM a0_{T} a0
  {joins}),
adc AS (
  SELECT l0.query_id, enc.vec_id AS neighbor_id,
         round({adc_sum}, 6) AS adc_dist
  FROM enc JOIN lut0 l0 ON l0.cell = enc.k0
  {lut_joins}
  WHERE enc.vec_id <> l0.query_id)
SELECT query_id, neighbor_id, adc_dist, CAST(rn AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc_dist, neighbor_id) AS rn
      FROM adc)
WHERE rn <= {k}
"""
    return sql


@register("similarity_ann_pq", _pq_cte())
def q_similarity_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    # product quantization + asymmetric distance (Jegou et al.): 4
    # subspace Lloyd quantizers, vectors collapse to 4 codes, search =
    # 4 broadcast LUT joins + a fixed-order 4-term sum — the corpus
    # side carries codes only, never vectors; completes the
    # quantization suite (IVF routes, SQ8 shrinks, PQ compresses)
    from pero_ocr_spark.operators import similarity

    return similarity.pq_topk(
        _t(spark, sf_dir, "embeddings"), _QUERY_IDS, m=4, ksub=16,
        iters=3, k=5,
    )


@register(
    "events_ewma",
    """
WITH a AS (
  SELECT user_id, list(value ORDER BY ts, event_id) AS vs
  FROM events GROUP BY 1)
SELECT user_id, CAST(len(vs) AS BIGINT) AS n_obs,
       round(vs[len(vs)], 6) AS last_value,
       round(list_reduce(vs, (acc, x) -> 0.3 * x + 0.7 * acc), 6) AS ewma
FROM a
""",
)
def q_events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    # simple exponential smoothing per user: a linear recurrence has no
    # window form — it's a FOLD over the time-ordered value array, so
    # the float op sequence is identical to the serial oracle by
    # construction (exact equality, no rounding discipline needed)
    from pero_ocr_spark.operators import timeseries

    return timeseries.ewma_level(_t(spark, sf_dir, "events"), alpha=0.3)


@register(
    "web_triangles",
    """
WITH cnt AS (SELECT count(*) AS n FROM documents),
j AS (
  SELECT doc_id AS src,
         unnest(generate_series(0, doc_id % 3 + 1)) AS j
  FROM documents),
e AS (
  SELECT src, (src*7 + j*13 + 1) % (SELECT n FROM cnt) AS dst
  FROM j
  WHERE (src*7 + j*13 + 1) % (SELECT n FROM cnt) <> src),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e),
deg AS (
  SELECT v, count(*) AS deg FROM (
    SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und) GROUP BY 1),
lab AS (
  SELECT und.a, und.b, da.deg AS da, db.deg AS db
  FROM und JOIN deg da ON da.v = und.a JOIN deg db ON db.v = und.b),
o AS (
  SELECT CASE WHEN (da, a) < (db, b) THEN a ELSE b END AS u,
         CASE WHEN (da, a) < (db, b) THEN b ELSE a END AS w
  FROM lab),
tri AS (
  SELECT count(*) AS t
  FROM o e1 JOIN o e2 ON e2.u = e1.w
            JOIN o e3 ON e3.u = e1.u AND e3.w = e2.w),
st AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
  FROM deg),
ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM und)
SELECT n_nodes, n_edges, n_wedges,
       CAST(t AS BIGINT) AS n_triangles,
       round(3.0 * t / n_wedges, 6) AS global_clustering
FROM st, ne, tri
""",
)
def q_web_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # triangle count + global clustering coefficient via degree-ordered
    # edge orientation (each triangle counted exactly once; hub-wedge
    # explosion neutralized); integer-exact until the final ratio
    from pero_ocr_spark.operators import linkgraph

    docs = _t(spark, sf_dir, "documents")
    return linkgraph.triangle_stats(docs, n_docs=docs.count())


_LPA_GRAPH_CTE = """
cnt AS (SELECT count(*) AS n FROM documents),
j AS (
  SELECT doc_id AS src,
         unnest(generate_series(0, doc_id % 3 + 1)) AS j
  FROM documents),
e0 AS (
  SELECT src, (src*7 + j*13 + 1) % (SELECT n FROM cnt) AS dst
  FROM j
  WHERE (src*7 + j*13 + 1) % (SELECT n FROM cnt) <> src),
e AS (
  SELECT src AS a, dst AS b FROM e0
  UNION
  SELECT dst AS a, src AS b FROM e0)
"""


def _lpa_round(r: int) -> str:
    p = r - 1
    return f""",
c{r} AS (
  SELECT e.a AS doc_id, l{p}.community AS l, count(*) AS c
  FROM e JOIN l{p} ON l{p}.doc_id = e.b GROUP BY e.a, l{p}.community),
p{r} AS (
  SELECT doc_id, l FROM (
    SELECT doc_id, l,
           row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, l ASC)
             AS rn
    FROM c{r}) WHERE rn = 1),
l{r} AS (
  SELECT l{p}.doc_id, coalesce(p{r}.l, l{p}.community) AS community
  FROM l{p} LEFT JOIN p{r} USING (doc_id))"""


@register(
    "web_components",
    """
WITH RECURSIVE
cnt AS (SELECT count(*) AS n FROM documents),
ch AS (
  SELECT doc_id AS src, doc_id + 1 AS dst FROM documents
  WHERE doc_id % 7 <> 6 AND doc_id + 1 < (SELECT n FROM cnt)),
br AS (
  SELECT doc_id AS src, doc_id + 15 AS dst FROM documents
  WHERE doc_id % 35 = 0 AND doc_id + 15 < (SELECT n FROM cnt)),
e AS (
  SELECT src, dst FROM ch UNION SELECT src, dst FROM br
  UNION SELECT dst, src FROM ch UNION SELECT dst, src FROM br),
reach (doc_id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT reach.doc_id, e.dst FROM reach JOIN e ON e.src = reach.r)
SELECT doc_id, CAST(min(r) AS BIGINT) AS component
FROM reach GROUP BY doc_id
""",
)
def q_web_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    # connected components over the sparse chain+bridge graph via
    # large-star/small-star (O(log n) rounds vs the chains' O(n/7)
    # diameter under plain propagation); oracle = recursive-CTE
    # reachability closure, tractable exactly because components are
    # small (the Spark side never materializes the closure)
    from pero_ocr_spark.operators import linkgraph

    docs = _t(spark, sf_dir, "documents")
    edges = linkgraph.synth_sparse_edges(docs, n_docs=docs.count())
    return linkgraph.connected_components(docs.select("doc_id"), edges)


@register(
    "web_communities_lpa",
    "WITH "
    + _LPA_GRAPH_CTE
    + ",\nl0 AS (SELECT doc_id, doc_id AS community FROM documents)"
    + "".join(_lpa_round(r) for r in (1, 2, 3))
    + "\nSELECT doc_id, CAST(community AS BIGINT) AS community FROM l3",
)
def q_web_communities_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    # synchronous label propagation, 3 rounds, smallest-label tiebreak;
    # oracle = the same rounds unrolled as CTEs (count argmax via
    # row_number ordered by (c DESC, l ASC) = the struct-min trick)
    from pero_ocr_spark.operators import linkgraph

    docs = _t(spark, sf_dir, "documents")
    return linkgraph.label_propagation(docs, n_docs=docs.count(),
                                       iterations=3)


def _kcore_round(r: int, k: int = 3) -> str:
    p = r - 1
    return f""",
d{r} AS (SELECT a, count(*) AS deg FROM e{p} GROUP BY a),
s{r} AS (SELECT a FROM d{r} WHERE deg >= {k}),
e{r} AS (
  SELECT e.a, e.b FROM e{p} e
  JOIN s{r} ka ON ka.a = e.a
  JOIN s{r} kb ON kb.a = e.b)"""


@register(
    "web_kcore",
    """
WITH cnt AS (SELECT count(*) AS n FROM documents),
j AS (
  SELECT doc_id AS src,
         unnest(generate_series(0, doc_id % 3 + 1)) AS j
  FROM documents),
eraw AS (
  SELECT src, (src*7 + j*13 + 1) % (SELECT n FROM cnt) AS dst
  FROM j
  WHERE (src*7 + j*13 + 1) % (SELECT n FROM cnt) <> src),
e0 AS (
  SELECT src AS a, dst AS b FROM eraw
  UNION
  SELECT dst AS a, src AS b FROM eraw)"""
    + "".join(_kcore_round(r) for r in (1, 2, 3, 4, 5, 6))
    + """,
cd AS (SELECT a AS doc_id, CAST(count(*) AS INTEGER) AS core_degree
       FROM e6 GROUP BY a)
SELECT d.doc_id,
       CAST(coalesce(cd.core_degree, 0) AS INTEGER) AS core_degree,
       coalesce(cd.core_degree, 0) >= 3 AS in_core
FROM documents d LEFT JOIN cd USING (doc_id)
""",
)
def q_web_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 3-core peeling to fixpoint; the oracle unrolls SIX peel rounds —
    # peeling is monotone and idempotent past its fixpoint, and the
    # parity test asserts the fixpoint lands within six rounds at the
    # oracle SF, so the unrolled form is exact there
    from pero_ocr_spark.operators import linkgraph

    docs = _t(spark, sf_dir, "documents")
    return linkgraph.kcore_membership(docs, n_docs=docs.count(), k=3)


_TRUSTRANK_ORACLE = """
WITH cnt AS (SELECT count(*) AS n FROM documents),
ns AS (SELECT count(*) AS s FROM documents WHERE doc_id % 50 = 0),
j AS (
  SELECT doc_id AS src,
         unnest(generate_series(0, doc_id % 3 + 1)) AS j
  FROM documents),
e AS (
  SELECT src, (src*7 + j*13 + 1) % (SELECT n FROM cnt) AS dst
  FROM j
  WHERE (src*7 + j*13 + 1) % (SELECT n FROM cnt) <> src),
od AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
ew AS (SELECT e.src, e.dst, od.deg FROM e JOIN od USING (src)),
r0 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 50 = 0 THEN 1.0/(SELECT s FROM ns)
              ELSE 0.0 END AS trust
  FROM documents),
r1 AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 50 = 0 THEN (1.0-0.85)/(SELECT s FROM ns)
              ELSE 0.0 END + 0.85*coalesce(s.inflow, 0.0) AS trust
  FROM documents d LEFT JOIN (
    SELECT ew.dst AS doc_id, sum(r0.trust/ew.deg) AS inflow
    FROM ew JOIN r0 ON r0.doc_id = ew.src GROUP BY ew.dst) s USING (doc_id)),
r2 AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 50 = 0 THEN (1.0-0.85)/(SELECT s FROM ns)
              ELSE 0.0 END + 0.85*coalesce(s.inflow, 0.0) AS trust
  FROM documents d LEFT JOIN (
    SELECT ew.dst AS doc_id, sum(r1.trust/ew.deg) AS inflow
    FROM ew JOIN r1 ON r1.doc_id = ew.src GROUP BY ew.dst) s USING (doc_id)),
r3 AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 50 = 0 THEN (1.0-0.85)/(SELECT s FROM ns)
              ELSE 0.0 END + 0.85*coalesce(s.inflow, 0.0) AS trust
  FROM documents d LEFT JOIN (
    SELECT ew.dst AS doc_id, sum(r2.trust/ew.deg) AS inflow
    FROM ew JOIN r2 ON r2.doc_id = ew.src GROUP BY ew.dst) s USING (doc_id))
SELECT doc_id, round(trust, 9) AS trust,
       round(trust, 9) > 0.0 AS reachable
FROM r3
"""


@register("web_trustrank", _TRUSTRANK_ORACLE)
def q_web_trustrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TrustRank (Gyongyi et al.): PageRank personalized to the vetted
    # seed set doc_id % 50 == 0 — teleport mass goes ONLY to seeds, so
    # trust decays with link distance and spam demotion falls out; same
    # iterated-shuffle shape as web_pagerank, only the teleport CASE
    # differs. Oracle = three unrolled power steps.
    from pero_ocr_spark.operators import linkgraph

    docs = _t(spark, sf_dir, "documents")
    return linkgraph.trustrank(docs, n_docs=docs.count(), iterations=3)


@register(
    "web_bfs_depth",
    """
WITH RECURSIVE
cnt AS (SELECT count(*) AS n FROM documents),
ch AS (
  SELECT doc_id AS src, doc_id + 1 AS dst FROM documents
  WHERE doc_id % 7 <> 6 AND doc_id + 1 < (SELECT n FROM cnt)),
br AS (
  SELECT doc_id AS src, doc_id + 15 AS dst FROM documents
  WHERE doc_id % 35 = 0 AND doc_id + 15 < (SELECT n FROM cnt)),
e AS (
  SELECT src, dst FROM ch UNION SELECT src, dst FROM br
  UNION SELECT dst, src FROM ch UNION SELECT dst, src FROM br),
bfs (doc_id, d) AS (
  SELECT doc_id, 0 FROM documents WHERE doc_id % 50 = 0
  UNION
  SELECT e.dst, bfs.d + 1 FROM bfs JOIN e ON e.src = bfs.doc_id
  WHERE bfs.d < 16),
md AS (SELECT doc_id, min(d) AS d FROM bfs GROUP BY doc_id)
SELECT doc.doc_id,
       CAST(coalesce(md.d, -1) AS BIGINT) AS depth,
       md.d IS NOT NULL AS reachable
FROM documents doc LEFT JOIN md USING (doc_id)
""",
)
def q_web_bfs_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    # frontier-parallel BFS: min hop distance from the seed set over
    # the sparse chain+bridge graph, capped at 16 hops (-1 beyond);
    # settled nodes never re-enter the join; fixpoint = settled-count
    # scalar reduced with each round's lazy localCheckpoint. Oracle =
    # hop-bounded recursive-CTE closure (tractable: components are
    # small at oracle SF; the Spark side never materializes paths).
    from pero_ocr_spark.operators import linkgraph

    docs = _t(spark, sf_dir, "documents")
    edges = linkgraph.synth_sparse_edges(docs, n_docs=docs.count())
    seeds = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id")
    return linkgraph.bfs_depth(docs.select("doc_id"), edges, seeds)


@register(
    "web_host_graph",
    """
WITH cnt AS (SELECT count(*) AS n FROM documents),
j AS (
  SELECT doc_id AS src,
         unnest(generate_series(0, doc_id % 3 + 1)) AS j
  FROM documents),
e AS (
  SELECT src, (src*7 + j*13 + 1) % (SELECT n FROM cnt) AS dst
  FROM j
  WHERE (src*7 + j*13 + 1) % (SELECT n FROM cnt) <> src),
sh AS (SELECT doc_id, source || '.example.com' AS host FROM documents)
SELECT s.host AS src_host, d.host AS dst_host,
       CAST(count(*) AS BIGINT) AS n_links,
       CAST(count(DISTINCT e.src) AS BIGINT) AS n_src_docs,
       s.host = d.host AS intra_host
FROM e JOIN sh s ON s.doc_id = e.src JOIN sh d ON d.doc_id = e.dst
GROUP BY s.host, d.host
""",
)
def q_web_host_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    # host-graph condensation (10^12 pages -> ~10^7 hosts): source host
    # derived IN the edge's source row (no join), one corpus equi-join
    # carries the destination host, then a map-side-combinable agg to
    # the tiny host-by-host table
    from pero_ocr_spark.operators import linkgraph

    docs = _t(spark, sf_dir, "documents")
    return linkgraph.host_graph(docs, n_docs=docs.count())


@register(
    "events_holt",
    """
WITH a AS (
  SELECT user_id, list(value ORDER BY ts, event_id) AS vs
  FROM events GROUP BY 1),
s AS (
  SELECT user_id, len(vs) AS n,
         list_reduce(
           [[vs[1],
             CASE WHEN len(vs) > 1 THEN vs[2] - vs[1]
                  ELSE CAST(0.0 AS DOUBLE) END]]
           || list_transform(vs[2:], v -> [v, CAST(0.0 AS DOUBLE)]),
           (acc, x) -> [0.4*x[1] + 0.6*(acc[1] + acc[2]),
                        0.3*(0.4*x[1] + 0.6*(acc[1] + acc[2]) - acc[1])
                        + 0.7*acc[2]]) AS st
  FROM a)
SELECT user_id, CAST(n AS BIGINT) AS n_obs,
       round(st[1], 6) AS level, round(st[2], 6) AS trend,
       round(st[1] + st[2], 6) AS forecast
FROM s
""",
)
def q_events_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Holt double exponential smoothing (level + trend) per user: a
    # coupled linear recurrence = FOLD with a (l, b) accumulator seeded
    # by the classic init (l=x1, b=x2-x1) — float op sequence identical
    # to the serial oracle BY CONSTRUCTION, exact equality, rounding
    # only on output. Oracle accumulator is a 2-element LIST, not a
    # struct: DuckDB 1.0 list_reduce leaks the already-updated first
    # struct field into the second field's expression from the second
    # step onward (list accumulators evaluate against the old value).
    from pero_ocr_spark.operators import timeseries

    return timeseries.holt_linear(_t(spark, sf_dir, "events"))


@register(
    "events_cusum",
    """
WITH a AS (
  SELECT user_id, list(value ORDER BY ts, event_id) AS vs
  FROM events GROUP BY 1),
m AS (SELECT user_id, vs, list_sort(vs) AS sv, len(vs) AS n FROM a),
med AS (
  SELECT user_id, vs, n,
         CASE WHEN n % 2 = 1 THEN sv[CAST((n+1)//2 AS INTEGER)]
              ELSE (sv[CAST(n//2 AS INTEGER)]
                    + sv[CAST(n//2 AS INTEGER) + 1]) / 2.0 END AS med
  FROM m),
mad0 AS (
  SELECT user_id, vs, n, med,
         list_sort(list_transform(vs, v -> abs(v - med))) AS ma
  FROM med),
mad AS (
  SELECT user_id, vs, n, med,
         CASE WHEN n % 2 = 1 THEN ma[CAST((n+1)//2 AS INTEGER)]
              ELSE (ma[CAST(n//2 AS INTEGER)]
                    + ma[CAST(n//2 AS INTEGER) + 1]) / 2.0 END AS mad
  FROM mad0),
t AS (SELECT user_id, vs, n, mad, med + 0.5 * mad AS target FROM mad),
f AS (
  SELECT user_id, n, mad, target,
         list_reduce(
           [[CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)]]
           || list_transform(vs, v -> [v - target, CAST(0.0 AS DOUBLE)]),
           (acc, x) -> [greatest(0.0, acc[1] + x[1]),
                        greatest(acc[2],
                                 greatest(0.0, acc[1] + x[1]))]) AS st
  FROM t)
SELECT user_id, CAST(n AS BIGINT) AS n_obs, round(target, 6) AS target,
       round(st[2], 6) AS cusum_max,
       mad > 0.0 AND st[2] > 5.0 * mad AS alarm
FROM f
""",
)
def q_events_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one-sided CUSUM drift alarm per user (Page 1954): robust target
    # (median + 0.5*MAD, exact order statistics via the SAME even/odd
    # midpoint formula on both engines), then the (s, s_max) pair as a
    # FOLD with a 2-element array accumulator — exact cross-engine
    # equality by construction; alarm when s_max > 5*MAD
    from pero_ocr_spark.operators import timeseries

    return timeseries.cusum_alarms(_t(spark, sf_dir, "events"))
