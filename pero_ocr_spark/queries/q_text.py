"""Text-analysis tier: language ID, quality, tokenization, LM scoring, media columns.

Split out of the monolithic queries.py (round 5); the package
__init__ imports tier modules in dependency order, so registration
order is deterministic and the registry machinery lives in _base.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pero_ocr_spark import corpus
from pero_ocr_spark.operators import extract
from pero_ocr_spark.queries._base import (  # noqa: F401
    QueryFn, _EXTRACTED_CTE, _REGISTRY, _scratch, _t, register,
)
from pero_ocr_spark.queries._ctes import _DUCK_POLY, _EVAL_SCORED_CTE, _KN_ORACLE, _bpe_oracle_ctes, _eval_scored  # noqa: F401


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


_BACKOFF_ORACLE = """
WITH ws AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
tr AS (
  SELECT doc_id, w[i] AS w1, w[i+1] AS w2, w[i+2] AS w3
  FROM ws, LATERAL unnest(generate_series(1, len(w) - 2)) t(i)
  WHERE len(w) >= 3),
bg AS (
  SELECT w[i] AS w1, w[i+1] AS w2
  FROM ws, LATERAL unnest(generate_series(1, len(w) - 1)) t(i)
  WHERE doc_id % 2 = 0 AND len(w) >= 2),
c1 AS (
  SELECT wd, count(*) AS n1
  FROM (SELECT unnest(string_split(text, ' ')) AS wd
        FROM documents WHERE doc_id % 2 = 0)
  GROUP BY 1),
tot AS (SELECT sum(n1) AS n_tokens, count(*) AS vsize FROM c1),
c2 AS (SELECT w1, w2, count(*) AS n2 FROM bg GROUP BY 1, 2),
c3 AS (SELECT w1, w2, w3, count(*) AS n3
       FROM tr WHERE doc_id % 2 = 0 GROUP BY 1, 2, 3),
terms AS (
  SELECT h.doc_id,
         round(log10(CASE
           WHEN t3.n3 IS NOT NULL THEN t3.n3 / t2a.n2
           WHEN t2b.n2 IS NOT NULL
             THEN CAST(0.4 AS DOUBLE) * t2b.n2 / u2.n1
           ELSE CAST(0.4 AS DOUBLE) * CAST(0.4 AS DOUBLE)
                * (coalesce(u3.n1, 0) + 1)
                / (tot.n_tokens + tot.vsize)
         END), 9) AS lp
  FROM (SELECT * FROM tr WHERE doc_id % 2 = 1) h
  LEFT JOIN c3 t3 ON t3.w1 = h.w1 AND t3.w2 = h.w2 AND t3.w3 = h.w3
  LEFT JOIN c2 t2a ON t2a.w1 = h.w1 AND t2a.w2 = h.w2
  LEFT JOIN c2 t2b ON t2b.w1 = h.w2 AND t2b.w2 = h.w3
  LEFT JOIN c1 u2 ON u2.wd = h.w2
  LEFT JOIN c1 u3 ON u3.wd = h.w3
  CROSS JOIN tot)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
       round(CAST(sum(CAST(lp AS DECIMAL(24,9))) AS DOUBLE) / count(*), 6)
         AS avg_log10_score
FROM terms GROUP BY doc_id
"""


@register("lm_stupid_backoff", _BACKOFF_ORACLE)
def q_lm_stupid_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Trigram stupid backoff (Brants et al. EMNLP 2007) trained on the
    # even-doc half, scoring the odd half — the count-only LM built for
    # distributed web-scale training (no normalization pass). The
    # trigram table hash-joins the held-out stream on its natural key;
    # the bigram table materializes once and feeds both the context and
    # the backoff join; unigrams + totals broadcast. All three backoff
    # branches fire on the held-out split.
    from pero_ocr_spark.operators import textstats

    return textstats.stupid_backoff_scores(
        _t(spark, sf_dir, "documents"), alpha=0.4
    )


@register(
    "quality_classifier_nb",
    _EVAL_SCORED_CTE + """,
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
),
tr AS (
  SELECT k.doc_id, k.t, s.label
  FROM tok k JOIN scored s USING (doc_id) WHERE k.doc_id % 2 = 0
),
cnt AS (
  SELECT t,
         CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS cp,
         CAST(sum(CASE WHEN NOT label THEN 1 ELSE 0 END) AS BIGINT) AS cn
  FROM tr GROUP BY t
),
sc AS (
  SELECT CAST(sum(cp) AS DOUBLE) + count(*) AS zp,
         CAST(sum(cn) AS DOUBLE) + count(*) AS zn
  FROM cnt
),
pr AS (
  SELECT round(ln(CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS DOUBLE)
                / sum(CASE WHEN NOT label THEN 1 ELSE 0 END)), 6) AS prior
  FROM scored WHERE doc_id % 2 = 0
),
ho AS (SELECT doc_id, t FROM tok WHERE doc_id % 2 = 1),
term AS (
  SELECT ho.doc_id,
         CAST(round(ln((coalesce(cnt.cp, 0) + 1.0) / sc.zp)
                    - ln((coalesce(cnt.cn, 0) + 1.0) / sc.zn), 6)
              AS DECIMAL(28,6)) AS lp
  FROM ho LEFT JOIN cnt USING (t), sc
),
agg AS (
  SELECT doc_id,
         CAST(sum(lp) + (SELECT CAST(prior AS DECIMAL(28,6)) FROM pr)
              AS DOUBLE) AS nb_score
  FROM term GROUP BY doc_id
)
SELECT a.doc_id, a.nb_score, a.nb_score > 0 AS predicted, s.label,
       (a.nb_score > 0) = s.label AS correct
FROM agg a JOIN scored s USING (doc_id)
""",
)
def q_quality_classifier_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # trainable quality tier: multinomial NB trained on the even half
    # against the heuristic gate (the CCNet/fastText bootstrap), odd
    # half scored held-out; training is ONE token-count agg, scoring
    # ONE doc_id shuffle; per-term LLRs quantized at 6 dp (NOT 9 —
    # JVM/libm ln() ulp flipped a 9-dp round on this corpus) and
    # DECIMAL-summed, the sum IS the score
    from pero_ocr_spark.operators import textstats

    docs = _t(spark, sf_dir, "documents")
    labels = textstats.quality_score(docs).select(
        "doc_id", (F.col("quality") >= 0.75).alias("label")
    )
    return textstats.nb_quality_classifier(docs, labels)


@register(
    "text_fix_mojibake",
    """
SELECT doc_id,
       text || ' café naïve №' || CAST(doc_id % 7 AS VARCHAR) AS text_fixed,
       ((doc_id*69069 + 12345) % 2147483647) % 100 < 33 AS was_mojibake
FROM documents
""",
)
def q_text_fix_mojibake(spark: SparkSession, sf_dir: str) -> DataFrame:
    # encoding repair at the ingest edge: ~a third of the corpus
    # arrives UTF-8-read-as-latin-1 (deterministic residue); detection
    # (marker scan) + exact inverse transcode run ENTIRELY in codegen
    # (JVM charset builtins) — the oracle states the fixpoint: every
    # doc ends clean, corrupted ones flagged
    from pero_ocr_spark.operators import textstats

    docs = _t(spark, sf_dir, "documents")
    clean = F.concat(
        F.col("text"), F.lit(" café naïve №"),
        (F.col("doc_id") % 7).cast("string"),
    )
    # NOT mod 3: both LCG constants divide by 3 (the documented
    # degenerate-residue trap) — mod 100 keeps the mixing honest
    corrupted = F.pmod(
        F.col("doc_id") * 69_069 + 12_345, F.lit(2147483647)
    ) % 100 < 33
    wire = docs.select(
        "doc_id",
        F.when(
            corrupted, F.decode(F.encode(clean, "UTF-8"), "ISO-8859-1")
        ).otherwise(clean).alias("text"),
    )
    return textstats.fix_mojibake(wire).select(
        "doc_id", "text_fixed", "was_mojibake"
    )


@register(
    "text_textrank_summary",
    """
WITH w0 AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         CAST((len(string_split(text, ' ')) - 1)//12 + 1 AS INT) AS m
  FROM documents
),
s1 AS (
  SELECT doc_id, ws, m,
         list_transform(generate_series(1, m),
           i -> list_distinct(list_slice(ws, (i-1)*12 + 1, (i-1)*12 + 12)))
           AS sents
  FROM w0
),
s2 AS (
  SELECT doc_id, ws, m,
         list_transform(generate_series(1, m), i ->
           list_transform(generate_series(1, m), j ->
             CASE WHEN i = j THEN 0.0
                  ELSE CAST(len(list_intersect(sents[i], sents[j]))
                            AS DOUBLE) END)) AS w
  FROM s1
),
s3 AS (
  SELECT doc_id, ws, m, w,
         list_transform(generate_series(1, m),
           j -> list_reduce(list_prepend(0.0, w[j]), (a, b) -> a + b))
           AS deg
  FROM s2
),
r1 AS (
  SELECT doc_id, ws, m, w, deg,
         list_transform(generate_series(1, m), i ->
           0.15/m + 0.85 * list_reduce(list_prepend(0.0,
             list_transform(generate_series(1, m), j ->
               CASE WHEN deg[j] > 0
                    THEN (w[j][i] / deg[j]) * (1.0/m)
                    ELSE 0.0 END)), (a, b) -> a + b)) AS r
  FROM s3
),
r2 AS (
  SELECT doc_id, ws, m, w, deg,
         list_transform(generate_series(1, m), i ->
           0.15/m + 0.85 * list_reduce(list_prepend(0.0,
             list_transform(generate_series(1, m), j ->
               CASE WHEN deg[j] > 0
                    THEN (w[j][i] / deg[j]) * r[j]
                    ELSE 0.0 END)), (a, b) -> a + b)) AS r
  FROM r1
),
fin AS (
  SELECT doc_id, ws, m,
         list_transform(r, x -> round(x, 6)) AS r
  FROM r2
),
pos AS (
  SELECT doc_id, ws, m, r,
         CAST(list_position(r, list_max(r)) AS INT) AS p
  FROM fin
)
SELECT doc_id, m AS n_sents, p - 1 AS top_ord, r[p] AS top_score,
       array_to_string(list_slice(ws, (p-1)*12 + 1, (p-1)*12 + 12), ' ')
         AS summary
FROM pos
""",
)
def q_text_textrank_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # extractive summarization with the sentence graph, degrees, and
    # two damped power-iteration steps ALL in-row (HOF expressions):
    # a graph algorithm with zero shuffles at any corpus size; rank
    # doubles are bit-identical cross-engine (no transcendentals,
    # identical fold order), rounded only at output
    from pero_ocr_spark.operators import textstats

    return textstats.textrank_summary(_t(spark, sf_dir, "documents"))


@register(
    "corpus_dataset_card",
    """
WITH q AS (
  SELECT doc_id, source, text,
         string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n
  FROM documents),
sc AS (
  SELECT doc_id, source, text, n,
         CAST(round((len(list_distinct(w)) * 1.0 / n
              + (CASE WHEN n BETWEEN 50 AND 5000 THEN 1.0 ELSE 0.5 END)
              + (CASE WHEN list_sum(list_transform(w, x -> length(x)))
                      * 1.0 / n BETWEEN 3.0 AND 10.0
                 THEN 1.0 ELSE 0.5 END)) / 3.0, 6) AS DECIMAL(10,6)) AS q6
  FROM q)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_texts,
       round(1.0 - count(DISTINCT text) * 1.0 / count(*), 6) AS dup_rate,
       round(CAST(sum(q6) AS DOUBLE) / count(*), 6) AS mean_quality,
       round(quantile_cont(n, 0.5), 6) AS p50_tokens,
       CAST(sum(CASE WHEN n < 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_short
FROM sc GROUP BY source
""",
)
def q_corpus_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the dataset card: per-source docs/tokens/exact-dup rate/mean
    # structural quality/median length/short-doc count in ONE
    # map-side-combinable aggregation over the scan (quality rides
    # 6-dp DECIMAL sums so partition order can't flip the mean; the
    # median interpolates identically in both engines on integer
    # token counts); the output is |sources| rows — the artifact a
    # data team publishes with every corpus release
    from pero_ocr_spark.operators import textstats

    docs = _t(spark, sf_dir, "documents")
    q = textstats.quality_score(docs).select(
        "doc_id", F.col("quality").cast("decimal(10,6)").alias("q6")
    )
    base = docs.select(
        "doc_id", "source", "text",
        F.size(F.split("text", " ")).alias("n"),
    ).join(q, "doc_id")
    return base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n").cast("long").alias("n_tokens"),
        F.count_distinct("text").alias("n_distinct_texts"),
        F.round(
            F.lit(1.0) - F.count_distinct("text") / F.count(F.lit(1)), 6
        ).alias("dup_rate"),
        F.round(
            F.sum("q6").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_quality"),
        F.round(F.percentile("n", F.lit(0.5)), 6).alias("p50_tokens"),
        F.sum((F.col("n") < 50).cast("long")).alias("n_short"),
    )


@register(
    "text_readability",
    """
WITH q AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
  FROM documents),
s AS (
  SELECT doc_id, n,
         CAST(ceil(n / 12.0) AS BIGINT) AS n_sent,
         CAST(list_sum(list_transform(w,
           x -> greatest(len(regexp_extract_all(x, '[aeiouy]+')), 1)))
           AS BIGINT) AS syl
  FROM q)
SELECT doc_id, n AS n_words, n_sent AS n_sentences, syl AS n_syllables,
       round(206.835 - 1.015 * (n * 1.0 / n_sent) - 84.6 * (syl * 1.0 / n), 6)
         AS flesch
FROM s
""",
)
def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Flesch Reading Ease on the 12-word pseudo-sentence model:
    # integer counts, two identically-parenthesized divisions, one
    # 6-dp round — zero shuffles, codegen only
    from pero_ocr_spark.operators import textstats

    return textstats.readability_scores(_t(spark, sf_dir, "documents"))
