"""Embedding similarity / ANN / quantization tier queries.

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
from pero_ocr_spark.queries._ctes import _kmeans_cte  # noqa: F401


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


def _binary_oracle(dims: int = 64, cands: int = 40, k: int = 5) -> str:
    """DuckDB mirror of operators.similarity.binary_topk: identical
    32-bit sign-pattern words (shift <= 31 — DuckDB raises on
    ``1::BIGINT << 63``), identical fixed-order integer Hamming sum,
    identical (hamming, id) candidate cut and (cosine desc, id) rerank.
    dims is 64 across every testdata SF (the Spark side derives it at
    runtime); `|`/`<<`/xor fully parenthesized — DuckDB parses the
    bitwise operators at equal precedence."""
    from pero_ocr_spark.operators.similarity import BIN_WORD_BITS

    n_words = (dims + BIN_WORD_BITS - 1) // BIN_WORD_BITS
    words = []
    for w in range(n_words):
        lo, hi = w * BIN_WORD_BITS, min((w + 1) * BIN_WORD_BITS, dims)
        words.append(
            f"list_reduce(list_transform(generate_series({lo + 1}, {hi}), "
            f"i -> (CASE WHEN emb[i] > 0 THEN ((1::BIGINT) << (i - {lo + 1})) "
            f"ELSE (0::BIGINT) END)), (a, b) -> (a | b)) AS code_{w}"
        )
    ham = " + ".join(
        f"CAST(bit_count(xor(q.code_{w}, n.code_{w})) AS BIGINT)"
        for w in range(n_words)
    )
    ids = ", ".join(str(i) for i in _QUERY_IDS)
    return f"""
{_COS_E_CTE}
, c AS (
  SELECT vec_id, emb, nrm, {", ".join(words)} FROM e),
h AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         {ham} AS hamming
  FROM c q JOIN c n ON n.vec_id <> q.vec_id
  WHERE q.vec_id IN ({ids})),
cand AS (
  SELECT query_id, neighbor_id, hamming,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY hamming, neighbor_id) AS cr
  FROM h),
r AS (
  SELECT cand.query_id, cand.neighbor_id, cand.hamming,
         round(list_dot_product(q.emb, n.emb) / (q.nrm * n.nrm), 6) AS cosine
  FROM cand
  JOIN e q ON q.vec_id = cand.query_id
  JOIN e n ON n.vec_id = cand.neighbor_id
  WHERE cand.cr <= {cands})
SELECT query_id, neighbor_id, hamming, cosine, CAST(rn AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM r)
WHERE rn <= {k}
"""


@register("similarity_ann_binary", _binary_oracle())
def q_similarity_ann_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # binary (1-bit sign) quantization + Hamming candidate scan + exact
    # cosine rerank — the fourth quantization leg (IVF routes, SQ8
    # shrinks, PQ compresses, BINARY collapses to dim/8 bytes); the
    # corpus scan shuffles two BIGINT words per vector, never the
    # floats, and the rerank equi-joins full vectors for only
    # cands x |queries| candidate rows
    from pero_ocr_spark.operators import similarity

    return similarity.binary_topk(
        _t(spark, sf_dir, "embeddings"), _QUERY_IDS, k=5, cands=40,
    )


@register(
    "embedding_outlier_scores",
    _kmeans_cte() + """,
fd AS (
  SELECT a.vec_id, a.cell,
         round(list_sum(list_transform(generate_series(1, 64),
           i -> (CAST(e.embedding[i] AS DOUBLE) - c.cent[i])
                * (CAST(e.embedding[i] AS DOUBLE) - c.cent[i]))), 6) AS dist
  FROM a2 a JOIN e USING (vec_id) JOIN c2 c ON c.cell = a.cell),
st AS (
  SELECT cell, count(*) AS n,
         sum(CAST(dist AS DECIMAL(18,6))) AS s1,
         sum(CAST(dist AS DECIMAL(18,6)) * CAST(dist AS DECIMAL(18,6))) AS s2
  FROM fd GROUP BY cell)
SELECT f.vec_id, CAST(f.cell AS BIGINT) AS cell, f.dist,
       CASE WHEN (CAST(s2 AS DOUBLE)
                  - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                 / CAST(n AS DOUBLE) > 0
            THEN round((f.dist - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                       / sqrt((CAST(s2 AS DOUBLE)
                               - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                                 / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)), 6)
            ELSE 0.0 END AS z,
       CASE WHEN (CAST(s2 AS DOUBLE)
                  - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                 / CAST(n AS DOUBLE) > 0
            THEN round((f.dist - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                       / sqrt((CAST(s2 AS DOUBLE)
                               - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                                 / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)), 6)
                 > 1.5
            ELSE FALSE END AS is_outlier
FROM fd f JOIN st USING (cell)
""",
)
def q_embedding_outlier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    # curation complement of SemDeDup: within-cell z-score of the
    # squared L2 to the assigned k-means centroid; moments sum exact
    # decimals, the remaining divide/sqrt are IEEE-correctly-rounded,
    # zero-variance cells disable the rule
    from pero_ocr_spark.operators import similarity

    return similarity.kmeans_outlier_scores(
        _t(spark, sf_dir, "embeddings"), k=8, iters=3
    )
