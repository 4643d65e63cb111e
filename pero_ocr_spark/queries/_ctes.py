"""Oracle CTE fragments and helpers shared by more than one tier module.

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


_DUCK_POLY = (
    "list_reduce(list_prepend(0::BIGINT, "
    "list_transform(string_split({col}, ''), c -> ascii(c)::BIGINT)), "
    "(a, b) -> (a * 31 + b) % 2147483647)"
)


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


_CMS_NIB = (
    "(CASE WHEN ascii(substr(h, {p}, 1)) >= 97 "
    "THEN ascii(substr(h, {p}, 1)) - 87 "
    "ELSE ascii(substr(h, {p}, 1)) - 48 END)"
)


def _h48_sql() -> str:
    expr = "CAST(0 AS BIGINT)"  # 48-bit fold overflows INT32
    for i in range(1, 13):
        expr = f"({expr}) * 16 + " + _CMS_NIB.format(p=str(i))
    return expr
