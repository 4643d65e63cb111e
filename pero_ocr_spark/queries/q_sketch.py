"""Probabilistic-sketch tier: HLL, CMS, KMV, quantile histograms.

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
from pero_ocr_spark.queries._ctes import _CMS_NIB, _h48_sql  # noqa: F401


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
