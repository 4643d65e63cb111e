"""Events analytics tier: time series, streaming, sessionization.

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


def _holt_winters_oracle(m: int = 24) -> str:
    """DuckDB mirror of operators.timeseries.holt_winters: identical
    tick-space seeds (integer sums — order-independent, one exact
    division each), identical fold expression tree (L duplicated
    textually inside B and S exactly as the Spark Column tree
    duplicates it), flat list accumulator (DuckDB 1.0 list_reduce
    leaks updated STRUCT fields between field expressions)."""
    m2 = 2 * m
    acc_len = m + 2
    sidx = "acc[CAST(x[2] AS INT) + 3]"
    L = f"(0.3 * (x[1] - {sidx}) + 0.7 * (acc[1] + acc[2]))"
    B = f"(0.05 * ({L} - acc[1]) + 0.95 * acc[2])"
    S = f"(0.2 * (x[1] - {L}) + 0.8 * {sidx})"
    nxt = f"((ph[len(ph)] + 1) % {m}) + 3"
    return f"""
WITH hb AS (
  SELECT event_type, date_trunc('hour', ts) AS hb,
         SUM(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) AS tick
  FROM events GROUP BY 1, 2),
a AS (
  SELECT event_type,
         list(tick ORDER BY hb) AS tk,
         list(CAST(extract(hour FROM hb) AS INT) ORDER BY hb) AS ph
  FROM hb GROUP BY 1),
f AS (SELECT * FROM a WHERE len(tk) > {m2}),
sd AS (
  SELECT event_type, tk, ph, tk[1:{m2}] AS tk2m, ph[1:{m2}] AS ph2m,
         CAST(list_sum(tk[1:{m}]) AS DOUBLE) / (10000.0 * {m}) AS l0,
         CAST(list_sum(tk[{m + 1}:{m2}]) - list_sum(tk[1:{m}]) AS DOUBLE)
           / (10000.0 * {m} * {m}) AS b0
  FROM f),
sc AS (
  SELECT event_type, tk, ph, l0, b0,
         list_transform(generate_series(0, {m - 1}), p ->
           CASE WHEN list_sum(list_transform(ph2m,
                       q -> CASE WHEN q = p THEN 1 ELSE 0 END)) = 0
                THEN 0.0
                ELSE CAST(list_sum(list_transform(generate_series(1, {m2}),
                         i -> CASE WHEN ph2m[i] = p THEN tk2m[i]
                              ELSE 0 END)) AS DOUBLE)
                     / (CAST(list_sum(list_transform(ph2m,
                           q -> CASE WHEN q = p THEN 1 ELSE 0 END))
                         AS DOUBLE) * 10000.0)
                     - l0 END) AS seeds
  FROM sd),
fl AS (
  SELECT event_type, tk, ph,
         list_reduce(
           [[l0, b0] || seeds] ||
           list_transform(generate_series({m2 + 1}, len(tk)),
             i -> [CAST(tk[i] AS DOUBLE) / 10000.0, CAST(ph[i] AS DOUBLE)]),
           (acc, x) -> list_transform(generate_series(1, {acc_len}), j ->
             CASE WHEN j = 1 THEN {L}
                  WHEN j = 2 THEN {B}
                  WHEN j = (CAST(x[2] AS INT) + 3) THEN {S}
                  ELSE acc[j] END)) AS st
  FROM sc)
SELECT event_type AS group_key, CAST(len(tk) AS BIGINT) AS n_obs,
       round(st[1], 6) AS level, round(st[2], 6) AS trend,
       round(st[{nxt}], 6) AS seasonal_next,
       round(st[1] + st[2] + st[{nxt}], 6) AS forecast,
       round(list_max(st[3:{acc_len}]) - list_min(st[3:{acc_len}]), 6)
         AS seasonal_amplitude
FROM fl
"""


@register("events_holt_winters", _holt_winters_oracle())
def q_events_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Holt-Winters additive seasonal smoothing (level + trend + 24
    # hour-of-day seasonals) over hourly-bucketed per-type series:
    # bucket sums ride exact 1e-4 integer ticks, the two-season seed
    # is all integer-sum arithmetic, and the coupled recurrence is a
    # FOLD with a flat 26-double accumulator — float op sequence
    # identical to the serial oracle BY CONSTRUCTION
    from pero_ocr_spark.operators import timeseries

    return timeseries.holt_winters(_t(spark, sf_dir, "events"))


@register(
    "events_stream_left_outer",
    """
WITH v AS (SELECT user_id, ts AS vts FROM events WHERE event_type = 'view'),
c AS (SELECT user_id AS c_user, ts AS cts FROM events
      WHERE event_type = 'click'),
wm AS (SELECT least((SELECT max(vts) FROM v), (SELECT max(cts) FROM c))
              - INTERVAL 12 HOUR - INTERVAL 6 HOUR - INTERVAL 1 HOUR
              AS cutoff),
vv AS (SELECT v.user_id, v.vts FROM v, wm WHERE v.vts <= wm.cutoff),
j AS (
  SELECT vv.user_id, vv.vts, c.cts
  FROM vv LEFT JOIN c
    ON c.c_user = vv.user_id
   AND c.cts >= vv.vts AND c.cts <= vv.vts + INTERVAL 6 HOUR)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_views,
       CAST(sum(CASE WHEN cts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_matched,
       CAST(sum(CASE WHEN cts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orphans
FROM j GROUP BY 1
""",
)
def q_events_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # stream-stream LEFT OUTER interval join: views that never
    # converted are emitted with nulls BY watermark-driven state
    # eviction — the abandonment/funnel-drop query as a stream. The
    # reportable window is cut at global_watermark - lag - margin (all
    # computable from the data), which is exactly what makes the
    # result deterministic and the batch LEFT JOIN the oracle.
    from pero_ocr_spark.streaming import events as ev

    return ev.view_click_left_outer_streaming(spark, sf_dir)
