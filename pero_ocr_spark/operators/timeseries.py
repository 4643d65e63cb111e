"""Time-series joins over the events table.

The engine's event side (telemetry, crawl logs, user events) needs the
canonical time-series operator relational engines lack: the AS-OF join
— for every left row, the single latest right row at-or-before its
timestamp, per key. Databases ship it natively (DuckDB ``ASOF JOIN``,
kdb ``aj``); Spark has no built-in, and the naive formulations are
scale-broken: an inequality theta-join explodes to a near-cross
product per key, and "join then filter max" re-aggregates the whole
pair space.

``asof_join`` uses the union-window technique instead: tag both
inputs, union them, and run ONE ``last(..., ignorenulls)`` window per
carried column over (key, time) order. Cost is a single hash shuffle
on the key + a per-key sort — the same exchange a groupBy would pay,
regardless of how many right rows precede each left row. Right rows
at exactly the left timestamp are visible (ASOF's ``<=``), enforced
by sorting the right side first within equal timestamps.

Scale notes: partition count follows the session shuffle setting; key
skew (one hot user/host) is bounded by the window being a running
carry, not a buffer — state is one row per carried column. At 10^12
rows the sort dominates, exactly as in any ASOF implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    time: str,
    right_cols: tuple[str, ...],
    suffix: str = "_asof",
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row: the latest right row with
    ``right.time <= left.time`` and equal ``on`` key.

    Returns all left columns plus ``<col><suffix>`` for each of
    ``right_cols`` and ``<time><suffix>`` (null when no right row
    precedes). ``tiebreak`` orders right rows sharing a timestamp
    (later sorts last and wins) — required for determinism if
    (on, time) is not unique on the right.
    """
    carried = [*right_cols, time]
    if tiebreak is not None and tiebreak not in carried:
        raise ValueError("tiebreak must be one of right_cols")
    r = right.select(
        F.col(on),
        F.col(time),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(c + suffix) for c in carried],
    )
    l = left.withColumn("_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    order = [F.col(time).asc(), F.col("_side").asc()]
    if tiebreak is not None:
        # orders RIGHT rows sharing a timestamp (left rows are null
        # here and their relative order cannot affect the carry)
        order.append(F.col(tiebreak + suffix).asc_nulls_first())
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "*",
        *[
            F.last(c + suffix, ignorenulls=True).over(w).alias("_f_" + c)
            for c in carried
        ],
    )
    out_cols = [F.col(c) for c in left.columns] + [
        F.col("_f_" + c).alias(c + suffix) for c in carried
    ]
    return filled.filter(F.col("_side") == 1).select(*out_cols)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    time: str,
    start: str,
    end: str,
    point_cols: tuple[str, ...],
    interval_cols: tuple[str, ...],
    bucket_width_us: int = 3_600_000_000,
) -> DataFrame:
    """All (point, interval) pairs with equal key and
    ``start <= point.time < end`` — the interval-containment join.

    Spark plans a raw inequality join as a per-key nested loop
    (broadcast-nested-loop or cartesian), quadratic in the hot key.
    This is the bucketized formulation every range-join implementation
    uses (e.g. the Databricks range-join hint): intervals replicate to
    each fixed-width time bucket they overlap, points map to exactly
    ONE bucket, and the pair space collapses to an equi-join on
    (key, bucket) plus the exact predicate. Replication factor is
    ceil(interval_len / bucket_width) + 1 ≈ 2 for widths matched to
    typical interval length; a point is in one bucket, so no
    deduplication is needed.

    Timestamps may be TIMESTAMP or TIMESTAMP_NTZ (cast under the
    pinned UTC session). Returns ``point_cols`` + ``interval_cols``.
    """
    w = bucket_width_us
    p_us = F.unix_micros(F.col(time).cast("timestamp"))
    s_us = F.unix_micros(F.col(start).cast("timestamp"))
    e_us = F.unix_micros(F.col(end).cast("timestamp"))

    p = points.select(
        F.col(on).alias("_k"), *point_cols, p_us.alias("_t"),
        F.floor(p_us / w).alias("_b"),
    )
    i = intervals.select(
        F.col(on).alias("_k"), *interval_cols, s_us.alias("_s"), e_us.alias("_e"),
    ).filter(F.col("_e") > F.col("_s")).select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col("_s") / w), F.floor((F.col("_e") - 1) / w)
            )
        ).alias("_b"),
    )
    joined = p.join(i, ["_k", "_b"]).filter(
        (F.col("_t") >= F.col("_s")) & (F.col("_t") < F.col("_e"))
    )
    return joined.select(*point_cols, *interval_cols)
