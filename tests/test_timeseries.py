"""As-of join (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

from pero_ocr_spark.operators.timeseries import asof_join


def _t(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_latest_at_or_before_per_key(spark):
    left = spark.createDataFrame(
        [(1, _t(10), "L10"), (1, _t(5), "L5"), (2, _t(7), "L7")],
        "k long, ts timestamp_ntz, name string",
    )
    right = spark.createDataFrame(
        [(1, _t(3), 100), (1, _t(5), 101), (1, _t(9), 102), (2, _t(8), 200)],
        "k long, ts timestamp_ntz, rid long",
    )
    out = {r.name: r.rid_asof for r in asof_join(
        left, right, on="k", time="ts", right_cols=("rid",)
    ).collect()}
    # L5 matches the EQUAL-timestamp right row (<= semantics);
    # L7 has no right row at-or-before -> null
    assert out == {"L10": 102, "L5": 101, "L7": None}


def test_asof_tiebreak_on_equal_right_timestamps(spark):
    left = spark.createDataFrame(
        [(1, _t(6), "L")], "k long, ts timestamp_ntz, name string"
    )
    right = spark.createDataFrame(
        [(1, _t(4), 7), (1, _t(4), 9), (1, _t(4), 8)],
        "k long, ts timestamp_ntz, rid long",
    )
    got = asof_join(
        left, right, on="k", time="ts", right_cols=("rid",), tiebreak="rid"
    ).collect()[0]
    assert got.rid_asof == 9  # max tiebreak wins deterministically


def test_range_join_boundaries_and_multibucket(spark):
    from pero_ocr_spark.operators.timeseries import range_join

    # interval [10s, 20s) for key 1; bucket width 4s forces the
    # interval across multiple buckets; points probe both boundaries
    points = spark.createDataFrame(
        [(1, _t(9), "before"), (1, _t(10), "at_start"), (1, _t(15), "inside"),
         (1, _t(19), "last_in"), (1, _t(20), "at_end"), (2, _t(15), "other_key")],
        "k long, ts timestamp_ntz, name string",
    )
    intervals = spark.createDataFrame(
        [(1, _t(10), _t(20), "iv")],
        "k long, s timestamp_ntz, e timestamp_ntz, iv string",
    )
    got = sorted(
        r.name
        for r in range_join(
            points, intervals, on="k", time="ts", start="s", end="e",
            point_cols=("name",), interval_cols=("iv",),
            bucket_width_us=4_000_000,
        ).collect()
    )
    assert got == ["at_start", "inside", "last_in"]


def test_range_join_overlapping_intervals_yield_all_pairs(spark):
    from pero_ocr_spark.operators.timeseries import range_join

    points = spark.createDataFrame(
        [(1, _t(12), "p")], "k long, ts timestamp_ntz, name string"
    )
    intervals = spark.createDataFrame(
        [(1, _t(10), _t(20), "a"), (1, _t(11), _t(13), "b"), (1, _t(13), _t(14), "c")],
        "k long, s timestamp_ntz, e timestamp_ntz, iv string",
    )
    got = sorted(
        r.iv
        for r in range_join(
            points, intervals, on="k", time="ts", start="s", end="e",
            point_cols=("name",), interval_cols=("iv",),
            bucket_width_us=2_000_000,
        ).collect()
    )
    assert got == ["a", "b"]


def test_gap_fill_locf_and_grid(spark):
    from pero_ocr_spark.operators.timeseries import gap_fill

    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        # user 1: obs at hours 0 and 3 -> hours 1,2 are LOCF gaps
        (1, t0, 10.0),
        (1, t0 + dt.timedelta(minutes=10), 11.0),  # later in same hour wins
        (1, t0 + dt.timedelta(hours=3), 40.0),
        # user 2: single obs -> single-row grid, no gaps
        (2, t0 + dt.timedelta(hours=5), 7.5),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = gap_fill(ev).toPandas().sort_values(
        ["user_id", "bucket_ts"]
    ).reset_index(drop=True)

    u1 = out[out.user_id == 1]
    assert len(u1) == 4  # hours 0..3 inclusive
    assert list(u1["filled_value"]) == [11.0, 11.0, 11.0, 40.0]
    assert list(u1["is_gap"]) == [False, True, True, False]
    assert list(u1["n_obs"]) == [2, 0, 0, 1]
    u2 = out[out.user_id == 2]
    assert len(u2) == 1 and not u2["is_gap"].iloc[0]


def test_asof_rejects_time_column_as_tiebreak(spark):
    # the time column is carried but rows sharing a timestamp are by
    # definition equal on it — accepting it was a silent no-op
    import pytest

    left = spark.createDataFrame(
        [(1, _t(6), "L")], "k long, ts timestamp_ntz, name string"
    )
    right = spark.createDataFrame(
        [(1, _t(4), 7)], "k long, ts timestamp_ntz, rid long"
    )
    with pytest.raises(ValueError, match="right_cols"):
        asof_join(
            left, right, on="k", time="ts", right_cols=("rid",),
            tiebreak="ts",
        )


def test_gap_fill_non_hourly_freq_alignment(spark):
    # 30-minute grid: observations land on 30-minute buckets aligned
    # with the grid (the pre-round-5 code hardcoded hourly buckets, so
    # any other freq silently forward-filled real observations as gaps)
    from pero_ocr_spark.operators.timeseries import gap_fill

    t0 = dt.datetime(2024, 1, 1, 0, 40)  # -> bucket 00:30
    rows = [
        (1, t0, 10.0),
        (1, t0 + dt.timedelta(minutes=95), 20.0),  # 02:15 -> bucket 02:00
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = gap_fill(ev, freq="30 minutes").toPandas().sort_values(
        "bucket_ts"
    ).reset_index(drop=True)
    assert list(out["bucket_ts"]) == [
        dt.datetime(2024, 1, 1, 0, 30),
        dt.datetime(2024, 1, 1, 1, 0),
        dt.datetime(2024, 1, 1, 1, 30),
        dt.datetime(2024, 1, 1, 2, 0),
    ]
    assert list(out["filled_value"]) == [10.0, 10.0, 10.0, 20.0]
    assert list(out["is_gap"]) == [False, True, True, False]

    import pytest

    with pytest.raises(ValueError, match="fixed-width"):
        gap_fill(ev, freq="1 month")


def test_funnel_stage_semantics(spark):
    from pero_ocr_spark.operators.timeseries import funnel

    t = lambda h: dt.datetime(2024, 1, 1, h)
    rows = [
        # user 1: full ordered funnel
        (1, "signup", t(1)), (1, "view", t(2)),
        (1, "click", t(3)), (1, "purchase", t(4)),
        # user 2: purchase BEFORE click -> stage stops at click
        (2, "signup", t(1)), (2, "view", t(2)),
        (2, "purchase", t(3)), (2, "click", t(4)),
        # user 3: signup only
        (3, "signup", t(1)),
        # user 4: no signup -> absent even with later steps
        (4, "view", t(1)), (4, "click", t(2)),
        # user 5: view at EXACTLY signup time does not count (strict >)
        (5, "signup", t(1)), (5, "view", t(1)),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    out = funnel(ev, ("signup", "view", "click", "purchase"))
    got = {r["user_id"]: r for r in out.collect()}
    assert set(got) == {1, 2, 3, 5}
    assert got[1]["funnel_stage"] == 4
    assert got[2]["funnel_stage"] == 3
    assert got[2]["t_purchase"] is None
    assert got[3]["funnel_stage"] == 1
    assert got[5]["funnel_stage"] == 1 and got[5]["t_view"] is None


def test_retention_cohorts_triangle(spark):
    from pero_ocr_spark.operators.timeseries import retention_cohorts

    d = lambda day: dt.datetime(2024, 1, day)  # Jan 1 2024 is a Monday
    rows = [
        (1, d(1)), (1, d(8)), (1, d(16)),   # cohort w0, active w0,w1,w2
        (2, d(2)), (2, d(3)),               # cohort w0, active w0 only
        (3, d(9)),                          # cohort w1
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {
        (r["cohort_week"].day, r["week_offset"]): r["n_users"]
        for r in retention_cohorts(ev).collect()
    }
    assert out == {(1, 0): 2, (1, 1): 1, (1, 2): 1, (8, 0): 1}


def test_rolling_window_range_frame(spark):
    from pero_ocr_spark.operators.timeseries import rolling_window_stats

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (10, 1, t0, 1.0),
        (11, 1, t0 + dt.timedelta(hours=12), 2.5),
        # exactly 24h after event 11: still inside ITS window, but
        # event 10 (36h earlier) has fallen out
        (12, 1, t0 + dt.timedelta(hours=36), 4.0),
        (13, 2, t0, 100.0),  # other key never leaks in
    ]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])
    got = {r["event_id"]: r for r in rolling_window_stats(ev).collect()}
    assert got[10]["rolling_n"] == 1 and got[10]["rolling_sum"] == 1.0
    assert got[11]["rolling_n"] == 2 and got[11]["rolling_sum"] == 3.5
    assert got[12]["rolling_n"] == 2 and got[12]["rolling_sum"] == 6.5
    assert got[12]["rolling_max"] == 4.0
    assert got[13]["rolling_n"] == 1 and got[13]["rolling_sum"] == 100.0


def _serial_holt(vs, a=0.4, b_=0.3):
    l = vs[0]
    b = vs[1] - vs[0] if len(vs) > 1 else 0.0
    for x in vs[1:]:
        nl = a * x + (1 - a) * (l + b)
        b = b_ * (nl - l) + (1 - b_) * b
        l = nl
    return round(l, 6), round(b, 6)


def test_holt_matches_serial_recurrence(spark):
    from pero_ocr_spark.operators.timeseries import holt_linear

    series = {
        1: [3.1, 3.36, 3.61, 45.24, 53.37, 12.0],
        2: [10.0, 12.0, 14.0, 16.0],   # perfect trend: b stays 2
        3: [7.5],                       # n=1: level=x1, trend=0
    }
    rows = [
        (u, _t(i), u * 100 + i, v)
        for u, vs in series.items()
        for i, v in enumerate(vs)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_id long, value double"
    )
    got = {r.user_id: r for r in holt_linear(df).collect()}
    for u, vs in series.items():
        l, b = _serial_holt(vs)
        assert got[u].n_obs == len(vs)
        assert got[u].level == l
        assert got[u].trend == b
        assert got[u].forecast == round(
            _unrounded_holt(vs)[0] + _unrounded_holt(vs)[1], 6
        )
    assert got[2].trend == 2.0 and got[2].forecast == 18.0
    assert got[3].level == 7.5 and got[3].trend == 0.0


def _unrounded_holt(vs, a=0.4, b_=0.3):
    l = vs[0]
    b = vs[1] - vs[0] if len(vs) > 1 else 0.0
    for x in vs[1:]:
        nl = a * x + (1 - a) * (l + b)
        b = b_ * (nl - l) + (1 - b_) * b
        l = nl
    return l, b


def _serial_cusum(vs, k=0.5, h=5.0):
    sv = sorted(vs)
    n = len(sv)
    med = sv[(n - 1) // 2] if n % 2 == 1 else (sv[n // 2 - 1] + sv[n // 2]) / 2.0
    ma = sorted(abs(v - med) for v in vs)
    mad = ma[(n - 1) // 2] if n % 2 == 1 else (ma[n // 2 - 1] + ma[n // 2]) / 2.0
    target = med + k * mad
    s = s_max = 0.0
    for x in vs:
        s = max(0.0, s + (x - target))
        s_max = max(s_max, s)
    return target, s_max, mad > 0.0 and s_max > h * mad


def test_cusum_matches_serial_scan_and_flags_level_shift(spark):
    from pero_ocr_spark.operators.timeseries import cusum_alarms

    series = {
        # noisy base then a late drift in the MINORITY of points: the
        # median/MAD target stays on the base regime, so the CUSUM sum
        # clears 5*MAD -> alarm (a 50/50 shift would move the median
        # itself and correctly stay silent)
        1: [4.9, 5.1] * 6 + [25.0] * 4,
        2: [5.0, 5.1, 4.9, 5.0, 5.05],   # stable -> no alarm
        3: [7.0, 7.0, 7.0],              # MAD = 0 -> alarm gated off
    }
    rows = [
        (u, _t(i), u * 100 + i, v)
        for u, vs in series.items()
        for i, v in enumerate(vs)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_id long, value double"
    )
    got = {r.user_id: r for r in cusum_alarms(df).collect()}
    for u, vs in series.items():
        target, s_max, alarm = _serial_cusum(vs)
        assert got[u].n_obs == len(vs)
        assert got[u].target == round(target, 6)
        assert got[u].cusum_max == round(s_max, 6)
        assert got[u].alarm == alarm
    assert got[1].alarm and not got[2].alarm and not got[3].alarm


def _serial_hw(values, phases, m=24, a=0.3, b_=0.05, g=0.2):
    """Serial replica of holt_winters' exact arithmetic: tick-space
    seeds, then the fold with python floats (same op order)."""
    import math

    tk = [math.floor(v * 10000.0 + 0.5) for v in values]
    xs = [t / 10000.0 for t in tk]
    s1, s2 = sum(tk[:m]), sum(tk[m:2 * m])
    lv = s1 / (10000.0 * m)
    b = (s2 - s1) / (10000.0 * m * m)
    s = []
    for p in range(m):
        idx = [i for i in range(2 * m) if phases[i] == p]
        if not idx:
            s.append(0.0)
        else:
            s.append(sum(tk[i] for i in idx) / (len(idx) * 10000.0) - lv)
    for i in range(2 * m, len(xs)):
        p = phases[i]
        ln = a * (xs[i] - s[p]) + (1 - a) * (lv + b)
        bn = b_ * (ln - lv) + (1 - b_) * b
        sn = g * (xs[i] - ln) + (1 - g) * s[p]
        lv, b, s[p] = ln, bn, sn
    return lv, b, s


def test_holt_winters_matches_serial_replica(spark):
    from pero_ocr_spark.operators.timeseries import holt_winters

    base = dt.datetime(2024, 3, 1)
    rows = []
    # type A: 80 hourly buckets with gaps (skip t%13==5 past the
    # 2-season seed window) and one DOUBLE-event hour (tick summing)
    hours_a = [t for t in range(80) if not (t > 48 and t % 13 == 5)]
    vals_a, phases_a = [], []
    for t in hours_a:
        v = 50.0 + (t * 7 % 13) + (t % 24) * 0.25
        ts = base + dt.timedelta(hours=t)
        if t == 60:
            rows.append(("a", ts, v - 20.0))
            rows.append(("a", ts + dt.timedelta(minutes=30), 20.0))
        else:
            rows.append(("a", ts, v))
        vals_a.append(v)
        phases_a.append(ts.hour)
    # type B: constant series — trend, seasonals, amplitude all 0
    for t in range(60):
        rows.append(("b", base + dt.timedelta(hours=t), 42.5))
    # type C: too short for the 2-season seed — excluded
    for t in range(30):
        rows.append(("c", base + dt.timedelta(hours=t), 1.0))
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp_ntz, value double"
    )
    got = {r.group_key: r for r in holt_winters(df).collect()}
    assert set(got) == {"a", "b"}

    lv, b, s = _serial_hw(vals_a, phases_a)
    nxt = (phases_a[-1] + 1) % 24
    ra = got["a"]
    assert ra.n_obs == len(vals_a)
    assert ra.level == round(lv, 6)
    assert ra.trend == round(b, 6)
    assert ra.seasonal_next == round(s[nxt], 6)
    assert ra.forecast == round(lv + b + s[nxt], 6)
    assert ra.seasonal_amplitude == round(max(s) - min(s), 6)

    rb = got["b"]
    assert rb.level == 42.5 and rb.trend == 0.0
    assert rb.seasonal_next == 0.0 and rb.seasonal_amplitude == 0.0
    assert rb.forecast == 42.5
