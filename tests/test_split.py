"""Golden-vector ports: calendar splitting (W5), the flagship rollup pipeline
(E3/usage shape), timeutil scalars, and legacy group-by (W6).
Vectors from timeseries_functions_tests.py:1181-1289,
parser_tests.py:287-522 (meter28 daily/weekly sums) and
analysis_functions_tests.py:49-68."""

import pytest

from tests.helpers import assert_series_equal, rows
from tsengine.core import from_ts_lists
from tsengine.operators.increments import increments
from tsengine.operators.resample import distribute
from tsengine.operators.split import group_by_legacy, split, split_agg
from tsengine.timeutil import (
    TimeRange,
    bucket_epoch_expr,
    column_range,
    time_interval_beginning,
    time_interval_end,
)

MONTH_STARTS = [
    1372629600,  # 07-2013
    1375308000, 1377986400, 1380578400, 1383260400, 1385852400,
    1388530800,  # 01-2014
    1391209200, 1393628400, 1396303200, 1398895200, 1401573600,
    1404165600,  # 07-2014
]


def test_split_1_month(spark):
    df = from_ts_lists(spark, [[(1393624800 + 3600 * i, float(i)) for i in range(100)]])
    out = split(df, period="month")
    got = rows(out, cols=("bucket", "epoch", "value"))
    # first two rows belong to February (minute-0 shift: 1393628400 = Mar 1
    # 00:00 Madrid belongs to February), rest to March
    feb = [g for g in got if g[1] in (1393624800, 1393628400)]
    assert all(b == feb[0][0] for b, _, _ in feb) and len(feb) == 2
    mar = [g for g in got if g[1] > 1393628400]
    assert len(mar) == 98 and len({b for b, _, _ in mar}) == 1
    assert feb[0][0] < mar[0][0]


def test_split_2_hour(spark):
    df = from_ts_lists(spark, [[(i, 0.0) for i in range(1401573900, 1404165900, 300)]])
    out = split(df, period="hour")
    got = rows(out, cols=("bucket", "epoch"))
    # 12 rows per hour bucket; a row at exactly H:00 belongs to H-1
    from collections import Counter

    c = Counter(b for b, _ in got)
    assert set(c.values()) == {12}
    for b, e in got:
        if e % 3600 == 0:
            assert b == e - 3600
        else:
            assert b == 3600 * (e // 3600)


def test_split_5_dst_months(spark):
    # timeseries_functions_tests.py:1258-1289: 2013-07..2014-07 month starts in
    # Europe/Madrid incl. DST transitions
    df = from_ts_lists(spark, [[(i, 0.0) for i in range(1372629900, 1404165900, 300)]])
    out = split(df, period="month")
    buckets = sorted({r["bucket"] for r in out.select("bucket").distinct().collect()})
    assert buckets == MONTH_STARTS[:12]
    # each month's rows span (start, next_start] — boundary epoch belongs left
    got = rows(out, cols=("bucket", "epoch"))
    for b, e in got:
        i = MONTH_STARTS.index(b)
        assert MONTH_STARTS[i] < e <= MONTH_STARTS[i + 1]


def test_ap_7_meter28_daily_sums(spark):
    from tests.meter28 import DAILY_EPOCHS, DAILY_SUMS, INDEX_LIST, VALUE_LIST

    df = from_ts_lists(spark, [list(zip(INDEX_LIST, [float(v) for v in VALUE_LIST]))])
    pipeline = increments(distribute(df, seconds=3600, e_from=1398895201, e_to=1401573600))
    out = split_agg(pipeline, period="day", agg="sum")
    got = sorted((r["epoch"], round(r["value"], 6)) for r in out.collect())
    exp = sorted(zip(DAILY_EPOCHS, [round(float(v), 6) for v in DAILY_SUMS]))
    assert got == exp


def test_meter28_weekly_sums_vs_oracle(spark):
    # test_ap_9's weekly goldens come from the live-DB fixture (variable 2419
    # has more points than the meter28 subset, parser_tests.py:525-551), so
    # the weekly pipeline is pinned against the pure-pandas oracle instead.
    from oracle import reference_oracle as ro
    from tests.meter28 import INDEX_LIST, VALUE_LIST

    ts = list(zip(INDEX_LIST, [float(v) for v in VALUE_LIST]))
    exp = ro.usage_split_sum(ts, "week", seconds=3600, e_from=1398895201, e_to=1401573600)

    df = from_ts_lists(spark, [ts])
    pipeline = increments(distribute(df, seconds=3600, e_from=1398895201, e_to=1401573600))
    out = split_agg(pipeline, period="week", agg="sum")
    got = sorted((r["epoch"], round(r["value"], 6)) for r in out.collect())
    assert got == sorted((e, round(v, 6)) for e, v in exp)
    # the weekly stamps land on Monday-00:00 boundaries (shift quirk: the
    # boundary epoch is the last row of the PREVIOUS week) or the series end
    assert [e for e, _ in got][:-1] == [
        e for e, _ in got if (e - 1399240800) % 604800 == 0 and e != got[-1][0]
    ]


# ---- scalar calendar functions (au:182-237, 319-395) ----

def test_time_interval_beginning_shift_quirk():
    # minute-0 belongs to the previous period
    assert time_interval_beginning("month", epoch_ref=1393628400) == 1391209200  # Mar 1 00:00 -> Feb
    assert time_interval_beginning("month", epoch_ref=1393628460) == 1393628400  # Mar 1 00:01 -> Mar
    assert time_interval_beginning("hour", epoch_ref=1393628400) == 1393624800
    # minute-truncation first: the whole first MINUTE of an hour belongs to
    # the previous hour (au:190 + au:224-227)
    assert time_interval_beginning("hour", epoch_ref=1393628401) == 1393624800
    assert time_interval_beginning("hour", epoch_ref=1393628460) == 1393628400


def test_time_interval_beginning_months_dst():
    for i, start in enumerate(MONTH_STARTS[:-1]):
        # one second into the month maps to its own start
        assert time_interval_beginning("month", epoch_ref=start + 61) == start
        # the boundary epoch maps to the previous month
        nxt = MONTH_STARTS[i + 1]
        assert time_interval_beginning("month", epoch_ref=nxt) == start


def test_time_interval_end():
    assert time_interval_end("month", epoch_ref=1393628460) == 1396303200
    assert time_interval_end("hour", epoch_ref=1393628400) == 1393628400
    assert time_interval_end("hour", epoch_ref=1393628401) == 1393628400
    assert time_interval_end("hour", epoch_ref=1393628460) == 1393632000


def test_bucket_expr_matches_scalar(spark):
    import random

    rnd = random.Random(42)
    epochs = [rnd.randrange(1356994800, 1404165600) for _ in range(300)]
    epochs += [1393628400, 1388530800, 1372629600, 1383260400]  # boundaries
    for period in ("year", "month", "week", "day", "hour"):
        df = from_ts_lists(spark, [[(e, 0.0) for e in sorted(set(epochs))]])
        out = df.select("epoch", bucket_epoch_expr("epoch", period).alias("b")).collect()
        for r in out:
            assert r["b"] == time_interval_beginning(period, epoch_ref=r["epoch"]), (
                period,
                r["epoch"],
            )


# ---- column_range (au:60-160) ----

def test_column_range_from_to():
    r = column_range({"from": 100, "to": 200}, now=1000, int_type="left_open")
    assert r == TimeRange(lo=101, hi=200, limit=31536000)
    r = column_range({"from": 100, "to": 200}, now=1000, int_type="closed")
    assert r == TimeRange(lo=100, hi=200, limit=31536000)
    r = column_range({"from": 100, "to": 200}, now=1000, int_type="open")
    assert r == TimeRange(lo=101, hi=199, limit=31536000)


def test_column_range_defaults():
    # only `to` -> one week back (au:148-152)
    r = column_range({"to": 1000000}, now=2000000, int_type="closed")
    assert r == TimeRange(lo=1000000 - 604800, hi=1000000, limit=604800)
    # nothing -> last value (au:158-159)
    r = column_range({}, now=777, int_type="closed")
    assert r == TimeRange(lo=None, hi=777, limit=1)
    # count only
    r = column_range({"count": 5}, now=777, int_type="closed")
    assert r == TimeRange(lo=None, hi=777, limit=5)


def test_column_range_this_hour():
    # test_ap_18 context: now=1401524000 truncated by caller; this_hour closed
    now = 1401523200  # 300*int(1401524000/300)? get_variable truncates to time_int
    r = column_range({"range": "this_hour"}, now=now, int_type="closed")
    assert r.lo == time_interval_beginning("hour", epoch_ref=now)
    assert r.hi == time_interval_end("hour", epoch_ref=now)


# ---- legacy group_by (af:114-205) ----

TS_1 = [(1356994800, 1.0), (1388530800, 0.0), (1391209200, 1.0), (1391295600, 0.0),
        (1391986800, 1.0), (1392073200, 0.0), (1393282800, 1.0), (1393628400, 0.0)]


def test_tsgb_month(spark):
    df = from_ts_lists(spark, [TS_1])
    out = group_by_legacy(df, period="month")
    groups: dict[int, list] = {}
    for r in sorted(out.collect(), key=lambda r: (r["bucket"], r["epoch"])):
        groups.setdefault(r["bucket"], []).append((r["epoch"], r["value"]))
    ordered = [groups[k] for k in sorted(groups)]
    expected = [
        [(1356994800, 1.0)],
        [(1359673200, None)], [(1362092400, None)], [(1364767200, None)],
        [(1367359200, None)], [(1370037600, None)], [(1372629600, None)],
        [(1375308000, None)], [(1377986400, None)], [(1380578400, None)],
        [(1383260400, None)],
        [(1388530800, 0.0)],
        [(1388530800, 0.0), (1391209200, 1.0)],
        [(1391209200, 1.0), (1391295600, 0.0), (1391986800, 1.0),
         (1392073200, 0.0), (1393282800, 1.0), (1393628400, 0.0)],
    ]
    assert ordered == expected


def test_tsgb_hour_executor_placeholders(spark):
    # Hour-period placeholders are generated executor-side (sequence explode,
    # VERDICT r2 #3) — pin (a) value parity with the scalar-calendar walk
    # across the 2014-03-30 Madrid spring-forward, (b) the explode in the
    # plan, (c) laziness: building the plan must not run the old driver-side
    # collect.
    e0 = 1396130460  # 2014-03-29 23:21 UTC, before the DST jump
    e1 = e0 + 8 * 3600  # 8 hours later, after the jump
    df = from_ts_lists(spark, [[(e0, 1.0), (e1, 2.0)]])

    before_jobs = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    out = group_by_legacy(df, period="hour")
    after_jobs = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    assert len(after_jobs) == len(before_jobs), "hour path must be fully lazy"
    plan = out._jdf.queryExecution().executedPlan().toString().lower()
    assert "explode" in plan and "sequence" in plan

    got = sorted(
        (r["bucket"], r["epoch"], r["value"]) for r in out.collect()
    )
    # scalar-calendar oracle: replicate the af:190-200 walk with
    # time_interval_end (the exact code the executor-side sequence replaced)
    lo_p = time_interval_beginning("hour", epoch_ref=e0)
    hi_p = time_interval_beginning("hour", epoch_ref=e1)
    expected = [(lo_p, e0, 1.0)]
    # gap upper side is the SEED's period (the one just below the pivot),
    # which is non-empty — placeholders stop strictly before it
    cur = time_interval_end("hour", epoch_ref=lo_p + 60)
    while cur < hi_p - 3600:
        expected.append((cur, cur, None))
        cur = time_interval_end("hour", epoch_ref=cur + 60)
    # interior crossing: (pivot=hi_p, cur_value) into the period starting at
    # hi_p and the one below it
    expected += [(hi_p - 3600, hi_p, 2.0), (hi_p, hi_p, 2.0), (hi_p, e1, 2.0)]
    assert got == sorted(expected)


def test_tsgb_year(spark):
    df = from_ts_lists(spark, [TS_1])
    out = group_by_legacy(df, period="year")
    groups: dict[int, list] = {}
    for r in sorted(out.collect(), key=lambda r: (r["bucket"], r["epoch"])):
        groups.setdefault(r["bucket"], []).append((r["epoch"], r["value"]))
    ordered = [groups[k] for k in sorted(groups)]
    expected = [
        [(1356994800, 1.0), (1388530800, 0.0)],
        [(1388530800, 0.0), (1391209200, 1.0), (1391295600, 0.0), (1391986800, 1.0),
         (1392073200, 0.0), (1393282800, 1.0), (1393628400, 0.0)],
    ]
    assert ordered == expected


def test_tsgb_calendar_placeholders_executor_side(spark):
    """day/week/month/year placeholders: (a) fully lazy — building the plan
    runs no Spark job (the r3-era driver collect is gone), (b) the calendar
    sequence explode is in the plan, (c) value parity with the scalar
    af:190-200 walk across a multi-year gap straddling BOTH 2021 Madrid DST
    transitions (519 day placeholders in the small case; variable-length
    months; a leap February)."""
    from datetime import datetime
    from zoneinfo import ZoneInfo

    tz = ZoneInfo("Europe/Madrid")

    def ep(y, m, d, h=0):
        return int(datetime(y, m, d, h, tzinfo=tz).timestamp())

    pts = [(ep(2021, 1, 15, 10), 1.0), (ep(2021, 4, 2, 5), 2.0),
           (ep(2023, 11, 20, 23), 3.0)]
    df = from_ts_lists(spark, [pts])

    for period in ("day", "week", "month", "year"):
        before = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
        out = group_by_legacy(df, period=period)
        after = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
        assert len(after) == len(before), f"{period} path must be fully lazy"
        plan = out._jdf.queryExecution().executedPlan().toString().lower()
        assert "explode" in plan and "sequence" in plan

        got_ph = sorted(r["bucket"] for r in out.collect() if r["value"] is None)

        # scalar oracle: placeholders run strictly between the prev point's
        # period and the period BELOW the next point's period — that one is
        # non-empty (it receives the interior-crossing seed row, af:140-150).
        # No point here sits on a boundary, so eff == plain period beginning,
        # and re-applying time_interval_beginning to the boundary epoch gives
        # the previous period via the minute-0 shift.
        exp = []
        for (e_lo, _), (e_hi, _) in zip(pts, pts[1:]):
            lo_p = time_interval_beginning(period, epoch_ref=e_lo)
            hi_p = time_interval_beginning(
                period, epoch_ref=time_interval_beginning(period, epoch_ref=e_hi)
            )
            cur = time_interval_end(period, epoch_ref=lo_p + 60)
            while cur < hi_p:
                exp.append(cur)
                cur = time_interval_end(period, epoch_ref=cur + 60)
        assert got_ph == sorted(exp), period


def test_group_by_legacy_midnight_dst_tz_warns(spark):
    """ADVICE r04: calendar-period group_by_legacy in a zone whose DST
    transition falls at local midnight must WARN (placeholder epochs on the
    transition day can shift by the DST offset); the default Madrid path
    and sub-day periods stay silent."""
    import warnings

    df = from_ts_lists(spark, [[(1_600_000_000, 1.0), (1_620_000_000, 2.0)]])
    with pytest.warns(UserWarning, match="local midnight"):
        group_by_legacy(df, period="month", tz_name="America/Santiago").columns
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        group_by_legacy(df, period="month").columns  # Madrid default: silent
        group_by_legacy(df, period="hour", tz_name="America/Santiago").columns
