"""Golden-vector ports: increments (W2) and legacy meter totals (A8).
Vectors from timeseries_functions_tests.py:178-304 and
analysis_functions_tests.py:116-145."""

import pytest

from tests.helpers import assert_series_equal
from tsengine.core import TsError, from_ts_lists
from tsengine.operators.increments import increments, meter_increments_total


def test_inc_1(spark):
    epochs = [1393628100, 1393628400, 1393628900, 1393629500, 1393629600,
              1393629700, 1393630000, 1393630500, 1393630700, 1393631000]
    vals = [i * 500.0 for i in range(5)] + [i * 100.0 for i in range(5)]
    df = from_ts_lists(spark, [list(zip(epochs, vals))])
    out = increments(df)
    exp_vals = [500, 500, 500, 500, 0, 100, 100, 100, 100]
    assert_series_equal(out, [(0, e, float(v)) for e, v in zip(epochs[1:], exp_vals)])


def test_inc_4_decreasing_validation(spark):
    df = from_ts_lists(spark, [list(zip(range(1, 11), [1, 10, 20, 30, 0, -10, -20, 0, -15, -25]))])
    with pytest.raises(TsError, match="value greater than reset value"):
        increments(df, monotony="decreasing")


def test_inc_8_max_value(spark):
    df = from_ts_lists(spark, [list(zip(range(1, 11), [1, 10, 20, 30, 0, 15, 30, 50, 2, 5]))])
    out = increments(df, max_value=50)
    exp = [9, 10, 10, 20, 15, 15, 20, 2, 3]
    assert_series_equal(out, [(0, e, float(v)) for e, v in zip(range(2, 11), exp)])


def test_inc_9_reset_validation(spark):
    df = from_ts_lists(spark, [list(zip(range(1, 11), [1, 10, 20, 30, 0, 15, 30, 50, 2, 5]))])
    with pytest.raises(TsError, match="value lower than reset_value"):
        increments(df, max_value=50, reset_value=5)


def test_inc_10_decreasing(spark):
    df = from_ts_lists(spark, [list(zip(range(1, 11), [1, 10, 20, 30, 0, 15, 30, 50, 2, 5]))])
    # reference test_inc_10: monotony=decreasing, max_value=0, reset_value=50.
    # max_value=0 is falsy so validation skips the max check (tf:364) but the
    # diff still applies it (tf:385-391).
    out = increments(df, monotony="decreasing", max_value=0, reset_value=50)
    exp = [-41, -40, -40, -30, -35, -35, -30, -48, -47]
    assert_series_equal(out, [(0, e, float(v)) for e, v in zip(range(2, 11), exp)])


def test_inc_11_non_monotonous(spark):
    df = from_ts_lists(spark, [list(zip(range(1, 11), [1, 10, 20, 0, -15, 100, 30, 50, 2, 5]))])
    out = increments(df, monotony="non-monotonous", max_value=0, reset_value=50)
    exp = [9, 10, -20, -15, 115, -70, 20, -48, 3]
    assert_series_equal(out, [(0, e, float(v)) for e, v in zip(range(2, 11), exp)])


def test_ap_5_meter28_increments(spark):
    # parser_tests.py:241-284: distribute(3600) then increments
    from tests.meter28 import INDEX_LIST, VALUE_LIST
    from tsengine.operators.resample import distribute

    df = from_ts_lists(spark, [list(zip(INDEX_LIST, [float(v) for v in VALUE_LIST]))])
    out = increments(distribute(df, seconds=3600, e_from=1398895201, e_to=1401573600))
    got = dict(sorted((r["epoch"], r["value"]) for r in out.collect()))
    assert len(got) == 743
    assert abs(got[1398963600] - 365.11) < 1e-9
    assert abs(got[1399114800] - 519.31) < 1e-9
    assert abs(got[1401519600] - 1386.35) < 1e-9
    assert got[1398902400] == 0.0
    assert got[1401573600] == 0.0
    assert abs(sum(got.values()) - (15513.87 - 5706.74)) < 1e-6


# ---- legacy compute_meter_increments (af:305-336) ----

TS_7 = [(1356994800, 1.0), (1388530800, 0.0), (1391209200, 10.0), (1391295600, 0.0),
        (1391986800, 20.0), (1392073200, 0.0), (1393282800, 30.0), (1393628400, 0.0)]


def test_cmi_1(spark):
    df = from_ts_lists(spark, [TS_7])
    out = meter_increments_total(df)
    # af_tests:127-128: total 60 (final pair (30,0) skipped by the loop quirk)
    assert_series_equal(out, [(0, 1356994800, 60.0)])


def test_cmi_3(spark):
    df = from_ts_lists(spark, [TS_7[:4], TS_7[4:]])
    out = meter_increments_total(df)
    # af_tests:144-145
    assert_series_equal(out, [(0, 1356994800, 10.0), (1, 1391986800, 30.0)])
