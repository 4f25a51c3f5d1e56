"""Golden-vector ports: inner_* aggregates, last(n), count_state_change,
histogram.  Vectors from timeseries_functions_tests.py:517-789 and
analysis_functions_tests.py:74-90, 460-502."""

import math

import numpy as np
import pytest

from tests.helpers import assert_series_equal, rows
from tsengine.core import TsError, from_ts_lists
from tsengine.operators.aggregates import (
    check_merge_collisions,
    count_state_change,
    gaussian_smooth,
    histogram,
    inner_max,
    inner_mean,
    inner_min,
    inner_std,
    inner_sum,
    last,
)


def test_is_1(spark):
    df = from_ts_lists(
        spark,
        [
            [(i, 1.0) for i in range(10)],
            [(i, 3.0) for i in range(10, 15)],
        ],
    )
    out = inner_sum(df)
    assert_series_equal(out, [(0, 9, 10.0), (1, 14, 15.0)])
    check_merge_collisions(out)


def test_is_2_collision(spark):
    df = from_ts_lists(spark, [[(9, 1.0)], [(9, 2.0)]])
    with pytest.raises(TsError, match="Non unique index"):
        check_merge_collisions(inner_sum(df))


def test_is_5_large(spark):
    df = from_ts_lists(
        spark,
        [
            [(1390000000 + 300 * i, float(i - 1)) for i in range(1, 1001)],
            [(1390300000 + 300 * i, 1.0) for i in range(1, 1001)],
            [(1390600000 + 600 * i, 0.0) for i in range(1, 10001)],
        ],
    )
    assert_series_equal(
        inner_sum(df),
        [(0, 1390300000, 499500.0), (1, 1390600000, 1000.0), (2, 1396600000, 0.0)],
    )


def test_imax_imin(spark):
    df = from_ts_lists(
        spark,
        [[(1390000000 + 300 * i, math.cos(math.pi * (i - 1) / 1000)) for i in range(1, 1001)]],
    )
    assert_series_equal(inner_max(df), [(0, 1390300000, 1.0)])
    assert_series_equal(inner_min(df), [(0, 1390300000, math.cos(math.pi * 999 / 1000))])


def test_imean_1(spark):
    df = from_ts_lists(
        spark,
        [[(1390000000 + 300 * i, v) for i, v in zip(range(1, 11), [1] * 9 + [11])]],
    )
    assert_series_equal(inner_mean(df), [(0, 1390003000, 2.0)])


def test_istd_2_population(spark):
    # tf:554 pins np.std (ddof=0, POPULATION std) — test :730-742
    df = from_ts_lists(spark, [[(1390000000 + 300 * i, float(i - 1)) for i in range(1, 1001)]])
    std = float(np.sqrt(np.sum([(i - 499.5) ** 2 for i in range(1000)]) / 1000))
    assert_series_equal(inner_std(df), [(0, 1390300000, std)], tol=1e-12)


def test_last_1(spark):
    df = from_ts_lists(
        spark,
        [[(1390000000 + 300 * i, v) for i, v in zip(range(1, 11), [1.0] * 9 + [11.0])]],
    )
    assert_series_equal(last(df), [(0, 1390003000, 11.0)])


def test_last_n_and_short_series(spark):
    df = from_ts_lists(spark, [[(1, 1.0), (2, 2.0), (3, 3.0)], [(10, 5.0)]])
    out = last(df, number=2)
    # series shorter than n returned whole (tf:574-575)
    assert_series_equal(out, [(0, 2, 2.0), (0, 3, 3.0), (1, 10, 5.0)])


# ---- count_state_change (af:221-244) ----

TS_1 = [(1356994800, 1.0), (1388530800, 0.0), (1391209200, 1.0), (1391295600, 0.0),
        (1391986800, 1.0), (1392073200, 0.0), (1393282800, 1.0), (1393628400, 0.0)]


def test_csc(spark):
    df = from_ts_lists(spark, [TS_1])
    # values render as '1.0'/'0.0' as doubles; reference compares str() of the
    # raw cell — use the same textual form
    assert_series_equal(count_state_change(df, "1.0"), [(0, 1356994800, 3.0)])
    assert_series_equal(count_state_change(df, "0.0"), [(0, 1356994800, 4.0)])
    assert_series_equal(count_state_change(df, "a"), [(0, 1356994800, 0.0)])


def test_csc_two_series(spark):
    df = from_ts_lists(spark, [TS_1[:4], TS_1[4:]])
    assert_series_equal(
        count_state_change(df, "1.0"), [(0, 1356994800, 1.0), (1, 1391986800, 1.0)]
    )
    assert_series_equal(
        count_state_change(df, "0.0"), [(0, 1356994800, 2.0), (1, 1391986800, 2.0)]
    )


# ---- histogram (af:460-502) ----

def test_histogram(spark):
    df = from_ts_lists(spark, [[(i, float(i)) for i in range(100)]])
    out = histogram(df, lower_limit=0, upper_limit=100, n_ints=10)
    got = rows(out, cols=("bucket", "lo", "hi", "cnt"))
    assert got == [(i, float(10 * i), float(10 * (i + 1)), 10) for i in range(10)]


def test_histogram_empty_buckets_and_bounds(spark):
    df = from_ts_lists(spark, [[(1, 5.0), (2, 5.5), (3, 99.0), (4, 100.0), (5, -1.0)]])
    out = histogram(df, lower_limit=0, upper_limit=100, n_ints=4)
    got = rows(out, cols=("bucket", "cnt"))
    # v=100 excluded (v < upper), v=-1 excluded (v >= lower)
    assert got == [(0, 2), (1, 0), (2, 0), (3, 1)]


def test_gaussian_smooth_constant():
    frec = [[float(i), float(i + 1), 5] for i in range(10)]
    out = gaussian_smooth(frec)
    for lo, hi, v in out:
        assert abs(v - 5.0) < 1e-12
