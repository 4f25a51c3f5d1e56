"""Golden-vector ports: scalar ops and pairwise joins.
Vectors from timeseries_functions_tests.py:309-511 (scalar) and 794-1175
(addition/product/division incl. scalar broadcast and ÷0 drops)."""

import pytest

from tests.helpers import assert_series_equal
from tsengine.core import TsError, from_ts_lists
from tsengine.operators.arithmetic import (
    addition,
    clean_duplicated,
    delete_critical_values,
    division,
    product,
    round_values,
    scalar_division,
    scalar_power,
    scalar_product,
    scalar_sub,
    scalar_sum,
    subtraction,
    truncate_values,
)

EPOCHS10 = [1393628100, 1393628400, 1393628900, 1393629500, 1393629600,
            1393629700, 1393630000, 1393630500, 1393630700, 1393631000]


def test_scp_1(spark):
    vals = [500.0] * 5 + [100.0] * 5
    df = from_ts_lists(spark, [list(zip(EPOCHS10, vals))])
    out = scalar_product(df, number=2.0)
    assert_series_equal(out, [(0, e, v * 2) for e, v in zip(EPOCHS10, vals)])


def test_scdiv_3_negative(spark):
    df = from_ts_lists(spark, [[(i, -1.0) for i in range(10)]])
    assert_series_equal(scalar_division(df, number=-5), [(0, i, 0.2) for i in range(10)])


def test_scsub_multi_series(spark):
    df = from_ts_lists(
        spark,
        [[(i, -1.0) for i in range(10)], [(i, -float(i)) for i in range(10)]],
    )
    out = scalar_sub(df, number=-5)
    exp = [(0, i, 4.0) for i in range(10)] + [(1, i, 5.0 - i) for i in range(10)]
    assert_series_equal(out, exp)


def test_scpow_3_int_truncation(spark):
    # tf:705: exponent truncated to int — k=-2.5 acts as -2 (test :496-511)
    df = from_ts_lists(
        spark,
        [[(i, 2.0) for i in range(10)], [(i, -1.0) for i in range(10)]],
    )
    out = scalar_power(df, number=-2.5)
    exp = [(0, i, 0.25) for i in range(10)] + [(1, i, 1.0) for i in range(10)]
    assert_series_equal(out, exp)


def test_scs_6(spark):
    df = from_ts_lists(
        spark,
        [[(i, -float(i)) for i in range(10)], [(i, 0.0) for i in range(10)]],
    )
    out = scalar_sum(df, number=10)
    exp = [(0, i, 10.0 - i) for i in range(10)] + [(1, i, 10.0) for i in range(10)]
    assert_series_equal(out, exp)


# ---- pairwise (ts_pair_operation, tf:727-756) ----

def test_add_2(spark):
    a = from_ts_lists(spark, [[(i, 1.0) for i in range(10)]])
    b = from_ts_lists(spark, [[(i, 3.0) for i in range(1, 6)]])
    out = addition(a, b)
    assert_series_equal(out, [(0, i, 4.0) for i in range(1, 6)])


def test_add_5_positional(spark):
    a = from_ts_lists(
        spark,
        [
            [(1390000000 + 300 * i, float(i)) for i in range(1000)],
            [(1390000000 + 300 * i, 2.0 * (i - 1000)) for i in range(1000, 2000)],
        ],
    )
    b = from_ts_lists(
        spark,
        [
            [(1390000000 + 300 * i, float(i)) for i in range(1000)],
            [(1390000000 + 300 * i, -float(i - 1000)) for i in range(1000, 2000)],
        ],
    )
    out = addition(a, b)
    exp = [(0, 1390000000 + 300 * i, 2.0 * i) for i in range(1000)]
    exp += [(1, 1390000000 + 300 * i, float(i - 1000)) for i in range(1000, 2000)]
    assert_series_equal(out, exp)


def test_prod_1_scalar_broadcast(spark):
    # tf:743-750: single-row side acts as a scalar over the other's epochs
    a = from_ts_lists(spark, [[(i, 500.0) for i in range(5)]])
    b = from_ts_lists(spark, [[(0, 2.0)]])
    out = product(a, b)
    assert_series_equal(out, [(0, i, 1000.0) for i in range(5)])


def test_prod_2_both_single_same_epoch(spark):
    a = from_ts_lists(spark, [[(0, 2.0)]])
    b = from_ts_lists(spark, [[(0, 2.0)]])
    assert_series_equal(product(a, b), [(0, 0, 4.0)])


def test_prod_3_both_single_diff_epoch_empty(spark):
    a = from_ts_lists(spark, [[(0, 2.0)]])
    b = from_ts_lists(spark, [[(1, 2.0)]])
    assert product(a, b).count() == 0


def test_prod_7_mixed(spark):
    a = from_ts_lists(
        spark,
        [
            [(i, float(i)) for i in range(1000)],
            [(2 * i, float(i)) for i in range(1000)],
        ],
    )
    b = from_ts_lists(
        spark,
        [
            [(2 * i, float(i)) for i in range(1000)],
            [(i, 1.0) for i in range(500)],
        ],
    )
    out = product(a, b)
    exp = [(0, 2 * i, float(2 * i) * i) for i in range(500)]
    exp += [(1, 2 * i, float(i)) for i in range(250)]
    assert_series_equal(out, exp)


def test_div_4_zero_dropped(spark):
    a = from_ts_lists(spark, [[(1393628100 + 300 * i, float(i)) for i in range(1000)]])
    b = from_ts_lists(spark, [[(1393628100 + 600 * i, 0.0) for i in range(500)]])
    # all coincident epochs divide by 0 -> inf/NaN -> dropped (tf:982-986)
    assert division(a, b).count() == 0


def test_div_5_scalar_broadcast_per_series(spark):
    a = from_ts_lists(
        spark,
        [
            [(1393628100 + 300 * i, float(i)) for i in range(1000)],
            [(1393928100 + 300 * i, float(i) + 100) for i in range(1000)],
        ],
    )
    b = from_ts_lists(spark, [[(1393628100, 500.0)], [(1393928100, 600.0)]])
    out = division(a, b)
    exp = [(0, 1393628100 + 300 * i, i / 500.0) for i in range(1000)]
    exp += [(1, 1393928100 + 300 * i, (i + 100) / 600.0) for i in range(1000)]
    assert_series_equal(out, exp)


def test_subtraction_identity(spark):
    a = from_ts_lists(spark, [[(i, float(i)) for i in range(10)]])
    out = subtraction(a, a)
    assert_series_equal(out, [(0, i, 0.0) for i in range(10)])


def test_addition_requires_two(spark):
    a = from_ts_lists(spark, [[(0, 1.0)]])
    with pytest.raises(TsError):
        addition(a)


# ---- clean/filter/round (af:376-441, 619-667) ----

def test_clean_duplicated(spark):
    df = from_ts_lists(spark, [[(1, 1.0), (2, 1.0), (3, 2.0), (4, 2.0), (5, 1.0)]])
    assert_series_equal(clean_duplicated(df), [(0, 1, 1.0), (0, 3, 2.0), (0, 5, 1.0)])


def test_delete_critical_values(spark):
    df = from_ts_lists(spark, [[(1, 1.0), (2, -999.0), (3, 2.0)]])
    assert_series_equal(delete_critical_values(df, -999.0), [(0, 1, 1.0), (0, 3, 2.0)])


def test_truncate_round_intent(spark):
    df = from_ts_lists(spark, [[(1, 7.6), (2, 12.4)]])
    assert_series_equal(truncate_values(df, 5), [(0, 1, 5.0), (0, 2, 10.0)])
    assert_series_equal(round_values(df, 5), [(0, 1, 10.0), (0, 2, 10.0)])
