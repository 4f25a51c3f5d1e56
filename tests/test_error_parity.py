"""Exhaustive error-message parity for the reference's argument-validation
paths (VERDICT r2 #8).  Messages are pinned verbatim against
tests/analysis/timeseries_functions_tests.py:196-257,324-371 and the
producing code in src/analysis/timeseries_functions.py (tf: line refs in
each assert).  Covers driver-side argument validations AND the
data-dependent errors (all four monotony/range bounds, merge collision,
non-scalar values) with messages matched verbatim (^...$).
"""

import pytest

from tsengine.core import TsError, from_ts_lists
from tsengine.plans.api import Engine


@pytest.fixture(scope="module")
def eng(spark):
    src = from_ts_lists(
        spark, [[(1393628100 + 300 * i, float(i)) for i in range(8)]]
    ).withColumnRenamed("series_id", "_sid").selectExpr(
        "cast(7 as long) as series_id", "epoch", "value"
    )
    return Engine(spark, src)


@pytest.fixture(scope="module")
def df(spark):
    return from_ts_lists(spark, [[(1393628100 + 300 * i, float(i)) for i in range(8)]])


# ---- ts_list_function decorator (tf:42-45; test_scp_4) ----

def test_unknown_argument(eng, df):
    from tsengine.plans.parser import Call

    with pytest.raises(TsError, match="^unknown argument test$"):
        eng.evaluator.eval(Call("scalar_product", [df], {"number": "1", "test": "1"}))


# ---- numeric-argument coercion ----

def test_scalar_number_not_numeric(eng, df):
    # tf:601; test_scp_3
    with pytest.raises(TsError, match="^number is not numeric$"):
        eng.registry()["scalar_product"](df, number="a")


def test_increments_max_value_not_number(eng, df):
    # tf:349; test_inc_7
    with pytest.raises(TsError, match="^max_value is not a number$"):
        eng.registry()["increments"](df, max_value="a")


def test_increments_reset_value_not_number(eng, df):
    # tf:354; test_inc_6
    with pytest.raises(TsError, match="^reset_value is not a number$"):
        eng.registry()["increments"](df, reset_value="a")


def test_increments_eager_monotony_error_at_call_time(eng, spark):
    # ADVICE r2: the parity layer validates EAGERLY — TsError raised by the
    # registry call itself (tf:363; test_inc_4), not at a later action
    bad = from_ts_lists(spark, [[(1, 1.0), (2, 10.0), (3, 20.0)]])
    with pytest.raises(TsError, match="^value greater than reset value$"):
        eng.registry()["increments"](bad, monotony="decreasing")


# ---- distribute argument formats (tf:232,238,243) ----

def test_distribute_e_to_must_be_epoch(eng, df):
    with pytest.raises(TsError, match="^e_to must be an epoch$"):
        eng.registry()["distribute_ts_list"](df, e_to="abc")


def test_distribute_e_from_must_be_epoch(eng, df):
    with pytest.raises(TsError, match="^e_from must be an epoch$"):
        eng.registry()["distribute_ts_list"](df, e_from="abc")


def test_distribute_seconds_must_be_integer(eng, df):
    with pytest.raises(TsError, match="^seconds must be an integer$"):
        eng.registry()["distribute_ts_list"](df, seconds="abc")


# ---- get_variable argument formats (tf:137,148,157) ----

def test_get_variable_bad_bool_params(eng):
    with pytest.raises(TsError, match="^parameters do not have required format$"):
        eng.get_variable(7, now=1393630000, expand="zorp")


def test_get_variable_bad_time_int(eng):
    with pytest.raises(TsError, match="^parameters do not have required format$"):
        eng.get_variable(7, now=1393630000, time_int="abc")


def test_get_variable_count_not_integer(eng):
    with pytest.raises(TsError, match="^count argument is not an integer: abc$"):
        eng.get_variable(7, now=1393630000, count="abc")


def test_get_variable_now_not_epoch(eng):
    with pytest.raises(TsError, match="^time reference received is not an epoch$"):
        eng.get_variable(7, now="abc")


# ---- compound formula end-to-end: unknown kwarg inside a formula ----

def test_formula_unknown_kwarg(eng):
    with pytest.raises(TsError, match="^unknown argument bogus$"):
        eng.query(
            "scalar_product(get_variable(7; time_int = 300; now = 1393630000; "
            "range = this_hour); number = 2; bogus = 1)"
        )


# ---- data-dependent bounds: all four monotony/range messages (tf:356-365) ----

def test_monotony_value_lower_than_reset(eng, spark):
    # tf:358; increasing + value below reset_value
    bad = from_ts_lists(spark, [[(1, -1.0), (2, 10.0), (3, 20.0)]])
    with pytest.raises(TsError, match="^value lower than reset_value$"):
        eng.registry()["increments"](bad, monotony="increasing")


def test_monotony_value_greater_than_max(eng, spark):
    # tf:360; increasing + max_value exceeded
    bad = from_ts_lists(spark, [[(1, 1.0), (2, 10.0), (3, 20.0)]])
    with pytest.raises(TsError, match="^value greater than max_value$"):
        eng.registry()["increments"](bad, monotony="increasing", max_value=15.0)


def test_monotony_value_lower_than_max_decreasing(eng, spark):
    # tf:365; decreasing + value under max_value (reset high enough to pass)
    bad = from_ts_lists(spark, [[(1, -30.0), (2, -10.0), (3, -20.0)]])
    with pytest.raises(TsError, match="^value lower than max_value$"):
        eng.registry()["increments"](
            bad, monotony="decreasing", reset_value=0.0, max_value=-25.0
        )


# ---- non-scalar value plane (tf:398-405; test_inc_5 / test_scp_2) ----

def test_non_scalar_values_found(spark):
    from tsengine.core import assert_castable

    bad = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "2.0")], "series_id long, epoch long, value string"
    )
    with pytest.raises(TsError, match="^Non scalar values found$"):
        assert_castable(bad)


# ---- cross-series merge collision (tf:443-444; test_scp_5 analogue) ----

def test_merge_collision_non_unique_index(spark):
    from tsengine.core import from_ts_lists as ftl
    from tsengine.operators.aggregates import check_merge_collisions

    two = ftl(spark, [[(1, 1.0), (2, 2.0)], [(2, 5.0), (3, 6.0)]])
    merged = two.selectExpr("cast(0 as long) as series_id", "epoch", "value")
    with pytest.raises(TsError, match="^Non unique index$"):
        check_merge_collisions(merged)


def test_not_a_list_of_timeseries():
    from tsengine.core import TsError, check_series_list

    with pytest.raises(TsError, match=r"^Not a list of timeseries$"):
        check_series_list("a")  # tf tests: increments('a')


def test_meter_empty_series_invalid():
    from tsengine.core import TsError, check_meter_input

    with pytest.raises(TsError, match=r"^Invalid timeserie received$"):
        check_meter_input([[(1, 1.0)], []])  # af:310-312


def test_af_invalid_value_names_offender(spark):
    from tsengine.core import TsError, to_float_af

    df = spark.createDataFrame(
        [(1, 10, "7.5"), (1, 20, "xyz"), (1, 30, None)],
        "series_id int, epoch long, value string",
    )
    with pytest.raises(TsError, match=r"^Invalid value xyz received$"):
        to_float_af(df)  # af:281
    ok = to_float_af(df.filter("value is null or value = '7.5'"))
    vals = {r["epoch"]: r["value"] for r in ok.collect()}
    assert vals == {10: 7.5, 30: None}  # None passes through (af None branch)


def test_af_scalar_not_a_number_names_value(spark):
    from tsengine.core import TsError
    from tsengine.operators.arithmetic import scalar_product_af

    df = spark.createDataFrame([(1, 10, 2.0)], "series_id int, epoch long, value double")
    with pytest.raises(TsError, match=r"^Value received is not a number: a$"):
        scalar_product_af(df, "a")  # af:358-362
    assert scalar_product_af(df, "3").collect()[0]["value"] == 6.0


@pytest.mark.parametrize("op,msg", [
    ("add", "Timeseries lists must have the same dimension"),
    ("sub", "Subtraction - Timeseries list must have same dimension"),
    ("mul", "Product - Timeseries list must have same dimension"),
    ("div", "Division - Timeseries list must have same dimension"),
])
def test_pairwise_dimension_messages(spark, op, msg):
    from tsengine.core import TsError
    from tsengine.operators.arithmetic import check_same_dimension

    d1 = spark.createDataFrame([(1, 10, 1.0), (2, 10, 1.0)],
                               "series_id int, epoch long, value double")
    d2 = spark.createDataFrame([(1, 10, 1.0)],
                               "series_id int, epoch long, value double")
    with pytest.raises(TsError) as ei:
        check_same_dimension(d1, d2, op)  # tf:793/847/901/956
    assert str(ei.value) == msg
    check_same_dimension(d1, d1, op)  # equal sets pass
