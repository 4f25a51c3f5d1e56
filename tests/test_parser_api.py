"""Compound-language + API parity tests: grammar unit tests (cp tests),
formula pipelines ap_1..ap_7 on meter28, and the business-identity tests
ap_12-17 re-pointed at synthetic fixtures (the reference runs those against
live DB variables 2419/2421/2420, parser_tests.py:525-750)."""

import json

import pytest

from tests.helpers import assert_series_equal
from tsengine.core import from_ts_lists, to_ts_lists
from tsengine.plans import parser as P
from tsengine.plans.api import Engine


# ---------------------------------------------------------------- grammar

def test_is_kwarg():
    assert P.is_kwarg("test(") == ("arg", "test(", None)
    assert P.is_kwarg("test==") == ("kwarg", "test", "=")
    assert P.is_kwarg("test()") == ("arg", "test()", None)
    with pytest.raises(P.ParseError):
        P.is_kwarg("=te=/()")


def test_parse_args():
    assert P.parse_args("lsfsaldjf;alkfjasld,dsj;()") == (["lsfsaldjf", "alkfjasld,dsj", "()"], {})
    assert P.parse_args("lsfs=aldjf;alkfja=sld,dsj;()") == (["()"], {"lsfs": "aldjf", "alkfja": "sld,dsj"})
    with pytest.raises(P.ParseError):
        P.parse_args("==aldjf;alkfja=sld,dsj;()")


def test_find_func():
    assert P.find_func("alfjsdlj((),falsdjf))") == ("alfjsdlj", "(),falsdjf)")
    assert P.find_func("noparens") == ("", "noparens")


def test_parse_ast():
    ast = P.parse("inner_sum(split(increments(get_variable(2419; from=1; to=2)); period=week))")
    assert ast.name == "inner_sum"
    assert ast.args[0].name == "split"
    assert ast.args[0].kwargs == {"period": "week"}
    assert ast.args[0].args[0].name == "increments"
    gv = ast.args[0].args[0].args[0]
    assert gv.name == "get_variable" and gv.args == ["2419"] and gv.kwargs == {"from": "1", "to": "2"}


# ---------------------------------------------------------------- formulas

@pytest.fixture(scope="module")
def engine(spark):
    from tests.meter28 import INDEX_LIST, VALUE_LIST

    meter = list(zip(INDEX_LIST, [float(v) for v in VALUE_LIST]))
    # a second meter shifted/scaled + an on/off state series on the hour grid
    meter2 = [(e, v * 0.5 + 7) for e, v in meter]
    state = [(e, float((i // 3) % 2)) for i, e in enumerate(range(1398895200, 1401573601, 3600))]
    src = from_ts_lists(spark, [[], meter, meter2, state])
    # series ids: 1 = meter28 ("2419"), 2 = meter2 ("2421"), 3 = state ("2420")
    return Engine(spark, src)


def test_ap_1(spark, engine):
    out = engine.query('generate_ts_list([{"value":[0], "index":[0]}])')
    assert_series_equal(out, [(0, 0, 0.0)])


def test_ap_2(spark, engine):
    out = engine.query(
        'distribute_ts_list(generate_ts_list([{"value":[0, 1, 1], '
        '"index":[1393628100, 1393628400, 1393628900]}]); e_from = 1393627000)'
    )
    exp = [(0, 1393627200 + 300 * i, v) for i, v in enumerate([0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0])]
    assert_series_equal(out, exp)


def test_ap_7_formula(spark, engine):
    from tests.meter28 import DAILY_EPOCHS, DAILY_SUMS, INDEX_LIST, VALUE_LIST

    ts_text = json.dumps([{"value": [float(v) for v in VALUE_LIST], "index": INDEX_LIST}])
    out = engine.query(
        "inner_sum(split(increments(distribute_ts_list(generate_ts_list(" + ts_text + ");"
        " seconds=3600; e_from = 1398895201; e_to= 1401573600))))"
    )
    got = sorted((r["epoch"], round(r["value"], 6)) for r in out.collect())
    exp = sorted(zip(DAILY_EPOCHS, [round(float(v), 6) for v in DAILY_SUMS]))
    assert got == exp


def test_ap8_shape_get_variable_pipeline(spark, engine):
    # inner_sum(increments(get_variable(...))) == last - first of the LOCF
    # meter over the closed window (increments telescope)
    out = engine.query(
        "inner_sum(increments(get_variable(1; from = 1398895200; to = 1401573600; now = 1401573600)))"
    )
    rows = out.collect()
    assert len(rows) == 1
    # telescoping: sum of increments = last value - first value.  get_variable
    # (E1) filters points to the window BEFORE distributing (no pre-window
    # point, unlike get_increments) so the leading bfill value is the first
    # IN-window sample 6071.85, not 5706.74.
    assert abs(rows[0]["value"] - (15513.87 - 6071.85)) < 1e-6
    assert rows[0]["epoch"] == 1401573600


def test_ap12_13_identity(spark, engine):
    """addition(inner_sum(split(incs1)); inner_sum(split(incs2))) ==
    inner_sum(split(addition(incs1; incs2))) (parser_tests ap_12 vs ap_13)."""
    incs_1 = "increments(get_variable(1; from = 1398895200; to = 1401573600; now = 1401573600))"
    incs_2 = "increments(get_variable(2; from = 1398895200; to = 1401573600; now = 1401573600))"
    a = engine.query(
        f"addition(inner_sum(split({incs_1}; period = week)); inner_sum(split({incs_2}; period = week)))"
    )
    b = engine.query(f"inner_sum(split(addition({incs_1};{incs_2}); period = week))")
    ra = sorted((r["epoch"], round(r["value"], 6)) for r in a.collect())
    rb = sorted((r["epoch"], round(r["value"], 6)) for r in b.collect())
    assert ra == rb and len(ra) >= 4


def test_ap14_scalar_product_half(spark, engine):
    incs_1 = "increments(get_variable(1; from = 1398895200; to = 1401573600; now = 1401573600))"
    incs_2 = "increments(get_variable(2; from = 1398895200; to = 1401573600; now = 1401573600))"
    full = engine.query(f"inner_sum(split(addition({incs_1};{incs_2}); period = week))")
    half = engine.query(
        f"scalar_product(inner_sum(split(addition({incs_1};{incs_2}); period = week)); number = 0.5)"
    )
    f = {r["epoch"]: r["value"] for r in full.collect()}
    h = {r["epoch"]: r["value"] for r in half.collect()}
    assert set(f) == set(h)
    for k in f:
        assert abs(h[k] - 0.5 * f[k]) < 1e-9


def test_ap15_masked_sum(spark, engine):
    """product of increments with an inverted on/off state (ap_15 shape)."""
    incs = "increments(get_variable(1; from = 1399200000; to = 1399270000; now = 1401573600))"
    state = (
        "scalar_sum(scalar_product(get_variable(3; from = 1399200000; to = 1399270000;"
        " now = 1401573600); number = -1); number = 1)"
    )
    out = engine.query(f"inner_sum(product({incs};{state}))")
    rows = out.collect()
    assert len(rows) == 1  # one masked total


def test_ap16_split_before_vs_after(spark, engine):
    """Hourly increments: splitting before vs after then double-inner_sum
    subtract to exactly 0 on matching epochs (ap_16)."""
    incs_1 = "increments(split(get_variable(1; from = 1398895201; to = 1401573600; now = 1401573600); period=hour))"
    incs_2 = "split(increments(get_variable(1; from = 1398895201; to = 1401573600; now = 1401573600)); period=hour)"
    out = engine.query(f"inner_sum(inner_sum(subtraction({incs_1};{incs_2})))")
    rows = out.collect()
    assert len(rows) == 1
    assert abs(rows[0]["value"]) < 1e-9


def test_ap19_product_with_literal(spark, engine):
    arg_1 = "inner_sum(split(increments(get_variable(1; from = 1398895201; to = 1401573600; now = 1401573600)); period=week))"
    weekly = engine.query(arg_1).collect()
    epochs = sorted(r["epoch"] for r in weekly)
    prices = [10 ** i for i in range(len(epochs))]
    arg_2 = json.dumps([{"value": prices, "index": epochs}])
    out = engine.query(f"product({arg_1};generate_ts_list({arg_2}))")
    got = {r["epoch"]: r["value"] for r in out.collect()}
    base = {r["epoch"]: r["value"] for r in weekly}
    for i, e in enumerate(epochs):
        assert abs(got[e] - base[e] * prices[i]) < 1e-6


def test_usage_vs_oracle(spark, engine):
    from oracle import reference_oracle as ro
    from tests.meter28 import INDEX_LIST, VALUE_LIST

    ts = list(zip(INDEX_LIST, [float(v) for v in VALUE_LIST]))
    out = engine.usage(
        1, group_by="week", **{"from": 1398895200, "to": 1401573600, "now": 1401573600, "time_int": 3600}
    )
    got = sorted((r["epoch"], round(r["value"], 6)) for r in out.collect())
    # oracle: closed interval [from, to]; extra pre-window point doesn't exist
    # (1398895200 precedes the first sample 1396631712? no - there are earlier
    # points, so one pre-window point is prepended)
    pre = [p for p in ts if p[0] < 1398895200][-1:]
    window = [p for p in ts if 1398895200 <= p[0] <= 1401573600]
    d = ro.distribute(pre + window, seconds=3600, e_from=1398895200, e_to=1401573600)
    inc = ro.increments(d)
    exp = sorted(
        (e, round(v, 6)) for e, v in (ro.inner_sum(g) for g in ro.split(inc, "week"))
    )
    assert got == exp


def test_unknown_function(spark, engine):
    with pytest.raises(P.ParseError, match="Unknown function"):
        engine.query("nope(1)")
