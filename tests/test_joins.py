"""As-of join and bucketed range join vs DuckDB oracles."""

import duckdb
import pytest
from pyspark.sql import functions as F

from tsengine.operators.joins import asof_join, range_join


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [("A", 5, 100), ("A", 10, 101), ("A", 2, 102), ("B", 7, 103), ("C", 4, 104)],
        "sym string, ts long, trade_id long",
    )
    quotes = spark.createDataFrame(
        [("A", 1, 10.0), ("A", 5, 11.0), ("A", 9, 12.0), ("B", 7, 20.0), ("B", 8, 21.0)],
        "sym string, ts long, px double",
    )
    return trades, quotes


def test_asof_join_vs_duckdb(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="ts", by="sym").collect()
    got = sorted((r["sym"], r["ts"], r["trade_id"], r["ts_r"], r["px"]) for r in out)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(sym VARCHAR, ts BIGINT, trade_id BIGINT)")
    con.execute("CREATE TABLE q(sym VARCHAR, ts BIGINT, px DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", [tuple(r) for r in trades.collect()])
    con.executemany("INSERT INTO q VALUES (?,?,?)", [tuple(r) for r in quotes.collect()])
    want = sorted(
        con.execute(
            "SELECT t.sym, t.ts, t.trade_id, q.ts, q.px FROM t "
            "ASOF LEFT JOIN q ON t.sym = q.sym AND t.ts >= q.ts"
        ).fetchall()
    )
    assert got == want
    # spot-check semantics: inclusive at equal ts; no-match rows keep NULLs
    d = {(r[0], r[1]): (r[3], r[4]) for r in got}
    assert d[("A", 5)] == (5, 11.0)       # inclusive boundary
    assert d[("A", 2)] == (1, 10.0)
    assert d[("C", 4)] == (None, None)    # left-join semantics


def test_asof_join_duplicate_right_ts_deterministic(spark):
    left = spark.createDataFrame([("A", 10)], "sym string, ts long")
    right = spark.createDataFrame(
        [("A", 10, 1.0), ("A", 10, 3.0), ("A", 10, 2.0)], "sym string, ts long, px double"
    )
    r = asof_join(left, right, on="ts", by="sym").collect()[0]
    assert r["px"] == 3.0  # max payload struct wins, stably


def test_range_join_vs_duckdb(spark):
    events = spark.createDataFrame(
        [("u1", 100, 1), ("u1", 3600, 2), ("u1", 3599, 3), ("u2", 50, 4), ("u1", 7300, 5)],
        "uid string, ts long, eid long",
    )
    iv = spark.createDataFrame(
        [("u1", 0, 3600, 10), ("u1", 3500, 7200, 11), ("u2", 60, 70, 12), ("u1", 7300, 7300, 13)],
        "uid string, start long, end long, iid long",
    )
    for width in (60, 3600, 10_000):  # result must be width-invariant
        out = range_join(events, iv, by="uid", on="ts", bucket_sec=width)
        got = sorted((r["eid"], r["iid"]) for r in out.collect())
        # oracle: plain inequality join
        con = duckdb.connect()
        con.execute("CREATE TABLE e(uid VARCHAR, ts BIGINT, eid BIGINT)")
        con.execute("CREATE TABLE i(uid VARCHAR, s BIGINT, e BIGINT, iid BIGINT)")
        con.executemany("INSERT INTO e VALUES (?,?,?)", [tuple(r) for r in events.collect()])
        con.executemany("INSERT INTO i VALUES (?,?,?,?)", [tuple(r) for r in iv.collect()])
        want = sorted(
            con.execute(
                "SELECT e.eid, i.iid FROM e JOIN i ON e.uid = i.uid "
                "AND e.ts >= i.s AND e.ts < i.e"
            ).fetchall()
        )
        assert got == want, width
    # boundary semantics: ts=3600 excluded from [0,3600), included in [3500,7200);
    # zero-length interval matches nothing
    assert (2, 10) not in got and (2, 11) in got and (3, 10) in got
    assert all(iid != 13 for _, iid in got)


def test_range_join_no_cartesian_in_plan(spark):
    events = spark.createDataFrame([("u1", 100, 1)], "uid string, ts long, eid long")
    iv = spark.createDataFrame([("u1", 0, 200, 10)], "uid string, start long, end long, iid long")
    plan = range_join(events, iv, by="uid", on="ts")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
