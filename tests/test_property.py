"""Hypothesis property tests: the Spark engine vs the pure-python reference
oracle (SURVEY.md §5 strategy item 2 — randomized-compare engine vs oracle)
on randomized series, and bitwise codec roundtrips on adversarial vectors.

Design notes:
- Values are integer-valued floats so sums are exact regardless of the
  addition order (Spark aggregates per-partition; np.sum is sequential —
  equality over arbitrary floats would test IEEE ordering, not semantics).
- ``derandomize=True`` keeps CI deterministic; ``deadline=None`` because a
  Spark job's latency is dominated by scheduling noise, not the property.
- Epoch pools cross the Europe/Madrid DST transitions (2021-03-28,
  2021-10-31) so calendar splitting is exercised where it is hardest.
"""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracle import reference_oracle as ro

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# epochs spanning ~2 months around both 2021 Europe/Madrid DST transitions
DST_SPRING = 1616889600  # 2021-03-28 00:00 UTC
DST_FALL = 1635638400  # 2021-10-31 00:00 UTC


def series_strategy(min_size=2, max_size=40, epoch_base=1_600_000_000, epoch_span=3_000_000):
    """Sorted unique (epoch, value) pairs; integer-valued float values."""
    return st.lists(
        st.tuples(
            st.integers(min_value=epoch_base, max_value=epoch_base + epoch_span),
            st.integers(min_value=-1000, max_value=10_000).map(float),
        ),
        min_size=min_size,
        max_size=max_size,
        unique_by=lambda p: p[0],
    ).map(lambda ps: sorted(ps))


def _to_df(spark, ts, series_id=0):
    return spark.createDataFrame(
        [(series_id, e, v) for e, v in ts], "series_id long, epoch long, value double"
    )


def _collect(df):
    return sorted((r.epoch, r.value) for r in df.collect())


@given(
    ts=series_strategy(),
    seconds=st.sampled_from([60, 300, 3600, 7]),
    fill=st.sampled_from([None, 0.0, -1.0]),
)
@settings(**SETTINGS)
def test_distribute_matches_oracle(spark, ts, seconds, fill):
    from tsengine.operators import resample

    got = _collect(resample.distribute(_to_df(spark, ts), seconds=seconds, fill_value=fill))
    exp = sorted(ro.distribute(ts, seconds=seconds, fill_value=fill))
    assert got == exp


@given(
    ts=series_strategy(),
    monotony=st.sampled_from(["increasing", "decreasing"]),
    max_value=st.sampled_from([None, 20_000.0]),
    reset_value=st.sampled_from([0.0, 5.0]),
)
@settings(**SETTINGS)
def test_increments_matches_oracle(spark, ts, monotony, max_value, reset_value):
    from tsengine.operators import increments as incr

    got = _collect(
        incr.increments(
            _to_df(spark, ts),
            monotony=monotony,
            max_value=max_value,
            reset_value=reset_value,
            validate=False,
        )
    )
    exp = sorted(ro.increments(ts, monotony=monotony, max_value=max_value, reset_value=reset_value))
    assert got == exp


@given(
    ts=st.one_of(
        series_strategy(epoch_base=DST_SPRING - 1_500_000, epoch_span=3_000_000),
        series_strategy(epoch_base=DST_FALL - 1_500_000, epoch_span=3_000_000),
    ),
    period=st.sampled_from(["hour", "day", "week", "month"]),
)
@settings(**SETTINGS)
def test_split_inner_sum_matches_oracle(spark, ts, period):
    from tsengine.operators import split as spl

    got = sorted(
        (r.bucket, r.epoch, r.value)
        for r in spl.split_agg(_to_df(spark, ts), period=period, agg="sum").collect()
    )
    exp = []
    for group in ro.split(ts, period=period):
        e, v = ro.inner_sum(group)
        from tsengine.timeutil import time_interval_beginning

        exp.append((time_interval_beginning(period, "Europe/Madrid", group[0][0]), e, v))
    assert got == sorted(exp)


@given(
    ts=series_strategy(min_size=3, epoch_base=DST_SPRING - 1_500_000, epoch_span=3_000_000),
    period=st.sampled_from(["day", "week"]),
)
@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_usage_pipeline_matches_oracle(spark, ts, period):
    """Flagship composite: inner_sum(split(increments(distribute(ts; 1h))))."""
    from tsengine.operators import increments as incr
    from tsengine.operators import resample, split as spl

    d = resample.distribute(_to_df(spark, ts), seconds=3600)
    inc = incr.increments(d, monotony="increasing", validate=False)
    got = sorted((r.epoch, r.value) for r in spl.split_agg(inc, period=period, agg="sum").collect())
    exp = sorted(ro.usage_split_sum(ts, period=period, seconds=3600))
    assert got == exp


@given(
    deltas=st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=300),
            st.integers(min_value=0, max_value=2**40),  # multi-century jumps
        ),
        min_size=0,
        max_size=200,
    ),
    vals=st.lists(
        st.one_of(
            st.floats(allow_nan=False, allow_infinity=True, width=64),
            st.sampled_from([0.0, -0.0, 1e-308, 5e-324, 1e308, 42.5]),
        ),
        min_size=1,
        max_size=201,
    ),
    first_ts=st.integers(min_value=0, max_value=2**48),
)
@settings(max_examples=60, deadline=None, derandomize=True)
def test_codec_roundtrip_bitwise(deltas, vals, first_ts):
    """decode(encode(x)) == x bit-for-bit: int64 timestamps, float64 values
    (±0, denormals, ±inf, full exponent range), arbitrary gap structure."""
    from tsengine import compress as C

    n = min(len(deltas) + 1, len(vals))
    ts = first_ts + np.cumsum(np.array([0] + list(deltas[: n - 1]), dtype=np.int64))
    v = np.array(vals[:n], dtype=np.float64)
    blk = C.encode_block(ts, v)
    dts, dv = C.decode_block(blk)
    assert dts.tolist() == ts.tolist()
    assert np.asarray(dv, dtype=np.float64).view(np.uint64).tolist() == v.view(np.uint64).tolist()


@given(
    turns=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500_000),  # epoch
            st.sampled_from(["user", "assistant", "system"]),
            st.sampled_from([None, "search", "bash"]),
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_rollup_tiers_match_oracle(spark, turns):
    """Engine tier rows == oracle rollup on a random single-conversation turn
    stream (epochs may repeat — latency 0 turns — and arrive unsorted; the
    engine orders by turn_idx, the oracle receives the same order)."""
    from tsengine.operators import rollup as R

    turns = sorted(turns)  # stable (epoch asc) order; turn_idx follows it
    rows = [("c0", i, role, f"t{i}", tool, ts) for i, (ts, role, tool) in enumerate(turns)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts_epoch long"
    ).selectExpr("conv_id", "turn_idx", "role", "text", "tool", "cast(ts_epoch as timestamp) as ts")
    tiers = R.build_all_tiers(R.with_latency(df))
    oracle_turns = [{"epoch": ts, "role": role, "tool": tool} for ts, role, tool in turns]
    exp_all = ro.rollup_tiers(oracle_turns)
    for name in ("1m", "1h", "1d"):
        exp = exp_all[name]
        got = {r.bucket: r for r in tiers[name].collect()}
        assert set(got) == set(exp)
        for b, e in exp.items():
            g = got[b]
            assert (g.cnt, g.cnt_lat) == (e["cnt"], e["cnt_lat"]), (name, b)
            for f in ("vmin", "vmax", "vsum", "vmean"):
                assert getattr(g, f) == e[f], (name, b, f)
            assert dict(g.role_dist or {}) == e["role_dist"], (name, b)
            assert dict(g.tool_dist or {}) == e["tool_dist"], (name, b)
