"""KMV distinct-count sketch: exact branch, estimator accuracy, the merge
identity (truncated sketches), cut-prefilter invariance, and partitioning
invariance."""

import pyspark.sql.functions as F
import pytest

from tsengine.operators import sketches
from tsengine.operators.sampling import H_SPACE


def _ev(spark, rows):
    return spark.createDataFrame(rows, "ep long, user_id long")


def _collect_sketches(df):
    return sorted(
        (r["bucket"], tuple(r["kmv"])) for r in df.collect()
    )


@pytest.fixture(scope="module")
def events(spark):
    # 2 days x 6 hours; hour h of day d holds users 0..(5*h+4) + a hot user
    # repeated 50x (map-side dedup path) -> per-hour distinct 6..31
    rows = []
    for d in range(2):
        for h in range(6):
            base = d * 86400 + h * 3600
            for u in range(5 * h + 5):
                rows.append((base + u, d * 1000 + u))
            rows.extend((base + 200 + i, d * 1000) for i in range(50))
    return _ev(spark, rows)


def test_exact_branch_matches_count_distinct(spark, events):
    sk = sketches.kmv_sketch(events, width_sec=3600, k=64)
    got = {
        r["bucket"]: r["est"]
        for r in sk.select(
            "bucket", sketches.kmv_estimate("kmv", 64).alias("est")
        ).collect()
    }
    exact = {
        r["bucket"]: float(r["n"])
        for r in events.groupBy(
            (F.floor(F.col("ep") / 3600) * 3600).cast("long").alias("bucket")
        )
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert got == exact  # every hour < 64 distinct -> sketch is exact


def test_estimator_accuracy(spark):
    n, k = 5000, 256
    df = spark.range(n).select(
        F.lit(100).cast("long").alias("ep"), F.col("id").alias("user_id")
    )
    sk = sketches.kmv_sketch(df, width_sec=3600, k=k)
    est = sk.select(sketches.kmv_estimate("kmv", k).alias("e")).first()["e"]
    assert abs(est / n - 1.0) < 0.15  # ~2.4 sigma of 1/sqrt(k-2)


def test_merge_identity_with_truncated_inputs(spark, events):
    # k=4 truncates every hour sketch; the merged day sketch must still be
    # bit-for-bit the direct day sketch (top-k-of-union argument)
    k = 4
    hour = sketches.kmv_sketch(events, width_sec=3600, k=k)
    merged = sketches.kmv_merge(hour, width_sec=86400, k=k)
    direct = sketches.kmv_sketch(events, width_sec=86400, k=k)
    assert _collect_sketches(merged) == _collect_sketches(direct)


def test_cut_prefilter_is_result_invariant(spark, events):
    k = 8
    plain = _collect_sketches(sketches.kmv_sketch(events, width_sec=3600, k=k))
    for cut in (H_SPACE // 10**6, H_SPACE // 2, H_SPACE):
        # tiny cut: filtered pass is (nearly) empty, everything falls back;
        # half-space: mixed; full-space: filter passes everything
        got = _collect_sketches(
            sketches.kmv_sketch(events, width_sec=3600, k=k, cut=cut)
        )
        assert got == plain, f"cut={cut} changed the sketch"


def test_partitioning_invariance(spark, events):
    k = 8
    a = _collect_sketches(
        sketches.kmv_sketch(events.repartition(1), width_sec=3600, k=k)
    )
    b = _collect_sketches(
        sketches.kmv_sketch(events.repartition(7, "user_id"), width_sec=3600, k=k)
    )
    assert a == b


def test_kmv_plan_two_exchanges(spark, events):
    """Scale guard: (bucket,h) distinct + the bucket rank window = two
    Exchanges; the final groupBy(bucket) reuses the window's clustering."""
    plan = (
        sketches.kmv_sketch(events, width_sec=3600, k=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2, plan
