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


EDGES = [float(2**i) for i in range(-2, 10)]


def test_histogram_merge_identity(spark, events):
    vals = events.select(
        "ep", (F.col("user_id") % 37 * 13.25 + 0.5).alias("value")
    )
    m1 = sketches.fixed_histogram(vals, ts="ep", width_sec=60, edges=EDGES)
    merged = sketches.histogram_merge(m1, width_sec=86400, nbins=len(EDGES) + 1)
    direct = sketches.fixed_histogram(vals, ts="ep", width_sec=86400, edges=EDGES)
    a = sorted((r["bucket"], tuple(r["hist"])) for r in merged.collect())
    b = sorted((r["bucket"], tuple(r["hist"])) for r in direct.collect())
    assert a == b and a  # bit-for-bit, non-empty


def test_histogram_quantile_hand_vector(spark):
    # edges [1, 2, 4]: values 1.0 x2 (slot 2), 3.0 x2 (slot 3) -> n=4
    # p50: target 2.0 -> slot 2 (cum 2 >= 2), cumbelow 0: 1 + 1*(2-0)/2 = 2.0
    # p75: target 3.0 -> slot 3, cumbelow 2:  2 + 2*(3-2)/2 = 3.0
    edges = [1.0, 2.0, 4.0]
    df = spark.createDataFrame(
        [(0, 1.0), (1, 1.0), (2, 3.0), (3, 3.0)], "ep long, value double"
    )
    h = sketches.fixed_histogram(df, width_sec=3600, edges=edges)
    r = h.select(
        sketches.histogram_quantile("hist", edges, 0.5).alias("p50"),
        sketches.histogram_quantile("hist", edges, 0.75).alias("p75"),
    ).first()
    assert (r["p50"], r["p75"]) == (2.0, 3.0)


def test_histogram_quantile_clamps_and_skip_empty(spark):
    edges = [1.0, 2.0, 4.0]
    # below-first-edge mass clamps to the first edge; above-last to the last
    lo = spark.createDataFrame([(0, 0.1)], "ep long, value double")
    hi = spark.createDataFrame([(0, 99.0)], "ep long, value double")
    for df, expect in ((lo, 1.0), (hi, 4.0)):
        r = (
            sketches.fixed_histogram(df, width_sec=3600, edges=edges)
            .select(sketches.histogram_quantile("hist", edges, 0.5).alias("p"))
            .first()
        )
        assert r["p"] == expect
    # empty bins between mass are skipped: values in slots 2 and 4 only
    df = spark.createDataFrame(
        [(0, 1.5), (1, 99.0), (2, 99.0), (3, 99.0)], "ep long, value double"
    )
    r = (
        sketches.fixed_histogram(df, width_sec=3600, edges=edges)
        .select(sketches.histogram_quantile("hist", edges, 0.9).alias("p"))
        .first()
    )
    assert r["p"] == 4.0  # top-bin clamp, slot 3 (empty) skipped


def test_histogram_plan_single_aggregate(spark, events):
    """Scale guard: one Exchange, codegen HashAggregate (conditional-sum
    columns), no ObjectHashAggregate from array collection."""
    plan = (
        sketches.fixed_histogram(
            events.select("ep", F.col("user_id").cast("double").alias("value")),
            width_sec=3600, edges=EDGES,
        )._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "ObjectHashAggregate" not in plan, plan


def test_cms_merge_identity_and_overcount_bound(spark, events):
    ev = events.select("ep", (F.col("user_id") % 9).cast("string").alias("item"))
    hour = sketches.cms_rows(ev, item="item", ts="ep", width_sec=3600,
                             depth=3, width=32)
    merged = sketches.cms_merge(hour, width_sec=86400)
    direct = sketches.cms_rows(ev, item="item", ts="ep", width_sec=86400,
                               depth=3, width=32)
    a = sorted(tuple(r) for r in merged.collect())
    b = sorted(tuple(r) for r in direct.collect())
    assert a == b and a  # integer cell sums: merged == direct exactly

    items = ev.select("item").distinct()
    est = {
        (r["bucket"], r["item"]): r["est"]
        for r in sketches.cms_estimate(merged, items, item="item",
                                       depth=3, width=32).collect()
    }
    true = {
        (r["bucket"], r["item"]): r["n"]
        for r in ev.groupBy(
            (F.floor(F.col("ep") / 86400) * 86400).cast("long").alias("bucket"),
            "item",
        ).agg(F.count("*").alias("n")).collect()
    }
    # CMS never undercounts, and with 9 items in 32 cells x 3 rows the
    # deterministic layout happens to be collision-free per row somewhere
    assert set(true) <= set(est)
    for k, n in true.items():
        assert est[k] >= n
    # absent item estimates 0 only if some cell is empty; just pin type/shape
    assert all(isinstance(v, int) for v in est.values())


def test_kmv_incremental_fold_across_batches(spark, events):
    """Streaming/ingest shape: per-micro-batch sketches folded with
    kmv_merge (same width) equal the sketch over all data — distinct
    counts stay exactly maintainable under incremental ingestion."""
    k = 6
    b1 = events.where(F.col("user_id") % 3 == 0)
    b2 = events.where(F.col("user_id") % 3 == 1)
    b3 = events.where(F.col("user_id") % 3 == 2)
    folded = sketches.kmv_merge(
        sketches.kmv_sketch(b1, width_sec=3600, k=k)
        .unionByName(sketches.kmv_sketch(b2, width_sec=3600, k=k))
        .unionByName(sketches.kmv_sketch(b3, width_sec=3600, k=k)),
        width_sec=3600, k=k,
    )
    direct = sketches.kmv_sketch(events, width_sec=3600, k=k)
    assert _collect_sketches(folded) == _collect_sketches(direct)


def test_kmv_merge_rejects_larger_k(spark, events):
    """Merging to a k larger than the inputs were built with would need
    hashes the fine tier discarded -> declared-parameter ValueError."""
    sk = sketches.kmv_sketch(events, width_sec=3600, k=16)
    with pytest.raises(ValueError, match="exceeds built_k"):
        sketches.kmv_merge(sk, width_sec=86400, k=32, built_k=16)
    # equal / smaller k fine
    sketches.kmv_merge(sk, width_sec=86400, k=16, built_k=16)
    sketches.kmv_merge(sk, width_sec=86400, k=8, built_k=16)


def test_histogram_merge_empty_input_guard(spark):
    """nbins inference on an empty sketch frame raises a clear ValueError
    instead of TypeError; explicit nbins works and yields an empty result."""
    empty = spark.createDataFrame([], "bucket long, hist array<long>")
    with pytest.raises(ValueError, match="empty sketch frame"):
        sketches.histogram_merge(empty, width_sec=3600)
    out = sketches.histogram_merge(empty, width_sec=3600, nbins=5)
    assert out.count() == 0 and out.columns == ["bucket", "hist"]
