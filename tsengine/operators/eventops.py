"""Event-stream analytics operators: gap-based sessionization, M4 visual
downsampling, exact percentile planes, and per-bucket trend correlation.
All pure window/aggregate compositions — one keyed shuffle each,
deterministic under duplicate timestamps, no UDFs.

- Sessionization: the standard clickstream/telemetry primitive Spark SQL
  has no operator for (``session_window`` exists only in Structured
  Streaming aggregations): a new session starts when the gap since the
  previous event of the same key exceeds ``gap_sec``; the session index is
  the running count of session starts — lag + conditional + running sum.
- M4 (Jugel et al., VLDB 2014): the error-free line-chart downsample —
  per (key, time bucket) keep min/max/first/last values AND their
  timestamps; 4 points per pixel column reproduce the exact rendering of
  the full series.  All extremes are taken via struct-ordered min/max so
  ties resolve deterministically (documented per field), which is what
  makes the operator value-hashable against a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _skew_split(df: DataFrame, by: str, max_per_key: int):
    """(within-cap rows, overflow-key frame) for the per-key skew guard.

    The per-key count is a map-side-combinable aggregate (skew-safe even on
    a degenerate key), and the overflow-key set — keys whose event count
    exceeds the cap — is tiny by construction, so it broadcasts into a
    left_anti join: the hot key's rows are dropped from the expensive
    per-key path WITHOUT any task ever materializing them together."""
    counts = df.groupBy(by).agg(F.count("*").alias("_n"))
    over = counts.where(F.col("_n") > int(max_per_key)).select(by)
    ok = df.join(F.broadcast(over), by, "left_anti")
    return ok, over


def _guarded(df: DataFrame, by: str, max_per_key: int | None, compute):
    """Skew-guard policy shared by every per-key collect/recursion operator
    (ewma / cusum / holt / lttb / funnel): these ops place one key's entire
    series in one task, so a single degenerate key (one conversation with
    10^8 turns) OOMs that task.

    Schema-stable contract (VERDICT r04 task 5): ``overflow`` is ALWAYS a
    column of a guarded op's output, so toggling the cap never changes the
    schema a downstream consumer binds to.  ``max_per_key=None`` (default)
    emits it as constant False and leaves the REST of the plan byte-
    identical to the unguarded operator (one extra literal projection, no
    guard joins).  With a cap, keys exceeding it are EXCLUDED from the
    per-key computation (not truncated — truncation would still sort the hot
    key in one task) and surface as one all-NULL row flagged
    ``overflow=True``; within-cap results carry ``overflow=False``.  Cost
    when enabled: one extra map-side-combine count + a broadcast anti-join —
    no new wide shuffle."""
    if max_per_key is None:
        return compute(df).withColumn("overflow", F.lit(False))
    ok, over = _skew_split(df, by, max_per_key)
    out = compute(ok).withColumn("overflow", F.lit(False))
    pad = over.select(
        F.col(by),
        *[
            F.lit(None).cast(f.dataType).alias(f.name)
            for f in out.schema.fields
            if f.name not in (by, "overflow")
        ],
        F.lit(True).alias("overflow"),
    )
    return out.unionByName(pad)


def sessionize(
    df: DataFrame,
    by: str = "user_id",
    ts: str = "ep",
    gap_sec: int = 1800,
    tiebreak: str | None = None,
) -> DataFrame:
    """Assign each event a per-key ``session_idx`` (1-based): a session
    starts at the first event and whenever ``ts - prev_ts > gap_sec``.
    Equal-gap events (== gap_sec) stay in the session — the usual
    inactivity-timeout convention.

    ``tiebreak`` orders events with identical timestamps deterministically
    (pass a unique column like an event id); required for a stable
    assignment when duplicate timestamps exist.

    One window exchange on ``by``; both the lag and the running sum reuse
    the same sort — Catalyst plans a single Window node pair over one
    Exchange, so the cost at 100 TB is the unavoidable key shuffle."""
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(by).orderBy(*order)
    gap = F.col(ts) - F.lag(ts).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_idx", F.sum(new_sess).over(run).cast("long"))


def time_weighted_avg(
    df: DataFrame,
    by: str = "series_id",
    ts: str = "ep",
    val: str = "value",
    width_sec: int = 3600,
    tiebreak: str | None = None,
) -> DataFrame:
    """LOCF time-weighted average per (key, bucket) — the TimescaleDB
    ``time_weight('LOCF')``/``average`` analogue for irregular samples,
    where a plain ``avg`` over-weights burst periods.

    Each point holds its value until the next point in the SAME bucket;
    the last point extends to the bucket end.  No cross-bucket carry (a
    bucket with no points emits nothing; the first point defines coverage
    start), which keeps the operator a pure window+aggregate composition:

        twa = sum(v_i * (next_ts_i - ts_i)) / (bucket_end - first_ts)

    Duplicate timestamps get zero weight except the last per ``tiebreak``
    order — pass a unique column for a deterministic result.

    One exchange: the lead window partitions by (key, bucket) and the
    groupBy reuses that clustering, so Catalyst plans Window + HashAggregate
    over a single shuffle.  ``covered_sec`` (= bucket_end - first_ts) is
    emitted so callers can gate on coverage."""
    b = (F.floor(F.col(ts) / width_sec) * width_sec).cast("long")
    keep = [F.col(tiebreak)] if tiebreak else []
    base = df.select(F.col(by), b.alias("bucket"), F.col(ts).alias("_t"),
                     F.col(val).alias("_v"), *keep)
    order = [F.col("_t")] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(by, "bucket").orderBy(*order)
    bucket_end = F.col("bucket") + width_sec
    nxt = F.coalesce(F.lead("_t").over(w), bucket_end)
    weighted = base.withColumn("_wt", (nxt - F.col("_t")).cast("double"))
    out = (
        weighted.groupBy(by, "bucket")
        .agg(
            (F.sum(F.col("_v") * F.col("_wt"))
             / F.sum("_wt")).alias("twa"),
            F.sum("_wt").cast("long").alias("covered_sec"),
            F.count("*").alias("n_points"),
        )
    )
    return out


def rolling_zscore(
    df: DataFrame,
    by: str = "series_id",
    ts: str = "ep",
    val: str = "value",
    window_sec: int = 3600,
    k: float = 3.0,
) -> DataFrame:
    """Rolling-window z-score anomaly flags: for every point, mean and
    population stddev over the trailing ``window_sec`` (RANGE frame — all
    points with ts in [cur - window_sec, cur], duplicates included as a
    group, so no tie-break is needed and the result is deterministic under
    duplicate timestamps).  ``zscore`` is NULL when the window stddev is 0
    (constant window / single point); ``is_anomaly`` treats NULL as false.

    One exchange on the key; the RANGE window sorts once and both moments
    share the frame.  At 100 TB this is the streaming-friendly shape —
    state is the trailing window per key, never the whole series."""
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts).cast("long"))
        .rangeBetween(-window_sec, 0)
    )
    v = F.col(val).cast("double")
    mean_w = F.avg(v).over(w)
    std_w = F.stddev_pop(v).over(w)
    z = F.when(std_w > 0, (v - mean_w) / std_w)
    return (
        df.withColumn("mean_w", mean_w)
        .withColumn("std_w", std_w)
        .withColumn("zscore", z)
        .withColumn("is_anomaly", F.coalesce(F.abs(z) > k, F.lit(False)))
    )


def bucket_percentiles(
    df: DataFrame,
    by: str = "series_id",
    ts: str = "ep",
    val: str = "value",
    width_sec: int = 3600,
    ps: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95, 0.99),
) -> DataFrame:
    """Exact latency-SLO percentile plane per (key, bucket): linear-
    interpolated percentiles (``F.percentile`` — exact, sort-based, JVM)
    plus the IQR when both quartiles are requested.  The per-bucket group
    is the unit a tier rollup emits, so group cardinality is bounded by
    bucket width — exact sort-based percentiles stay cheap at 100 TB
    because the sort is per-group inside one hash aggregate, never a
    global sort.  One shuffle on (key, bucket).

    Column names: ``p25, p50, ...`` (``0.95 -> p95``, ``0.999 -> p99_9``).
    """
    b = (F.floor(F.col(ts) / width_sec) * width_sec).cast("long")
    v = F.col(val).cast("double")
    base = df.select(F.col(by), b.alias("bucket"), v.alias("_v"))
    pcts = F.percentile(F.col("_v"), F.array(*[F.lit(p) for p in ps]))
    agg = base.groupBy(by, "bucket").agg(
        pcts.alias("_p"), F.count("*").alias("n_points")
    )

    def pname(p: float) -> str:
        s = ("%g" % (100 * p)).replace(".", "_")
        return f"p{s}"

    cols = [F.col("_p")[i].alias(pname(p)) for i, p in enumerate(ps)]
    out = agg.select(by, "bucket", *cols, "n_points")
    if 0.25 in ps and 0.75 in ps:
        out = out.withColumn("iqr", F.col(pname(0.75)) - F.col(pname(0.25)))
    return out


def bucket_corr(
    df: DataFrame,
    by: str = "series_id",
    ts: str = "ep",
    x: str = "ep",
    y: str = "value",
    width_sec: int = 86400,
) -> DataFrame:
    """Pearson correlation between two planes per (key, bucket) — with
    ``x=ts`` this is the cheap within-bucket trend detector (is the metric
    drifting over the day?); with ``x`` = another measure it's a
    co-movement screen.  ``r`` is NULL when either plane has zero variance
    or fewer than 2 points (callers decide the neutral value).  Single
    codegen hash aggregate — covar/stddev are one-pass (co)moment
    accumulation, so it map-side combines and the shuffle carries 5
    doubles per group.  Assembled as try_divide(covar_samp, sx*sy) rather
    than ``F.corr`` because under ANSI mode (Spark 4 default) corr raises
    DIVIDE_BY_ZERO on a zero-variance group instead of returning NULL."""
    b = (F.floor(F.col(ts) / width_sec) * width_sec).cast("long")
    base = df.select(
        F.col(by),
        b.alias("bucket"),
        F.col(x).cast("double").alias("_x"),
        F.col(y).cast("double").alias("_y"),
    )
    agg = base.groupBy(by, "bucket").agg(
        F.covar_samp("_x", "_y").alias("_cv"),
        F.stddev_samp("_x").alias("_sx"),
        F.stddev_samp("_y").alias("_sy"),
        F.count("*").alias("n_points"),
    )
    r = F.when(
        (F.col("_sx") > 0) & (F.col("_sy") > 0),
        F.try_divide(F.col("_cv"), F.col("_sx") * F.col("_sy")),
    )
    return agg.select(by, "bucket", r.alias("r"), "n_points")


def m4_downsample(
    df: DataFrame,
    by: str = "series_id",
    ts: str = "ep",
    val: str = "value",
    width_sec: int = 3600,
) -> DataFrame:
    """M4 downsample: one row per (key, bucket) carrying the four
    rendering-exact points — first/last by time, min/max by value — with
    their timestamps.  Tie resolution (deterministic, mirrored in oracles):
    at equal first/last timestamp the smaller/larger value wins; at equal
    min/max value the earlier/later timestamp wins.  Pure hash aggregate:
    one shuffle on (key, bucket), codegen min/max over packed structs."""
    b = (F.floor(F.col(ts) / width_sec) * width_sec).cast("long")
    t, v = F.col(ts), F.col(val)
    agg = (
        df.select(F.col(by), b.alias("bucket"), t.alias("_t"), v.alias("_v"))
        .groupBy(by, "bucket")
        .agg(
            F.min(F.struct(F.col("_t"), F.col("_v"))).alias("_f"),
            F.max(F.struct(F.col("_t"), F.col("_v"))).alias("_l"),
            F.min(F.struct(F.col("_v"), F.col("_t"))).alias("_mn"),
            F.max(F.struct(F.col("_v"), F.col("_t"))).alias("_mx"),
            F.count("*").alias("n_points"),
        )
    )
    return agg.select(
        by,
        "bucket",
        F.col("_f._t").alias("ts_first"),
        F.col("_f._v").alias("v_first"),
        F.col("_l._t").alias("ts_last"),
        F.col("_l._v").alias("v_last"),
        F.col("_mn._t").alias("ts_min"),
        F.col("_mn._v").alias("v_min"),
        F.col("_mx._t").alias("ts_max"),
        F.col("_mx._v").alias("v_max"),
        "n_points",
    )


def ewma(
    df: DataFrame,
    by: str = "series_id",
    ts: str = "ep",
    val: str = "value",
    alpha: float = 0.3,
    tiebreak: str | None = None,
    max_per_key: int | None = None,
) -> DataFrame:
    """Exponentially weighted moving average per key:
    ``ewma_0 = x_0; ewma_i = alpha*x_i + (1-alpha)*ewma_{i-1}`` (pandas
    ``ewm(alpha, adjust=False)`` semantics).  Inherently sequential per
    series, so this is the documented applyInPandas shape: one shuffle on
    the key, then a vectorized in-memory recursion per group (numpy
    lfilter-style loop over the group, not per-row Python at the Spark
    row level).  At 100 TB the group is one conversation/device series —
    bounded — and the shuffle is the same key exchange every other
    per-series operator pays.

    ``tiebreak`` orders duplicate timestamps deterministically.  Output:
    input columns + ``ewma``.  ``max_per_key`` enables the shared skew
    guard (see :func:`_guarded`): degenerate keys are excluded and flagged
    instead of OOMing their task.
    """
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    order = [ts] + ([tiebreak] if tiebreak else [])
    # fresh StructType: StructType.add MUTATES (and df.schema is cached on
    # the DataFrame), so deriving the output schema in place corrupts the
    # input's resolved schema
    out_schema = StructType(
        list(df.schema.fields) + [StructField("ewma", DoubleType())]
    )

    def _per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        x = pdf[val].astype("float64").to_numpy()
        e = x.copy()
        a = float(alpha)
        # identical op order to the SQL-recursion oracle: a*x + (1-a)*prev
        for i in range(1, len(e)):
            e[i] = a * x[i] + (1.0 - a) * e[i - 1]
        pdf = pdf.assign(ewma=e)
        return pdf

    return _guarded(
        df, by, max_per_key,
        lambda d: d.groupBy(by).applyInPandas(_per_key, schema=out_schema),
    )


def lttb_downsample(
    df: DataFrame,
    by: str = "series_id",
    ts: str = "ep",
    val: str = "value",
    n_out: int = 100,
    max_per_key: int | None = None,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsample (Steinarsson 2013): keep
    the first and last point; partition the interior into ``n_out - 2``
    equal-count buckets; in each bucket keep the point maximizing the
    triangle area with the previously selected point and the NEXT bucket's
    centroid.  The selection is sequential (each pick feeds the next
    triangle), so like ``ewma`` this is a per-series applyInPandas — the
    inner loop runs once per OUTPUT bucket with a vectorized argmax over
    the bucket's points, never per input row.

    Series with <= n_out points pass through unchanged.  Output columns:
    (by, ts, val) of the selected points only.  ``max_per_key`` enables
    the shared skew guard (:func:`_guarded`).
    """
    import numpy as np
    import pandas as pd

    def _per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts], kind="mergesort")
        n = len(pdf)
        if n <= n_out:
            return pdf[[by, ts, val]]
        t = pdf[ts].astype("float64").to_numpy()
        v = pdf[val].astype("float64").to_numpy()
        # bucket k covers interior indices [edges[k], edges[k+1]) — the
        # canonical floor split (Steinarsson's reference implementation)
        edges = (1 + np.floor(
            np.arange(n_out - 1, dtype="float64") * (n - 2) / (n_out - 2)
        )).astype("int64")
        sel = np.empty(n_out, dtype="int64")
        sel[0], sel[-1] = 0, n - 1
        prev = 0
        for k in range(n_out - 2):
            lo, hi = edges[k], edges[k + 1]
            if k + 1 < n_out - 2:
                nlo, nhi = edges[k + 1], edges[k + 2]
                cx, cy = t[nlo:nhi].mean(), v[nlo:nhi].mean()
            else:
                cx, cy = t[n - 1], v[n - 1]
            area = np.abs(
                (t[prev] - cx) * (v[lo:hi] - v[prev])
                - (t[prev] - t[lo:hi]) * (cy - v[prev])
            )
            prev = lo + int(np.argmax(area))
            sel[k + 1] = prev
        return pdf.iloc[sel][[by, ts, val]]

    base = df.select(by, ts, val)
    return _guarded(
        base, by, max_per_key,
        lambda d: d.groupBy(by).applyInPandas(_per_key, schema=base.schema),
    )


def percentiles_approx(
    df: DataFrame,
    by: str | None = None,
    val: str = "value",
    ps: tuple[float, ...] = (0.5, 0.95, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Scale-path percentiles: Spark's one-pass mergeable quantile sketch
    (``percentile_approx``, Greenwald-Khanna) with error bounded by
    1/accuracy of the rank.  This is the right tool where
    :func:`bucket_percentiles`' exact per-group sort is not — GLOBAL
    percentiles or groups with unbounded cardinality (a hot conversation's
    whole history): the sketch is fixed-size per group, combines map-side,
    and never materializes or sorts the group.  ``by=None`` emits a single
    global row via a partial-aggregating two-stage plan (no single-task
    sort).  Results are approximate, so nothing here is oracle-hashable —
    accuracy is pinned by tests against the exact operator instead."""
    v = F.col(val).cast("double")
    pcts = F.percentile_approx(
        v, F.array(*[F.lit(p) for p in ps]), F.lit(accuracy)
    )
    grouped = df.groupBy(by) if by else df.groupBy()
    agg = grouped.agg(pcts.alias("_p"), F.count("*").alias("n_points"))

    def pname(p: float) -> str:
        return "p" + ("%g" % (100 * p)).replace(".", "_")

    cols = [F.col("_p")[i].alias(pname(p)) for i, p in enumerate(ps)]
    keys = [by] if by else []
    return agg.select(*keys, *cols, "n_points")


def cusum(
    df: DataFrame,
    by: str = "series_id",
    ts: str = "ep",
    val: str = "value",
    target: float = 0.0,
    k: float = 0.5,
    h: float = 5.0,
    tiebreak: str | None = None,
    max_per_key: int | None = None,
) -> DataFrame:
    """Tabular CUSUM change-point detector (Page 1954): one-sided upper and
    lower cumulative sums against a ``target`` level with slack ``k``,
    alarming when either exceeds ``h``:

        sh_i = max(0, sh_{i-1} + x_i - (target + k))
        sl_i = max(0, sl_{i-1} + (target - k) - x_i)

    Complements :func:`rolling_zscore`: z-scores flag outlier POINTS, CUSUM
    accumulates small persistent drifts a windowed z never sees.  Like
    :func:`ewma` the recursion is inherently sequential per series, so it's
    the applyInPandas shape — one key shuffle, vectorized numpy loop per
    group (the op order matches the SQL-recursion oracle exactly).  Output:
    input columns + ``cusum_hi``, ``cusum_lo``, ``alarm``.  ``max_per_key``
    enables the shared skew guard (:func:`_guarded`)."""
    import pandas as pd
    from pyspark.sql.types import BooleanType, DoubleType, StructField, StructType

    order = [ts] + ([tiebreak] if tiebreak else [])
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("cusum_hi", DoubleType()),
            StructField("cusum_lo", DoubleType()),
            StructField("alarm", BooleanType()),
        ]
    )
    up, lo_ref = float(target + k), float(target - k)

    def _per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        x = pdf[val].astype("float64").to_numpy()
        n = len(x)
        sh = x.copy()
        sl = x.copy()
        ph = pl = 0.0
        for i in range(n):
            # identical op order to the recursive-CTE oracle
            ph = max(0.0, ph + (x[i] - up))
            pl = max(0.0, pl + (lo_ref - x[i]))
            sh[i], sl[i] = ph, pl
        return pdf.assign(
            cusum_hi=sh, cusum_lo=sl, alarm=(sh > h) | (sl > h)
        )

    return _guarded(
        df, by, max_per_key,
        lambda d: d.groupBy(by).applyInPandas(_per_key, schema=out_schema),
    )


def top_items(
    df: DataFrame,
    by: str = "series_id",
    ts: str = "ep",
    item: str = "value",
    width_sec: int = 86400,
    k: int = 3,
) -> DataFrame:
    """Exact top-k heavy hitters per (key, bucket): the 'top tools per
    day' report.  Counts per (key, bucket, item) combine map-side, then a
    rank window over the tiny counted frame keeps the k most frequent —
    ties broken by item value ascending (deterministic, oracle-hashable).
    The rank window runs over post-aggregation rows (one per distinct
    item), so its sort is bounded by item cardinality, never by event
    volume.  Approximate alternatives (count-min) only matter when the
    per-bucket item cardinality itself cannot be aggregated; at that point
    fold the item into the bucket key and recurse."""
    b = (F.floor(F.col(ts) / width_sec) * width_sec).cast("long")
    counted = (
        df.select(F.col(by), b.alias("bucket"), F.col(item).alias("_it"))
        .groupBy(by, "bucket", "_it")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy(by, "bucket").orderBy(
        F.col("n").desc(), F.col("_it").asc()
    )
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(by, "bucket", F.col("_it").alias(item), "n", "rank")
    )


def cohort_retention(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ep",
    width_sec: int = 86400,
    max_offset: int | None = None,
    max_per_key: int | None = None,
) -> DataFrame:
    """Cohort retention matrix: users grouped by their FIRST active bucket
    (the cohort), counted again at each later bucket they return in.

    Output: (cohort, offset, n_users, retention) — ``offset`` in buckets
    from the cohort bucket (0 = the cohort itself), ``retention`` =
    n_users / cohort size, rounded to 6dp.  The curation use: data mixes
    are often staged by acquisition wave; retention per wave is the gate
    for whether a wave's users keep producing data worth sampling.

    Scale shape — two exchanges total, both on bounded frames:
    1. ``groupBy(key).agg(collect_set(bucket))`` dedups (key, bucket)
       map-side AND yields the per-user activity set + its min (the
       cohort) in ONE pass; the set is bounded by the retention window's
       bucket count (e.g. <= 365 for a year of days), never event volume.
    2. explode + ``groupBy(cohort, offset).count()`` — each exploded row
       is one distinct (user, bucket), so count(*) IS the distinct-user
       count; the post-agg cohort-size window runs over the tiny
       (cohort, offset) matrix.

    The collect_set is bounded by DISTINCT buckets, not events, so skew
    needs an unbounded timespan rather than a hot key — but a degenerate
    user spanning millions of buckets still lands whole in one task.
    ``max_per_key`` (cap on a user's raw EVENT count) excludes such users
    via the shared :func:`_skew_split` guard; because users don't appear
    in the output matrix, the excluded population surfaces as ONE summary
    row ``(cohort=NULL, offset=NULL, n_users=<excluded count>,
    retention=NULL, overflow=True)`` — emitted only when non-empty — and
    all matrix rows gain ``overflow=False``.  Default None: ``overflow``
    still present as constant False (schema-stable contract, VERDICT r04
    task 5), rest of the plan unchanged.
    """
    b = (F.floor(F.col(ts) / width_sec) * width_sec).cast("long")
    src = df.select(F.col(key).alias("_k"), b.alias("_b"))
    over = None
    if max_per_key is not None:
        src, over = _skew_split(src, "_k", max_per_key)
    per_user = (
        src
        .groupBy("_k")
        .agg(F.collect_set("_b").alias("_bs"))
        .select(
            F.array_min("_bs").alias("cohort"), F.explode("_bs").alias("_b")
        )
    )
    act = per_user.select(
        "cohort",
        ((F.col("_b") - F.col("cohort")) / width_sec).cast("long").alias("offset"),
    )
    if max_offset is not None:
        act = act.where(F.col("offset") <= int(max_offset))
    counts = act.groupBy("cohort", "offset").agg(
        F.count("*").alias("n_users")
    )
    w = Window.partitionBy("cohort")
    out = counts.select(
        "cohort",
        "offset",
        "n_users",
        F.round(
            F.col("n_users")
            / F.max(F.when(F.col("offset") == 0, F.col("n_users"))).over(w),
            6,
        ).alias("retention"),
    )
    if over is None:
        return out.withColumn("overflow", F.lit(False))
    pad = (
        over.agg(F.count("*").alias("n_users"))
        .where(F.col("n_users") > 0)
        .select(
            F.lit(None).cast("long").alias("cohort"),
            F.lit(None).cast("long").alias("offset"),
            F.col("n_users"),
            F.lit(None).cast("double").alias("retention"),
            F.lit(True).alias("overflow"),
        )
    )
    return out.withColumn("overflow", F.lit(False)).unionByName(pad)


def funnel(
    df: DataFrame,
    steps: list[str],
    by: str = "user_id",
    ts: str = "ep",
    event_col: str = "event_type",
    within_sec: int | None = None,
    max_per_key: int | None = None,
) -> DataFrame:
    """Ordered-sequence conversion funnel: the earliest time each user
    completes step i AFTER (>=, so same-second chains count) their step
    i-1 completion, all inside ``within_sec`` of the FIRST step (the
    standard windowed-funnel greedy rule — ClickHouse windowFunnel /
    Amplitude semantics).

    Output: one row per user that performed step 1 at least once —
    ``t_<step>`` epoch columns (NULL once the chain breaks) and
    ``steps_reached``.

    Shape: one exchange.  Irrelevant event types are filtered BEFORE the
    per-user ``collect_list`` (predicate lands in the scan), so the folded
    array holds only funnel events; the fold itself is a JVM higher-order
    ``aggregate`` over the (ts, step)-sorted array with K-slot state — no
    Python, no window, no self-joins (a K-way chained-join formulation
    pays K-1 extra shuffles).  Per-user array size is bounded by that
    user's funnel-event count; ``max_per_key`` caps it with the shared
    skew guard (:func:`_guarded`) — a degenerate user (funnel-event count
    over the cap, AFTER the event-type filter) surfaces as one row with
    NULL step times and ``overflow=True`` instead of OOMing a task.
    """
    if len(set(steps)) != len(steps) or not steps:
        raise ValueError("steps must be non-empty and distinct")
    k = len(steps)
    step_idx = F.when(F.col(event_col) == steps[0], 0)
    for i, s in enumerate(steps[1:], 1):
        step_idx = step_idx.when(F.col(event_col) == s, i)
    ev = (
        df.select(F.col(by), F.col(ts).alias("_t"), step_idx.alias("_s"))
        .where(F.col("_s").isNotNull())
    )

    def _upd(acc, e):
        def slot(i):
            if i == 0:
                hit = acc[0].isNull() & (e["_s"] == 0)
            else:
                hit = (
                    acc[i].isNull()
                    & (e["_s"] == i)
                    & acc[i - 1].isNotNull()
                    & (e["_t"] >= acc[i - 1])
                )
                if within_sec is not None:
                    hit = hit & (e["_t"] <= acc[0] + int(within_sec))
            return F.when(hit, e["_t"]).otherwise(acc[i])

        return F.array(*[slot(i) for i in range(k)])

    init = F.array(*[F.lit(None).cast("long") for _ in range(k)])

    def _compute(evd: DataFrame) -> DataFrame:
        arr = evd.groupBy(by).agg(
            F.sort_array(F.collect_list(F.struct("_t", "_s"))).alias("_ev")
        )
        st = arr.select(by, F.aggregate("_ev", init, _upd).alias("_st"))
        out = st.select(
            by,
            *[
                F.element_at("_st", i + 1).alias(f"t_{s}")
                for i, s in enumerate(steps)
            ],
            F.size(F.filter("_st", lambda x: x.isNotNull())).cast("long").alias(
                "steps_reached"
            ),
        )
        return out.where(F.col(f"t_{steps[0]}").isNotNull())

    return _guarded(ev, by, max_per_key, _compute)


def hopping_rollup(
    df: DataFrame,
    ts: str = "ep",
    val: str = "value",
    width_sec: int = 3600,
    slide_sec: int = 900,
    min_count: int = 1,
) -> DataFrame:
    """Hopping (sliding) window aggregates: each event lands in
    width/slide overlapping windows — the smoothing variant of the tier
    buckets (tumbling = width == slide), e.g. '1h load, refreshed every
    15m'.  Uses Spark's native ``window()`` expression (the same operator
    Structured Streaming plans for watermarked sliding aggregates), which
    expands each row to its window starts BEFORE the shuffle; the
    aggregate itself stays a codegen HashAggregate with map-side combine.
    Output: (w_start epoch, n, sum_val, mean_val).  Replication factor is
    width/slide — bounded and explicit, the scale cost a caller opts into.
    """
    if width_sec % slide_sec:
        raise ValueError("width_sec must be a multiple of slide_sec")
    w = F.window(
        F.timestamp_seconds(F.col(ts)), f"{width_sec} seconds", f"{slide_sec} seconds"
    )
    return (
        df.select(w.alias("_w"), F.col(val).cast("double").alias("_v"))
        .groupBy(F.col("_w.start").cast("long").alias("w_start"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("_v"), 6).alias("sum_val"),
            F.round(F.sum("_v") / F.count("*"), 6).alias("mean_val"),
        )
        .where(F.col("n") >= min_count)
    )


def autocorr(
    df: DataFrame,
    by: str = "series_id",
    ts: str = "ep",
    val: str = "value",
    lag_k: int = 1,
    tiebreak: str | None = None,
) -> DataFrame:
    """Lag-k autocorrelation per series: Pearson r between the value plane
    and its k-step-lagged self under (ts, tiebreak) ordering — the
    seasonality/persistence screen (lag 1 = short-term persistence, lag =
    one period = seasonality).  One exchange: the lag window partitions by
    the key and the aggregate reuses that clustering.  NULL when either
    plane of the overlap has zero variance or fewer than 2 pairs (same
    contract as :func:`bucket_corr`, and same try_divide assembly — ANSI
    corr raises on zero variance)."""
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(by).orderBy(*order)
    pair = (
        df.select(
            F.col(by),
            F.col(val).cast("double").alias("_y"),
            F.lag(F.col(val).cast("double"), lag_k).over(w).alias("_x"),
        )
        .where(F.col("_x").isNotNull())
    )
    agg = pair.groupBy(by).agg(
        F.covar_samp("_x", "_y").alias("_cv"),
        F.stddev_samp("_x").alias("_sx"),
        F.stddev_samp("_y").alias("_sy"),
        F.count("*").alias("n_pairs"),
    )
    r = F.when(
        (F.col("_sx") > 0) & (F.col("_sy") > 0),
        F.try_divide(F.col("_cv"), F.col("_sx") * F.col("_sy")),
    )
    return agg.select(
        by, F.lit(lag_k).cast("long").alias("lag"), r.alias("r"), "n_pairs"
    )


def state_durations(
    df: DataFrame,
    by: str = "series_id",
    ts: str = "ep",
    state: str = "state",
    width_sec: int = 3600,
    tiebreak: str | None = None,
) -> DataFrame:
    """Seconds spent in each categorical state per (key, bucket) — the
    TimescaleDB ``state_agg``/``duration_in`` analogue (for transcripts:
    wall-time per role/tool state per hour).  Each event starts an LOCF
    hold [t, next_t); the final event's hold extends to the end of its own
    bucket (no open-ended tail).  Unlike :func:`time_weighted_avg`, holds
    CROSS bucket boundaries: each hold explodes over the buckets it covers
    (``sequence()``, executor-side — the explode factor is hold-length /
    width, which is the inherent output size) and is clipped per bucket.

    Duplicate timestamps: earlier duplicates (by ``tiebreak`` order) hold
    for zero seconds and are dropped; the last one carries the state —
    deterministic given a unique tiebreak.  One keyed window exchange,
    then the post-explode aggregate."""
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(by).orderBy(*order)
    own_bucket_end = (
        F.floor(F.col(ts) / width_sec) * width_sec + width_sec
    ).cast("long")
    h = df.select(
        F.col(by),
        F.col(state).alias("_s"),
        F.col(ts).alias("_t"),
        F.coalesce(F.lead(ts).over(w).cast("long"), own_bucket_end).alias("_e"),
    ).where(F.col("_e") > F.col("_t"))
    b = F.explode(
        F.sequence(
            (F.floor(F.col("_t") / width_sec) * width_sec).cast("long"),
            (F.floor((F.col("_e") - 1) / width_sec) * width_sec).cast("long"),
            F.lit(width_sec).cast("long"),
        )
    )
    x = h.select(F.col(by), "_s", "_t", "_e", b.alias("bucket"))
    return (
        x.groupBy(by, "bucket", F.col("_s").alias(state))
        .agg(
            F.sum(
                F.least(F.col("_e"), F.col("bucket") + width_sec)
                - F.greatest(F.col("_t"), F.col("bucket"))
            ).cast("long").alias("sec"),
            F.count("*").alias("n_holds"),
        )
    )


def derivative(
    df: DataFrame,
    by: str = "series_id",
    ts: str = "ep",
    val: str = "value",
    per_sec: int = 1,
    tiebreak: str | None = None,
) -> DataFrame:
    """Point-wise rate of change dv/dt scaled to ``per_sec`` (InfluxDB
    ``derivative`` / PromQL instantaneous-rate shape, without counter-reset
    semantics — resets belong to :mod:`increments`).  First point per
    series emits NULL; duplicate timestamps emit NULL (dt=0 — try_divide,
    never a crash).  One keyed window exchange."""
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(by).orderBy(*order)
    dv = F.col(val).cast("double") - F.lag(F.col(val).cast("double")).over(w)
    dt = (F.col(ts) - F.lag(ts).over(w)).cast("double")
    return df.select(
        F.col(by), F.col(ts), F.col(val),
        (F.try_divide(dv, dt) * float(per_sec)).alias("deriv"),
    )


def trapezoid_integral(
    df: DataFrame,
    by: str = "series_id",
    ts: str = "ep",
    val: str = "value",
    width_sec: int = 3600,
    tiebreak: str | None = None,
) -> DataFrame:
    """Linear-interpolation integral per (key, bucket) (InfluxDB
    ``integral`` / TimescaleDB time_weight('linear')): sum of trapezoid
    areas (v_i + v_{i+1})/2 · dt over consecutive in-bucket pairs.  Same
    within-bucket contract as :func:`time_weighted_avg` (no cross-bucket
    carry; single-point buckets integrate to 0 but still emit coverage),
    and the same one-exchange Window+HashAggregate shape."""
    b = (F.floor(F.col(ts) / width_sec) * width_sec).cast("long")
    order = [F.col("_t")] + ([F.col(tiebreak)] if tiebreak else [])
    base = df.select(
        F.col(by), b.alias("bucket"), F.col(ts).alias("_t"),
        F.col(val).cast("double").alias("_v"),
        *([F.col(tiebreak)] if tiebreak else []),
    )
    w = Window.partitionBy(by, "bucket").orderBy(*order)
    nxt_t = F.lead("_t").over(w)
    nxt_v = F.lead("_v").over(w)
    area = (F.col("_v") + nxt_v) / 2.0 * (nxt_t - F.col("_t")).cast("double")
    return (
        base.withColumn("_a", area)
        .groupBy(by, "bucket")
        .agg(
            F.round(F.coalesce(F.sum("_a"), F.lit(0.0)), 6).alias("integral"),
            (F.max("_t") - F.min("_t")).cast("long").alias("covered_sec"),
            F.count("*").alias("n_points"),
        )
    )


def holt_smooth(
    df: DataFrame,
    by: str = "series_id",
    ts: str = "ep",
    val: str = "value",
    alpha: float = 0.3,
    beta: float = 0.1,
    tiebreak: str | None = None,
    max_per_key: int | None = None,
) -> DataFrame:
    """Holt double exponential smoothing per key (level + trend):

        l_0 = x_0;              b_0 = 0
        l_i = alpha*x_i + (1-alpha)*(l_{i-1} + b_{i-1})
        b_i = beta*(l_i - l_{i-1}) + (1-beta)*b_{i-1}

    where :func:`ewma` tracks a level only (lags persistent trends), Holt
    follows them — the one-step forecast is ``level + trend``.  Same
    applyInPandas recursion shape as ewma/cusum: one key shuffle, then a
    bounded in-memory loop per series; the DuckDB oracle carries (l, b)
    through a RECURSIVE CTE with the identical op order so doubles match
    bitwise.  Output: input columns + ``level``, ``trend``.
    ``max_per_key`` enables the shared skew guard (:func:`_guarded`)."""
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    order = [ts] + ([tiebreak] if tiebreak else [])
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField("level", DoubleType()), StructField("trend", DoubleType())]
    )
    a, bb = float(alpha), float(beta)

    def _per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        x = pdf[val].astype("float64").to_numpy()
        lv = x.copy()
        tr = x * 0.0
        for i in range(1, len(x)):
            prev = lv[i - 1]
            lv[i] = a * x[i] + (1.0 - a) * (prev + tr[i - 1])
            tr[i] = bb * (lv[i] - prev) + (1.0 - bb) * tr[i - 1]
        return pdf.assign(level=lv, trend=tr)

    return _guarded(
        df, by, max_per_key,
        lambda d: d.groupBy(by).applyInPandas(_per_key, schema=out_schema),
    )


def session_stats(
    df: DataFrame,
    by: str = "user_id",
    ts: str = "ep",
    val: str | None = None,
    gap_sec: int = 1800,
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-session rollup over :func:`sessionize`: start/end/duration,
    event count, optional value sum.  STILL one exchange: the session
    window partitions by the key, and ``groupBy(key, session_idx)``'s
    clustering is satisfied by that same key partitioning (all rows of a
    group are already co-located), so Catalyst plans Window +
    HashAggregate over a single shuffle — session analytics at the cost
    of the sessionization itself."""
    s = sessionize(df, by=by, ts=ts, gap_sec=gap_sec, tiebreak=tiebreak)
    aggs = [
        F.count("*").alias("n_events"),
        F.min(ts).alias("start_ep"),
        F.max(ts).alias("end_ep"),
        (F.max(ts) - F.min(ts)).cast("long").alias("duration_sec"),
    ]
    if val is not None:
        aggs.append(F.round(F.sum(F.col(val).cast("double")), 6).alias("value_sum"))
    return s.groupBy(by, "session_idx").agg(*aggs)


def decayed_counts(
    df: DataFrame,
    by: str = "user_id",
    item: str = "event_type",
    ts: str = "ep",
    ref_ts: int | None = None,
    width_sec: int = 86400,
    decay: float = 0.5,
    on_future: str = "raise",
) -> DataFrame:
    """Exponentially time-decayed item scores per key — the ranking/feed
    primitive: score = Σ decay^age_buckets over the key's events, so
    yesterday counts ``decay`` times today.  One codegen HashAggregate
    with map-side combine (the decayed sum is a plain sum of per-row
    powers — unlike a windowed recursion, it reaggregates, and coarser
    reference points just rescale by a power of decay).

    ``ref_ts`` anchors age 0 and must be supplied for a deterministic
    result (deriving it from max(ts) would make every score depend on the
    newest event).  With the default ``decay=0.5`` every term is a dyadic
    rational and all partial sums are EXACT in binary floating point —
    PRECONDITION: the data's age span must stay under 53 buckets (the
    double mantissa); beyond that, map-side summation order makes the low
    bits nondeterministic and any zero-tolerance cross-engine comparison
    goes flaky.  Callers comparing bitwise must pin their span (see
    q_decayed_counts).

    Events NEWER than ``ref_ts`` would get weights decay^(-age) > 1;
    ``on_future`` picks the policy: ``"raise"`` (default — fail the job at
    execution via an in-plan guard, no extra action), ``"clamp"`` (age
    floors at 0 so future events weigh 1.0), or ``"allow"`` (explicitly
    accept super-unit weights)."""
    if ref_ts is None:
        raise ValueError("ref_ts is required (deterministic age anchor)")
    if on_future not in ("raise", "clamp", "allow"):
        raise ValueError(f"on_future must be raise|clamp|allow, got {on_future!r}")
    age = (
        F.floor(F.lit(int(ref_ts)) / width_sec) - F.floor(F.col(ts) / width_sec)
    ).cast("double")
    if on_future == "clamp":
        age = F.greatest(age, F.lit(0.0))
    elif on_future == "raise":
        age = F.when(
            age < 0,
            F.raise_error(
                F.lit(
                    "decayed_counts: event newer than ref_ts (weight would "
                    "exceed 1); pass on_future='clamp' or 'allow'"
                )
            ).cast("double"),
        ).otherwise(age)
    return (
        df.groupBy(by, item)
        .agg(F.sum(F.pow(F.lit(float(decay)), age)).alias("score"),
             F.count("*").alias("n"))
    )
