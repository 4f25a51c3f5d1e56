"""Event-stream analytics operators: gap-based sessionization and M4
visual downsampling.  Both pure window/aggregate compositions — one keyed
shuffle each, deterministic under duplicate timestamps, no UDFs.

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
