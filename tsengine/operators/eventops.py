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
