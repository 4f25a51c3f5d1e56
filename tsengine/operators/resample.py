"""Resampling / gap-fill (SURVEY.md §2.5 W1, W4).

- :func:`distribute` — reference ``distribute_ts`` /
  ``distribute_ts_list`` (timeseries_functions.py:224-302): reindex each
  series to a grid of epochs at multiples of ``seconds``, LOCF ('pad') then
  bfill for leading gaps, or constant ``fill_value`` (no pad/bfill at all,
  tf:294-295).
- :func:`distribute_linear` — reference ``distr_std_timeseries``
  (analysis_functions.py:505-570): linear interpolation onto the grid, with
  meter-reset-aware interpolation from ``reset_value``.

Scale notes: the grid is generated per series with sequence+explode from a
one-row-per-series bounds frame, then gap-filled with a single window over
``series_id`` — one shuffle, partitioned by series, never range-split
mid-series (LOCF must see the whole series).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tsengine.core import TsError


def _grid_bounds(seconds_lit, lo, hi):
    """Exact grid rounding (tf:284-291): e_from ceils to the next multiple,
    e_to floors then +step; python-range end-exclusive means the last grid
    point is ``floor(e_to/s)*s + s`` minus one step when on-grid... pinned:
    grid = [ceil(lo/s)*s, g1) step s where g1 = (floor(hi/s)+1)*s (+s if
    hi not on-grid). Inclusive last point = g1 - s."""
    g0 = seconds_lit * F.floor(lo / seconds_lit)
    g0 = F.when(lo % seconds_lit != 0, g0 + seconds_lit).otherwise(g0)
    g1 = seconds_lit * (F.floor(hi / seconds_lit) + 1)
    g1 = F.when(hi % seconds_lit != 0, g1 + seconds_lit).otherwise(g1)
    return g0.cast("long"), (g1 - seconds_lit).cast("long")


def _grid(df: DataFrame, seconds: int, e_to: int | None, e_from: int | None) -> DataFrame:
    """One grid row per (series_id, grid epoch)."""
    s = F.lit(int(seconds))
    bounds = df.groupBy("series_id").agg(
        F.min("epoch").alias("_lo"), F.max("epoch").alias("_hi")
    )
    lo = F.lit(int(e_from)) if e_from is not None else F.col("_lo")
    hi = F.lit(int(e_to)) if e_to is not None else F.col("_hi")
    g0, g1 = _grid_bounds(s, lo, hi)
    return bounds.select(
        "series_id",
        F.explode(
            F.when(g1 >= g0, F.sequence(g0, g1, F.lit(int(seconds)).cast("long"))).otherwise(
                F.array().cast("array<long>")
            )
        ).alias("epoch"),
    )


def distribute(
    df: DataFrame,
    seconds: int = 300,
    e_to: int | None = None,
    e_from: int | None = None,
    fill_value: float | None = None,
) -> DataFrame:
    """Resample each series to multiples of ``seconds`` with LOCF+bfill.

    Exact reference semantics (SURVEY.md §7.4 items 1-3):
    - grid rounding per tf:284-291;
    - LOCF: a grid point takes the value of the last observation <= it
      (an observation exactly on-grid wins), tf:297;
    - leading NaNs backfilled from the first observation, tf:300;
    - ``fill_value`` given => exact-match reindex with constant fill, no
      pad/bfill (tf:294-295).
    """
    seconds = int(seconds)
    if seconds <= 0:
        raise TsError("seconds must be a positive integer")
    grid = _grid(df, seconds, e_to, e_from)

    if fill_value is not None:
        out = grid.join(df, ["series_id", "epoch"], "left")
        return out.select(
            "series_id", "epoch", F.coalesce("value", F.lit(float(fill_value))).alias("value")
        )

    # LOCF then bfill via one union + two frames of the same window.
    pts = df.select("series_id", "epoch", "value", F.lit(0).alias("_g"))
    g = grid.select("series_id", "epoch", F.lit(None).cast("double").alias("value"), F.lit(1).alias("_g"))
    u = pts.unionByName(g)
    w = Window.partitionBy("series_id").orderBy("epoch", "_g")
    pad = F.last("value", ignorenulls=True).over(w.rowsBetween(Window.unboundedPreceding, 0))
    u = u.withColumn("_pad", pad).filter(F.col("_g") == 1)
    # bfill as a running last() over DESC order: (current, unboundedFollowing)
    # ascending == (unboundedPreceding, current) descending.  The descending
    # frame GROWS row-by-row (O(n) incremental in WindowExec); the ascending
    # first()-over-following frame SHRINKS, which Spark recomputes from
    # scratch per row — O(n^2) per series.
    wb = Window.partitionBy("series_id").orderBy(F.col("epoch").desc())
    bfill = F.last("_pad", ignorenulls=True).over(
        wb.rowsBetween(Window.unboundedPreceding, 0)
    )
    return u.select("series_id", "epoch", bfill.alias("value"))


def distribute_linear(
    df: DataFrame,
    time_int: int = 900,
    monotony: str = "increasing",
    reset_value: float = 0.0,
) -> DataFrame:
    """Linear-interpolation resampling (analysis_functions.py:505-570).

    Grid points from the first multiple of ``time_int`` >= first observation
    up to (but excluding) the last observation; each grid point interpolates
    between its bracketing observations ``v = v0 + (dt2/dt1)*(v1 - v0)``;
    on a meter reset (decrease under 'increasing' / increase under
    'decreasing') interpolate from ``reset_value`` (af:548-555).  A grid
    point coincident with an observation yields the observation's value
    (dt2=0 path).
    """
    step = int(time_int)
    if step <= 0:
        raise TsError("time_int must be a positive integer")
    rv = float(reset_value)

    bounds = df.groupBy("series_id").agg(F.min("epoch").alias("_lo"), F.max("epoch").alias("_hi"))
    g0 = F.lit(step) * F.floor(F.col("_lo") / F.lit(step))
    g0 = F.when(F.col("_lo") % step != 0, g0 + step).otherwise(g0).cast("long")
    # last emitted pivot is strictly below the last observation (af:560-563)
    g1 = (F.lit(step) * F.floor((F.col("_hi") - 1) / F.lit(step))).cast("long")
    grid = bounds.filter(F.col("_hi") > F.col("_lo")).select(
        "series_id",
        F.explode(
            F.when(g1 >= g0, F.sequence(g0, g1, F.lit(step).cast("long"))).otherwise(
                F.array().cast("array<long>")
            )
        ).alias("epoch"),
    )

    pts = df.select("series_id", "epoch", "value", F.lit(0).alias("_g"))
    g = grid.select("series_id", "epoch", F.lit(None).cast("double").alias("value"), F.lit(1).alias("_g"))
    u = pts.unionByName(g)
    # Ordering (epoch, _g): a point at epoch e precedes the grid row at e, so
    # the prev-frame sees coincident points (af:543: ts[i] <= pivot) and the
    # next-frame (starting 1 row after the grid row) only sees strictly later
    # points (af:543: ts[i+1] > pivot).
    w_prev = Window.partitionBy("series_id").orderBy("epoch", "_g")
    # "next observation" = first(...) over the ascending (1, unboundedFollowing)
    # frame — but that frame SHRINKS and Spark recomputes it from scratch per
    # row, O(n^2) per series.  Equivalent GROWING frame: running last() over
    # the exactly-reversed order, excluding the current row.
    w_next = Window.partitionBy("series_id").orderBy(
        F.col("epoch").desc(), F.col("_g").desc()
    )
    u = (
        u.withColumn(
            "_pe",
            F.last(F.when(F.col("_g") == 0, F.col("epoch")), ignorenulls=True).over(
                w_prev.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn(
            "_pv",
            F.last(F.when(F.col("_g") == 0, F.col("value")), ignorenulls=True).over(
                w_prev.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn(
            "_ne",
            F.last(F.when(F.col("_g") == 0, F.col("epoch")), ignorenulls=True).over(
                w_next.rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .withColumn(
            "_nv",
            F.last(F.when(F.col("_g") == 0, F.col("value")), ignorenulls=True).over(
                w_next.rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .filter((F.col("_g") == 1) & F.col("_pe").isNotNull() & F.col("_ne").isNotNull())
    )
    t1 = (F.col("_ne") - F.col("_pe")).cast("double")
    t2 = (F.col("epoch") - F.col("_pe")).cast("double")
    reset = (
        ((F.col("_pv") > F.col("_nv")) & F.lit(monotony == "increasing"))
        | ((F.col("_pv") < F.col("_nv")) & F.lit(monotony == "decreasing"))
    )
    lerped = F.when(
        reset, F.lit(rv) + (t2 / t1) * (F.col("_nv") - F.lit(rv))
    ).otherwise(F.col("_pv") + (t2 / t1) * (F.col("_nv") - F.col("_pv")))
    return u.select("series_id", "epoch", lerped.alias("value"))
