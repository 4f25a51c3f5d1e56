"""Time-series join operators Spark's DataFrame API lacks: as-of join and
range (interval) join, expressed as scalable compositions of built-in ops —
no UDF, no cross join, no driver-side state.

As-of join (pandas ``merge_asof`` / kdb ``aj`` / DuckDB ``ASOF JOIN``):
each left row picks the most recent right row at-or-before its timestamp,
per key.  The classic distributed rewrite is NOT a join at all: union both
sides, one window partitioned by key ordered by (ts, side), and fill the
right-side payload forward with ``last(..., ignorenulls)`` over an
unbounded-preceding running frame — O(n log n) per key, one shuffle total,
versus the naive inequality join's per-key quadratic blowup.

Range join: matching events to enclosing intervals with a plain
``l.ts >= r.start AND l.ts < r.end`` predicate gives Spark a broadcast
nested-loop / cartesian plan — O(|events| x |intervals|) per key.  The
scalable shape buckets time at a fixed width, explodes each interval into
the buckets it overlaps, equi-joins on (key, bucket), then applies the
range predicate as a residual filter — the same strategy Databricks' range
join optimization and KV-store interval indexes use.  Correct for ANY
bucket width; width tunes the explode factor (pick ~ the typical interval
length so most intervals hit 1-2 buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Backward inclusive as-of join: every ``left`` row gains the payload of
    the latest ``right`` row with ``right.on <= left.on`` and equal ``by``
    keys (NULLs when no such row — left-join semantics).  The matched right
    timestamp is exposed as ``{on}{suffix}``.

    When several right rows share (by, on), the one with the greatest
    payload struct wins — deterministic; pre-aggregate the right side if a
    different pick is wanted.

    One shuffle (the window exchange); both inputs are scanned once.  Skewed
    hot keys behave like any windowed aggregate (a single key's rows sort
    within one partition) — pre-split pathological keys upstream if needed.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    right_cols = right_cols or [
        c for c in right.columns if c not in set(by) | {on}
    ]
    payload = F.struct(F.col(on).alias(on), *[F.col(c) for c in right_cols])
    r = right.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(0).alias("_side"),
        payload.alias("_p"),
    )
    # ties on (by, ts) between right rows: keep ONE deterministic winner per
    # (by, t) — max payload struct (lexicographic) — so the fill is stable
    r = r.groupBy(*by, "_t", "_side").agg(F.max("_p").alias("_p"))
    lcols = [c for c in left.columns]
    l = left.select(
        *[F.col(c) for c in lcols],
        F.col(on).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
    )
    # right rows sort BEFORE left rows at equal ts (side 0 < 1) -> inclusive
    w = (
        Window.partitionBy(*by)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # align schemas for the union: left carries its own columns, right rows
    # carry NULLs for them (shared `by` keys come through as themselves)
    r_aligned = r.select(
        *[F.col(c) if c in by else F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        "_t", "_side", "_p",
    )
    u = l.unionByName(r_aligned)
    u = u.withColumn("_pf", F.last("_p", ignorenulls=True).over(w))
    out = u.where(F.col("_side") == 1).select(
        *lcols,
        F.col(f"_pf.{on}").alias(f"{on}{suffix}"),
        *[F.col(f"_pf.{c}").alias(c) for c in right_cols],
    )
    return out


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    by: str | list[str] | None = None,
    on: str = "ts",
    start: str = "start",
    end: str = "end",
    bucket_sec: int = 3600,
) -> DataFrame:
    """Inner join of ``left`` rows onto every interval with
    ``start <= on < end`` and equal ``by`` keys, via time-bucket explode +
    equi-join + residual filter (never a nested-loop cross product).

    ``on``/``start``/``end`` are epoch-second longs (cast timestamps
    upstream).  ``bucket_sec`` trades explode factor against join key
    selectivity: each interval emits ceil(span/bucket) rows.  Output =
    all left columns + all interval columns.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    lb = F.floor(F.col(on) / bucket_sec).cast("long")
    l = left.withColumn("_b", lb)
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(start) / bucket_sec).cast("long"),
                # end is exclusive: a zero-length or end-on-boundary interval
                # must not claim the next bucket
                F.floor((F.col(end) - 1) / bucket_sec).cast("long"),
            )
        ),
    )
    cond = [l["_b"] == iv["_b"]] + [l[k] == iv[k] for k in by]
    out = l.join(iv, cond).where(
        (l[on] >= iv[start]) & (l[on] < iv[end])
    )
    keep_l = [l[c] for c in left.columns]
    keep_r = [iv[c] for c in intervals.columns if c not in set(by)]
    return out.select(*keep_l, *keep_r)
