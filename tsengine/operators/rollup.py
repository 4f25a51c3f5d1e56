"""Retention-tier rollups over transcripts (the north-star workload).

Pipeline (BASELINE.json north_star): per-conversation turn streams ->
derived latency plane -> tumbling-window aggregates raw -> 1m -> 1h -> 1d,
each COARSER tier computed from the next finer one by partial reaggregation
(count/min/max/sum compose; mean = sum/count; distributions merge by key) —
the continuous-aggregate design the reference's `usage` recomputation lacks
(SURVEY.md §4 caching row; tf:1218-1223).

Numeric-equality note (SURVEY.md §4): latencies are integer seconds; sums of
integers are exact in float64 far beyond any bucket size, so the built-in
Spark aggregates are ALREADY bit-for-bit equal to the numpy oracle
(np.sum/amin/amax, tf:469/490/512) — no exact-kernel UDF needed for
cnt/min/max/sum/mean.  An `exact` applyInPandas kernel is still provided for
non-integer value planes where partition order would change float rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TIERS = {"1m": 60, "1h": 3600, "1d": 86400}
TIER_ORDER = ["1m", "1h", "1d"]


def with_latency(transcripts: DataFrame) -> DataFrame:
    """Derive the numeric plane: turn latency = epoch - previous epoch per
    conversation, ordered by turn_idx (stable (conv_id, turn_idx) ordering,
    input_hint invariant).  First turn has NULL latency."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    epoch = F.col("ts").cast("timestamp").cast("long")
    return (
        transcripts.withColumn("epoch", epoch)
        .withColumn("value", (epoch - F.lag(epoch).over(w)).cast("double"))
    )


def _dist_agg(df: DataFrame, keys: list, col: str, out: str) -> DataFrame:
    """count-per-key -> map<string,long> distribution, deterministic order."""
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(*keys, col)
        .agg(F.count("*").alias("_c"))
        .groupBy(*keys)
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct(F.col(col), F.col("_c"))))
            ).alias(out)
        )
    )


def rollup_raw_to_tier(turns: DataFrame, tier: str = "1m") -> DataFrame:
    """Finest rollup: raw turns (from :func:`with_latency`) -> tier buckets.

    Output: conv_id, tier, bucket(long epoch), cnt, cnt_lat, vmin, vmax,
    vsum, vmean, role_dist, tool_dist.
    """
    width = TIERS[tier]
    b = turns.withColumn(
        "bucket", (F.lit(width) * F.floor(F.col("epoch") / F.lit(width))).cast("long")
    )
    keys = ["conv_id", "bucket"]
    core = b.groupBy(*keys).agg(
        F.count("*").alias("cnt"),
        F.count("value").alias("cnt_lat"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.sum("value").alias("vsum"),
    )
    roles = _dist_agg(b, keys, "role", "role_dist")
    tools = _dist_agg(b, keys, "tool", "tool_dist")
    out = (
        core.join(roles, keys, "left")
        .join(tools, keys, "left")
        .withColumn("vmean", F.col("vsum") / F.nullif(F.col("cnt_lat"), F.lit(0)))
        .withColumn("tier", F.lit(tier))
    )
    return out.select(
        "conv_id", "tier", "bucket", "cnt", "cnt_lat", "vmin", "vmax", "vsum",
        "vmean", "role_dist", "tool_dist",
    )


def reaggregate(finer: DataFrame, tier: str) -> DataFrame:
    """Partial reaggregation: finer tier -> coarser tier without touching raw
    data.  Valid for cnt/min/max/sum (mean recomputed from sum/count);
    distributions merge by exploding the maps and re-counting."""
    width = TIERS[tier]
    b = finer.withColumn(
        "bucket2", (F.lit(width) * F.floor(F.col("bucket") / F.lit(width))).cast("long")
    )
    keys = ["conv_id", "bucket2"]
    core = b.groupBy(*keys).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("cnt_lat").alias("cnt_lat"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
        F.sum("vsum").alias("vsum"),
    )

    def merge_dist(col):
        e = (
            b.filter(F.col(col).isNotNull())
            .select(*keys, F.explode(col).alias("_k", "_v"))
            .groupBy(*keys, "_k")
            .agg(F.sum("_v").alias("_c"))
            .groupBy(*keys)
            .agg(
                F.map_from_entries(
                    F.sort_array(F.collect_list(F.struct(F.col("_k"), F.col("_c"))))
                ).alias(col)
            )
        )
        return e

    out = (
        core.join(merge_dist("role_dist"), keys, "left")
        .join(merge_dist("tool_dist"), keys, "left")
        .withColumn("vmean", F.col("vsum") / F.nullif(F.col("cnt_lat"), F.lit(0)))
        .withColumn("tier", F.lit(tier))
        .withColumnRenamed("bucket2", "bucket")
    )
    return out.select(
        "conv_id", "tier", "bucket", "cnt", "cnt_lat", "vmin", "vmax", "vsum",
        "vmean", "role_dist", "tool_dist",
    )


def rollup_exact(turns: DataFrame, tier: str = "1m") -> DataFrame:
    """Exact-kernel variant: per-(conv, bucket) aggregates computed inside
    applyInPandas with the reference's numpy calls on the time-sorted bucket
    vector (np.sum/np.amin/np.amax, tf:469/490/512) — for value planes where
    partition-order float effects matter.  Distributions omitted (identical
    integer logic to the fast path)."""
    import numpy as np
    import pandas as pd

    width = TIERS[tier]
    b = turns.select(
        "conv_id",
        (F.lit(width) * F.floor(F.col("epoch") / F.lit(width))).cast("long").alias("bucket"),
        "epoch",
        "value",
    )

    schema = (
        "conv_id string, tier string, bucket long, cnt long, cnt_lat long, "
        "vmin double, vmax double, vsum double, vmean double"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("epoch")
        v = pdf["value"].to_numpy(dtype="float64")
        lat = v[~np.isnan(v)]
        n = len(lat)
        return pd.DataFrame(
            {
                "conv_id": [pdf["conv_id"].iloc[0]],
                "tier": [tier],
                "bucket": [pdf["bucket"].iloc[0]],
                "cnt": [len(pdf)],
                "cnt_lat": [n],
                "vmin": [float(np.amin(lat)) if n else None],
                "vmax": [float(np.amax(lat)) if n else None],
                "vsum": [float(np.sum(lat)) if n else None],
                "vmean": [float(np.sum(lat)) / n if n else None],
            }
        )

    return b.groupBy("conv_id", "bucket").applyInPandas(kernel, schema=schema)


def build_all_tiers(turns: DataFrame, persist: bool = False) -> dict[str, DataFrame]:
    """raw -> 1m, then 1m -> 1h -> 1d by partial reaggregation.

    persist=True caches each tier before deriving the next — otherwise lazy
    lineage recomputes 1m for the 1h action and 1m+1h for the 1d action.
    (The checkpointed runner materializes tiers to storage instead,
    tsengine.checkpoint.)"""
    out: dict[str, DataFrame] = {}
    out["1m"] = rollup_raw_to_tier(turns, "1m")
    if persist:
        out["1m"] = out["1m"].persist()
    out["1h"] = reaggregate(out["1m"], "1h")
    if persist:
        out["1h"] = out["1h"].persist()
    out["1d"] = reaggregate(out["1h"], "1d")
    return out
