"""Table access layer (SURVEY.md §2.1 S1-S6).

Primary format is Iceberg (north_rule) when the session has an Iceberg
catalog configured (``spark.sql.catalog.<name>`` with the iceberg runtime
jar on a real cluster); this sandbox ships no Iceberg jar, so the layer
falls back to partitioned parquet with tsengine.checkpoint's atomic
day-commit protocol standing in for Iceberg snapshot commits.  All call
sites go through this module so the swap is one config change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        confs = spark.sparkContext.getConf().getAll()
    except Exception:
        return False
    return any(k.startswith("spark.sql.catalog.") and "iceberg" in v.lower() for k, v in confs)


def read_transcripts(spark: SparkSession, location: str) -> DataFrame:
    """Read the transcripts table.  `location` is an Iceberg table name when
    a catalog is configured, else a parquet path."""
    if "/" not in location and iceberg_available(spark):
        return spark.read.format("iceberg").load(location)
    return spark.read.parquet(location)


def write_transcripts(df: DataFrame, location: str, mode: str = "overwrite") -> None:
    """Write partitioned by days(ts) (+ implicit bucket(conv_id) via
    repartition) — the Iceberg partition spec from SURVEY.md §4."""
    out = (
        df.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .repartition("day")
        .sortWithinPartitions("conv_id", "turn_idx")
    )
    if "/" not in location and iceberg_available(df.sparkSession):
        out.writeTo(location).partitionedBy(F.col("day")).createOrReplace()
        return
    out.write.mode(mode).partitionBy("day").parquet(location)


def pushdown_scan(spark: SparkSession, location: str, lo: int | None, hi: int | None,
                  conv_ids: list[str] | None = None) -> DataFrame:
    """Time-range + conv scan with predicates Catalyst pushes to the files
    (partition pruning on day, row-group skipping on ts/conv_id) — the
    engine-side rendering of the reference's Cassandra column slice
    (au:60-160 -> af:81).

    The parquet layout partitions by the DERIVED ``day`` string, and Spark
    cannot infer day-from-ts, so a ts-only range filter scans every
    partition.  The equivalent ``day`` bounds are added explicitly whenever
    the table carries the partition column — that is what turns the filter
    into PartitionFilters (file-level pruning) instead of just row-group
    skipping.  A real Iceberg catalog makes this redundant (its ``days(ts)``
    transform prunes from the ts predicate itself); the fallback must do it
    by hand."""
    from datetime import datetime, timedelta, timezone

    df = read_transcripts(spark, location)
    has_day = "day" in df.columns

    def day_of(epoch: int, pad_days: int) -> str:
        d = datetime.fromtimestamp(int(epoch), tz=timezone.utc) + timedelta(days=pad_days)
        return d.strftime("%Y-%m-%d")

    # day bounds widened by one day each side: pruning must stay a SUPERSET
    # of the ts predicate even if the writer's session timezone differed
    if lo is not None:
        df = df.filter(F.col("ts") >= F.timestamp_seconds(F.lit(lo)))
        if has_day:
            df = df.filter(F.col("day") >= day_of(lo, -1))
    if hi is not None:
        df = df.filter(F.col("ts") <= F.timestamp_seconds(F.lit(hi)))
        if has_day:
            df = df.filter(F.col("day") <= day_of(hi, 1))
    if conv_ids:
        df = df.filter(F.col("conv_id").isin(conv_ids))
    return df
