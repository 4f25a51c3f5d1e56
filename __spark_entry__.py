"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Engine: ``tsengine`` (see SURVEY.md §2 for the operator inventory this
registry covers).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's `usage`
    rollup shape (inner_sum(split(increments(distribute(...)), period=day)),
    tf:1218-1223) over the events series."""
    from tsengine.plans.driver_queries import q_usage_day

    return q_usage_day(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, plus the
    training-data pipeline ops (dedup / text / similarity / multimodal)."""
    from tsengine.plans import (
        driver_queries,
        driver_queries_data,
        driver_queries_snapshots,
    )

    out = dict(driver_queries.QUERIES)
    out.update(driver_queries_data.QUERIES)
    out.update(driver_queries_snapshots.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI equivalents for each queries() entry (keys missing here
    get the driver's weaker rows-only check)."""
    from tsengine.plans import (
        driver_queries,
        driver_queries_data,
        driver_queries_snapshots,
    )

    out = dict(driver_queries.ORACLE)
    out.update(driver_queries_data.ORACLE)
    out.update(driver_queries_snapshots.ORACLE)
    return out
