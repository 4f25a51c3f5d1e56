"""Deterministic synthetic transcripts generator (FIXTURES.md §1).

Schema (BASELINE.json input_hint): conv_id, turn_idx, role, text, tool, ts.
Seeded per-conversation (seed 42 + conv index), generated DISTRIBUTED via
mapInPandas — one Arrow batch of conv indexes in, turn rows out — so the
table scales to any N_CONV without a driver loop.  No wall clock anywhere.

Skew knob: conv indexes with i % 97 == 0 are "hot" and get HOT_FACTOR x
turns — exercises the salting path (tsengine.skew).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ANCHOR_EPOCH = 1398895200  # 2014-05-01 Madrid midnight (FIXTURES.md §1)
SEED = 42
ROLES = np.array(["user", "assistant", "tool"])
ROLE_W = np.array([0.4, 0.4, 0.2])
TOOLS = np.array(["search", "exec", "read", "write", "none"])
_ALNUM = np.array(list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"))

TRANSCRIPT_COLS = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def _gen_conv(i: int, base_turns: int, hot_factor: int) -> pd.DataFrame:
    rng = np.random.RandomState(SEED + int(i))
    n = base_turns + int(rng.randint(0, base_turns))
    if i % 97 == 0:
        n *= hot_factor
    roles = ROLES[rng.choice(3, size=n, p=ROLE_W)]
    tools = np.where(roles == "tool", TOOLS[rng.choice(5, size=n)], None)
    # inter-turn gaps: lognormal seconds, median ~20s, heavy tail; occasional
    # multi-hour gaps to exercise gap-fill
    gaps = np.ceil(rng.lognormal(mean=3.0, sigma=1.2, size=n)).astype("int64")
    long_gap = rng.random_sample(n) < 0.01
    gaps = np.where(long_gap, gaps + rng.randint(3600, 6 * 3600, size=n), gaps)
    start = ANCHOR_EPOCH + int(rng.randint(0, 86400))
    epochs = start + np.cumsum(gaps) - gaps[0]
    conv_id = f"conv_{i:08d}"
    lengths = rng.randint(16, 257, size=n)
    texts = [
        f"{conv_id}:{t}:" + "".join(_ALNUM[rng.randint(0, 62, size=lengths[t])])
        for t in range(n)
    ]
    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": np.arange(n, dtype="int32"),
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": pd.to_datetime(epochs, unit="s"),
        }
    )


def transcripts(
    spark: SparkSession,
    n_conv: int = 200,
    base_turns: int = 150,
    hot_factor: int = 100,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic transcripts frame."""
    idx = spark.range(0, n_conv, 1, partitions or min(n_conv, 64))

    def gen(batches):
        for pdf in batches:
            for i in pdf["id"].tolist():
                yield _gen_conv(i, base_turns, hot_factor)

    return idx.mapInPandas(gen, schema=TRANSCRIPT_COLS)


def write_transcripts(
    spark: SparkSession,
    path: str,
    n_conv: int = 200,
    base_turns: int = 150,
    hot_factor: int = 100,
) -> None:
    """Write the table partitioned by day(ts) + sorted by (conv_id, turn_idx)
    inside partitions — the layout an Iceberg table would use
    (days(ts) + bucket(conv_id), SURVEY.md §4 partitioning row)."""
    df = transcripts(spark, n_conv, base_turns, hot_factor)
    (
        df.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .repartition("day")
        .sortWithinPartitions("conv_id", "turn_idx")
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(path)
    )
