"""Deterministic hash-based sampling for training-data pipelines.

Reproducibility is the requirement that rules out ``DataFrame.sample`` at
scale: a training corpus must yield the SAME subset on every rerun, on any
cluster size, under any partitioning — so the keep/drop decision has to be
a pure function of the row's stable key, never of RNG state or partition
layout.  Everything here is a map-only column expression (no shuffle, no
state): ``h = md5(key || salt)`` truncated to 60 bits gives a uniform draw
in [0, 16^15), and thresholds on it implement Bernoulli sampling, per-class
(mixture) rates, and leakage-free train/val/test splits.  md5 (not
xxhash64) so an independent engine reproduces the exact subset — DuckDB
oracles mirror the same expression character for character.

At 100 TB: fully pushed into the scan stage (WholeStageCodegen filter);
adding or removing rows never flips any other row's assignment, which is
what makes incremental corpus refreshes append-only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16^15: the draw space of a 15-hex-char (60-bit) md5 prefix — fits long
H_SPACE = 16**15


def hash_draw(key: Column, salt: str = "") -> Column:
    """Uniform deterministic draw in [0, 16^15) from a row key: the first
    15 hex chars of md5(key || salt) as a non-negative long.  ``salt``
    decorrelates independent sampling decisions over the same keys."""
    return F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 15),
        16,
        10,
    ).cast("long")


def threshold(rate: float) -> int:
    """Integer keep-threshold for a rate in [0,1] — computed identically
    in the Python driver and any SQL mirror (exact int literal)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return int(rate * H_SPACE)


def hash_sample(
    df: DataFrame, key_col: str = "doc_id", rate: float = 0.1, salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli(rate) sample keyed on ``key_col``: keeps a
    row iff its draw falls below ``rate * 16^15``.  Same subset on every
    run and every cluster layout."""
    return df.where(hash_draw(F.col(key_col), salt) < F.lit(threshold(rate)))


def stratified_sample(
    df: DataFrame,
    key_col: str = "doc_id",
    class_col: str = "lang",
    rates: dict[str, float] | None = None,
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-class (mixture-weighted) deterministic sampling — the data-mixing
    primitive: each class keeps its own rate (e.g. upweight low-resource
    languages, downsample boilerplate sources), classes absent from
    ``rates`` keep ``default_rate``.  Still map-only: the per-row threshold
    is a chained CASE on the class column."""
    rates = rates or {}
    thr: Column = F.lit(threshold(default_rate))
    for cls, rate in sorted(rates.items()):
        thr = F.when(F.col(class_col) == cls, F.lit(threshold(rate))).otherwise(thr)
    return df.where(hash_draw(F.col(key_col), salt) < thr)


def hash_split(
    df: DataFrame,
    key_col: str = "doc_id",
    fracs: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Leakage-free train/val/test assignment: partitions the draw space by
    cumulative fraction thresholds and emits a ``split`` label per row.
    A key always lands in the same split — across reruns AND across tables
    sharing the key — so a conversation's turns can never straddle
    train/test.  ``fracs`` must sum to ~1 (a residual bucket would be a
    silent data drop)."""
    fracs = fracs or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(fracs.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    h = hash_draw(F.col(key_col), salt)
    cum = 0.0
    expr = None
    items = list(fracs.items())
    for name, frac in items[:-1]:
        cum += frac
        cond = h < F.lit(threshold(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def source_quota(
    df: DataFrame,
    class_col: str = "source",
    key_col: str = "doc_id",
    quota: int = 100,
    salt: str = "quota",
) -> DataFrame:
    """Cap any single class (domain/source/dump) at ``quota`` rows — the
    over-represented-domain guard.  WHICH rows survive is deterministic:
    rank by the same md5 draw used everywhere here (tie-broken by key), so
    the kept subset is stable across runs and cluster layouts, and a class
    under its quota is untouched.  One window exchange on the class; at
    100 TB the rank-within-class is the unavoidable shuffle, but the window
    carries only (class, draw, key) — project wide columns after, not
    through, the rank."""
    from pyspark.sql import Window

    h = hash_draw(F.col(key_col), salt)
    w = Window.partitionBy(class_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= quota)
        .drop("_rk")
    )


def pack_sequences(
    df: DataFrame,
    key_col: str = "doc_id",
    len_col: str = "n_tokens",
    max_len: int = 2048,
    shards: int = 16,
    salt: str = "pack",
) -> DataFrame:
    """Greedy concat-and-chunk sequence packing plan: documents are laid
    end-to-end in a deterministic order and cut into ``max_len``-token
    training sequences; each doc learns where its tokens land.

    The layout is per-shard (shard = md5 draw of the key mod ``shards``),
    matching how packing actually runs at scale — one writer per shard, no
    global order.  Within a shard docs are ordered by (draw, key) and the
    running token offset is a window cumsum, so the whole plan is one
    exchange on the shard key.  Emits per doc: ``shard``, ``offset`` (first
    token's position in the shard's stream), ``seq_first``/``seq_last``
    (chunk indices the doc spans) and ``n_seqs``.  Docs longer than
    ``max_len`` simply span several sequences — nothing is dropped, which
    keeps the plan a pure function (and lets the actual packer be a
    downstream mapInPandas that materializes token buffers per shard)."""
    from pyspark.sql import Window

    h = hash_draw(F.col(key_col), salt)
    base = df.select(
        F.col(key_col),
        F.col(len_col).cast("long").alias("_n"),
        (h % shards).cast("int").alias("shard"),
        h.alias("_h"),
    ).where(F.col("_n") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("_h").asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("_n").over(w)
    offset = (cum - F.col("_n")).alias("offset")
    return base.select(
        key_col,
        "shard",
        offset,
        (F.floor((cum - F.col("_n")) / max_len)).cast("long").alias("seq_first"),
        (F.floor((cum - 1) / max_len)).cast("long").alias("seq_last"),
        (F.floor((cum - 1) / max_len) - F.floor((cum - F.col("_n")) / max_len) + 1
         ).cast("long").alias("n_seqs"),
    )
