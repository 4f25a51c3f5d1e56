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


def priority_sample(
    df: DataFrame,
    key_col: str = "doc_id",
    weight_col: str = "weight",
    k: int = 100,
    by: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling without replacement — priority
    sampling (Duffield, Lund & Thorup, JACM'07): each row gets priority
    ``q = w / u`` with ``u`` a uniform draw in (0, 1]; the k highest
    priorities are the sample, and each kept row's unbiased subset-sum
    weight is ``max(w, tau)`` where ``tau`` is the (k+1)-th priority.
    Estimates of any subset sum over the sample are unbiased with
    near-optimal variance — the right primitive for weighted corpus
    subsampling (sample documents proportional to token count, then
    estimate token totals of any slice from the sample alone).

    Everything stays reproducible AND cross-engine exact: ``u`` is the md5
    60-bit draw shifted off zero (``(h+1) / 16^15``), so ``q = w * H /
    (h+1)`` is one IEEE multiply and one divide — both correctly rounded,
    so DuckDB computes bitwise-identical priorities (no exp/ln, unlike
    exponential-key A-ES reservoirs, whose libm calls differ between
    engines in the last ulp).

    ``by=None``: global top-k via sort+limit (TakeOrderedAndProject — no
    full sort at scale).  ``by=col``: per-group top-k via a rank window
    over one exchange.  Rows with non-positive weight are excluded (their
    inclusion probability is 0).  Output: the kept rows' key (+ group),
    ``weight``, ``priority`` and ``est_weight``, priorities rounded to 6dp
    for emission only (selection and tau use full precision).
    """
    q = (
        F.col(weight_col).cast("double")
        * F.lit(float(H_SPACE))
        / (hash_draw(F.col(key_col), salt) + F.lit(1)).cast("double")
    )
    base = df.where(F.col(weight_col) > 0).select(
        *([F.col(by)] if by else []),
        F.col(key_col),
        F.col(weight_col).cast("double").alias("weight"),
        q.alias("_q"),
    )
    from pyspark.sql import Window

    if by is None:
        # global: TakeOrderedAndProject keeps k+1 rows (no full sort at
        # scale); tau = the (k+1)-th priority, 0 when fewer rows exist
        # (then every row is kept and est_weight == weight exactly)
        topk1 = base.orderBy(F.col("_q").desc(), F.col(key_col)).limit(k + 1)
        wall = Window.partitionBy(F.lit(1))
        ranked = topk1.select(
            "*",
            F.row_number()
            .over(Window.orderBy(F.col("_q").desc(), F.col(key_col)))
            .alias("_rn"),
            F.when(
                F.count("*").over(wall) > k, F.min("_q").over(wall)
            ).otherwise(F.lit(0.0)).alias("_tau"),
        )
    else:
        # per-group: one exchange for the rank window; tau comes from the
        # _rn == k+1 row per group — a <=one-row-per-group frame joined
        # back (broadcast-able), never a per-row copy of the group's
        # priority list
        wo = Window.partitionBy(by).orderBy(F.col("_q").desc(), F.col(key_col))
        rn = base.withColumn("_rn", F.row_number().over(wo))
        taus = rn.where(F.col("_rn") == k + 1).select(
            F.col(by), F.col("_q").alias("_tau")
        )
        ranked = rn.join(taus, by, "left").withColumn(
            "_tau", F.coalesce(F.col("_tau"), F.lit(0.0))
        )
    return ranked.where(F.col("_rn") <= k).select(
        *([by] if by else []),
        key_col,
        "weight",
        F.round("_q", 6).alias("priority"),
        F.round(F.greatest(F.col("weight"), F.col("_tau")), 6).alias("est_weight"),
    )


def budget_sample(
    df: DataFrame,
    key_col: str = "doc_id",
    class_col: str = "source",
    weight_col: str = "n_chars",
    budgets: dict[str, float] | None = None,
    default_budget: float | None = None,
    salt: str = "budget",
) -> DataFrame:
    """Budget-capped mixture sampling: keep each class at the rate that
    hits its WEIGHT budget in expectation — "2B tokens of web, 500M of
    code" — the way data mixes are actually specified (budgets), not the
    way the primitive wants them (rates).

    rate(class) = min(1, budget / total_weight(class)), computed IN-PLAN by
    a window sum over the class (no driver-side collect, no extra action —
    at 100 TB the per-class totals are a partial-agg window over the scan);
    the keep decision is the usual deterministic md5 draw, so the kept set
    is still a pure function of (key, salt) given the corpus.  Classes
    without a budget keep everything when ``default_budget`` is None, else
    apply the default.  Adding rows to a class only ever lowers its rate —
    re-running after ingest keeps the budget, not the old sample.
    """
    from pyspark.sql import Window

    budgets = budgets or {}
    w = Window.partitionBy(class_col)
    total = F.sum(F.col(weight_col).cast("double")).over(w)
    budget: Column | None = None
    for cls, b in sorted(budgets.items()):
        cond = F.when(F.col(class_col) == cls, F.lit(float(b)))
        budget = cond.otherwise(budget) if budget is not None else cond
    if budget is None:
        budget = F.lit(None).cast("double")
    if default_budget is not None:
        budget = F.coalesce(budget, F.lit(float(default_budget)))
    rate = F.least(F.lit(1.0), budget / total)  # NULL budget -> NULL rate
    thr = rate * float(H_SPACE)
    keep = budget.isNull() | (
        hash_draw(F.col(key_col), salt).cast("double") < thr
    )
    # window expressions are not allowed directly in WHERE: project the
    # keep flag, then filter on the materialized column
    return df.withColumn("_keep", keep).where(F.col("_keep")).drop("_keep")
