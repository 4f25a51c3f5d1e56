"""Mergeable distinct-count sketches (K-minimum-values / KMV).

Continuous aggregates need distinct counts per bucket ("distinct users per
hour / day / month"), but ``COUNT(DISTINCT)`` does not reaggregate: a 1d
tier cannot be built from 1h distinct counts, so a naive design re-scans
raw history at every coarser tier — exactly what the tier architecture
exists to avoid.  The KMV sketch (Bar-Yossef et al. RANDOM'02; Beyer et
al. SIGMOD'07 "distinct-value synopses") is the smallest mergeable answer:
keep the ``k`` smallest **distinct** hash values per bucket; estimate
``n_distinct ≈ (k-1)·H / h_(k)`` where ``h_(k)`` is the k-th smallest and
``H`` the hash space.  Sketch union is EXACT, not approximate-on-top-of-
approximate: any hash among the k smallest of a union must be among the k
smallest of its own input (otherwise k smaller hashes in that input alone
would precede it), so ``k smallest of (concat of per-hour sketches)``
equals the sketch built directly from the raw day — tiers lose nothing
relative to recomputation (pinned bit-for-bit in tests and proven
cross-engine by the q_kmv_day_merged driver query, whose DuckDB oracle
computes the day sketch directly from raw events).

Determinism: the hash is the md5 60-bit draw from
:func:`tsengine.operators.sampling.hash_draw` — no RNG, no partition or
cluster-layout dependence — so reruns and backfills produce identical
tiers and an independent engine reproduces the exact sketch (DuckDB
mirror: ``CAST('0x'||substr(md5(key),1,15) AS BIGINT)``).  The estimator
is IEEE double arithmetic on exactly-representable operands
(``(k-1)·16^15`` is exact for k ≤ 2^53/2^60-free small k), rounded to 3
decimals, so Spark and DuckDB agree bitwise.

100-TB shape: the ``(bucket, h)`` distinct aggregate combines map-side —
duplicate events of a hot user collapse before the shuffle — and the rank
window sorts DISTINCT hashes per bucket, bounded by per-bucket key
cardinality, never event volume (same argument as
:func:`tsengine.operators.eventops.top_items`).  When per-bucket
cardinality is itself huge (distinct URLs per day on the open web), pass
``cut``: a pre-filter keeps only ``h < cut`` rows through the heavy path,
and buckets whose filtered sketch is short (they MIGHT have had ≥ k
distinct overall with hashes above the cut) are recomputed unfiltered via
an anti-join — the fallback is exact, so the cut NEVER changes results
(pinned in tests), it only bounds the shuffled volume for the common case:
with cut ≈ 4·k·H/E[n] the heavy path shuffles ~4·k rows per bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tsengine.operators.sampling import H_SPACE, hash_draw


def _bucket(ts: str, width_sec: int) -> Column:
    return (F.floor(F.col(ts) / width_sec) * width_sec).cast("long")


def _k_min(distinct_hashes: DataFrame, k: int) -> DataFrame:
    """(bucket, h) distinct rows -> (bucket, kmv sorted array of ≤ k)."""
    w = Window.partitionBy("bucket").orderBy("h")
    return (
        distinct_hashes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .groupBy("bucket")
        .agg(F.sort_array(F.collect_list("h")).alias("kmv"))
    )


def kmv_sketch(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ep",
    width_sec: int = 3600,
    k: int = 64,
    salt: str = "",
    cut: int | None = None,
) -> DataFrame:
    """Per-bucket KMV sketch of ``key``'s distinct count.

    Output: ``(bucket, kmv)`` — ``bucket`` = epoch-second floor to
    ``width_sec``; ``kmv`` = ascending array of the ≤ k smallest distinct
    md5 draws of ``key``.  Feed to :func:`kmv_estimate` for the count, or
    to :func:`kmv_merge` to roll up to a coarser tier without touching raw
    data.  ``cut`` (optional hash-space pre-filter) is result-invariant —
    see module docstring.
    """
    base = df.select(
        _bucket(ts, width_sec).alias("bucket"),
        hash_draw(F.col(key), salt).alias("h"),
    )
    if cut is None:
        return _k_min(base.distinct(), k)
    # exact pre-filtered path: buckets whose filtered sketch reached k are
    # provably complete (their k smallest all lie below the cut); every
    # other bucket — short sketch OR entirely above the cut — recomputes
    # unfiltered.  Equality with the unfiltered sketch is pinned in tests.
    filt = _k_min(base.where(F.col("h") < int(cut)).distinct(), k)
    full_buckets = filt.where(F.size("kmv") >= k)
    fallback_ids = base.select("bucket").distinct().join(
        full_buckets.select("bucket"), "bucket", "left_anti"
    )
    fallback = _k_min(
        base.join(fallback_ids, "bucket", "left_semi").distinct(), k
    )
    return full_buckets.unionByName(fallback)


def kmv_merge(
    sketches: DataFrame,
    width_sec: int = 86400,
    k: int = 64,
    built_k: int | None = None,
) -> DataFrame:
    """Roll sketches up to a coarser bucket: explode, dedup, re-rank.

    ``k`` must not exceed the k the inputs were built with (a larger k
    would need hashes the fine tier discarded — the merge would silently
    produce truncation-biased estimates, and a merged size < k would then
    be misread by :func:`kmv_estimate` as the exact-count branch).  Pass
    ``built_k`` (the k the input sketches were created with; defaults to
    ``k``) so the contract is checked at plan time: a sketch of size s < k
    is indistinguishable from an exact small-bucket sketch by inspection,
    so this is a declared-parameter check, not a data scan.  The result is
    bit-for-bit the sketch :func:`kmv_sketch` would build directly from
    raw data at ``width_sec`` — the mergeability identity that makes
    distinct counts a first-class tier column.
    """
    if built_k is None:
        built_k = k
    if k > built_k:
        raise ValueError(
            f"kmv_merge: requested k={k} exceeds built_k={built_k}; the fine "
            "tier discarded hashes beyond its k, so merging to a larger k "
            "would yield truncation-biased estimates"
        )
    ex = sketches.select(
        _bucket("bucket", width_sec).alias("bucket"),
        F.explode("kmv").alias("h"),
    ).distinct()
    return _k_min(ex, k)


def kmv_estimate(kmv: Column | str, k: int) -> Column:
    """Distinct-count estimate column from a sketch array.

    Fewer than k hashes ⇒ the sketch IS the distinct hash set — exact.
    Otherwise the classic KMV estimator (k-1)·H / h_(k), rounded to 3
    decimals (deterministic across engines)."""
    c = F.col(kmv) if isinstance(kmv, str) else kmv
    est = F.round(
        F.lit(float(k - 1)) * F.lit(float(H_SPACE))
        / F.element_at(c, k).cast("double"),
        3,
    )
    return F.when(F.size(c) < k, F.size(c).cast("double")).otherwise(est)


# ---------------------------------------------------------------------------
# Mergeable fixed-edge histograms -> quantiles (Prometheus histogram_quantile)
# ---------------------------------------------------------------------------

def _bin_expr(val: Column, edges: list[float]) -> Column:
    """1-based bin slot: 1 + count of edges <= v.  Slot 1 = below the first
    edge, slot len(edges)+1 = at/above the last.  A chain of codegen'd
    comparisons — no log/exp (libm rounding differs across engines), the
    edge literals are exact doubles (powers of two by convention)."""
    b: Column = F.lit(1)
    for e in edges:
        b = b + F.when(val >= float(e), 1).otherwise(0)
    return b


def fixed_histogram(
    df: DataFrame,
    val: str = "value",
    ts: str = "ep",
    width_sec: int = 60,
    edges: list[float] | None = None,
) -> DataFrame:
    """Per-bucket fixed-edge histogram: ``(bucket, hist)`` with ``hist`` an
    array of len(edges)+1 counts (slot i = values in [e_{i-2}, e_{i-1})).

    The quantile analogue of the KMV sketch: exact percentiles don't
    reaggregate (a 1d p95 cannot be built from 1m p95s), but histograms
    merge by vector addition — and because the EDGES are fixed per metric
    (the Prometheus le-bucket design), the merged histogram is bit-for-bit
    the histogram computed directly at the coarse tier.  One shuffle; the
    counts are len(edges)+1 conditional sums in a single codegen
    HashAggregate (the rollup dist-map trick), assembled into an array."""
    edges = edges if edges is not None else [float(2**i) for i in range(-2, 10)]
    nbins = len(edges) + 1
    b = _bucket(ts, width_sec)
    binned = df.select(
        b.alias("bucket"), _bin_expr(F.col(val).cast("double"), edges).alias("_b")
    )
    sums = [
        F.sum(F.when(F.col("_b") == i + 1, 1).otherwise(0)).alias(f"_c{i}")
        for i in range(nbins)
    ]
    return (
        binned.groupBy("bucket")
        .agg(*sums)
        .select(
            "bucket",
            F.array(*[F.col(f"_c{i}").cast("long") for i in range(nbins)]).alias(
                "hist"
            ),
        )
    )


def histogram_merge(
    hists: DataFrame, width_sec: int = 3600, nbins: int | None = None
) -> DataFrame:
    """Fold fine-tier histograms into a coarser bucket: element-wise count
    sums, again one codegen HashAggregate over per-slot conditional sums —
    never a collect_list of arrays.

    Prefer passing ``nbins`` explicitly (len(edges)+1): inferring it costs
    an extra Spark action and is impossible on an empty sketch frame."""
    if nbins is None:
        row = hists.select("hist").first()
        if row is None:
            raise ValueError(
                "histogram_merge: cannot infer nbins from an empty sketch "
                "frame — pass nbins=len(edges)+1 explicitly"
            )
        nbins = len(row["hist"])
    ex = hists.select(
        _bucket("bucket", width_sec).alias("bucket"), F.col("hist")
    )
    sums = [
        F.sum(F.element_at("hist", i + 1)).alias(f"_c{i}") for i in range(nbins)
    ]
    return (
        ex.groupBy("bucket")
        .agg(*sums)
        .select(
            "bucket",
            F.array(*[F.col(f"_c{i}").cast("long") for i in range(nbins)]).alias(
                "hist"
            ),
        )
    )


def histogram_quantile(
    hist: Column | str, edges: list[float], q: float
) -> Column:
    """Prometheus ``histogram_quantile``: linear interpolation inside the
    first bin whose cumulative count reaches q·n (skipping empty bins);
    clamped to the first/last edge for the open-ended end bins.  Pure
    column arithmetic over the count array — deterministic across engines
    (the DuckDB oracle recomputes the same rule from raw rows)."""
    h = F.col(hist) if isinstance(hist, str) else hist
    nb = len(edges) + 1
    cum = F.transform(
        F.sequence(F.lit(1), F.lit(nb)),
        lambda i: F.aggregate(
            F.slice(h, F.lit(1), i), F.lit(0).cast("long"), lambda a, x: a + x
        ),
    )
    n = F.element_at(cum, nb)
    target = F.lit(float(q)) * n.cast("double")
    idx = F.element_at(
        F.filter(
            F.sequence(F.lit(1), F.lit(nb)),
            lambda i: (F.element_at(cum, i).cast("double") >= target)
            & (F.element_at(h, i) > 0),
        ),
        1,
    )
    earr = F.array(*[F.lit(float(e)) for e in edges])
    lo = F.element_at(earr, idx - 1)
    hi = F.element_at(earr, idx)  # idx is 2..nb-1 in the interpolated branch
    cumbelow = F.element_at(cum, idx - 1).cast("double")
    interp = lo + (hi - lo) * (target - cumbelow) / F.element_at(h, idx).cast(
        "double"
    )
    est = (
        F.when(idx == 1, F.lit(float(edges[0])))
        .when(idx == nb, F.lit(float(edges[-1])))
        .otherwise(interp)
    )
    return F.when(n > 0, F.round(est, 6))


# ---------------------------------------------------------------------------
# Count-min sketch (long format): mergeable approximate item counts
# ---------------------------------------------------------------------------

def _cms_cell(item: Column, j: int, width: int, salt: str) -> Column:
    return F.lit(j * width) + hash_draw(item, f"{salt}cms{j}") % width


def cms_rows(
    df: DataFrame,
    item: str = "event_type",
    ts: str = "ep",
    width_sec: int = 3600,
    depth: int = 3,
    width: int = 64,
    salt: str = "",
) -> DataFrame:
    """Count-min sketch per bucket (Cormode & Muthukrishnan '05) in LONG
    format: ``(bucket, cell, cnt)`` with depth·width cells, cell j·width +
    h_j(item).  Completes the mergeable-sketch trio — KMV (distinct),
    fixed-edge histograms (quantiles), CMS (per-item counts when the item
    cardinality is unbounded and exact per-item tier columns can't exist).
    Merge = summing cnt per cell (:func:`cms_merge` — integer adds, so
    merged-from-fine == direct-at-coarse exactly); point estimates
    overcount only (min over the depth rows bounds collision error at
    ~2n/width with prob 1-2^-depth).

    Long format IS the distributed representation: a bucket's sketch is at
    most depth·width rows (bounded), map-side combine collapses event
    volume before the shuffle, and no 1024-column array ever materializes.
    Hashes are md5 draws — deterministic, partitioning-invariant, DuckDB-
    mirrorable."""
    b = _bucket(ts, width_sec)
    cells = F.array(*[
        _cms_cell(F.col(item), j, width, salt) for j in range(depth)
    ])
    return (
        df.select(b.alias("bucket"), F.explode(cells).alias("cell"))
        .groupBy("bucket", "cell")
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(rows: DataFrame, width_sec: int = 86400) -> DataFrame:
    """Fold fine-tier CMS rows into a coarser bucket: integer cell sums —
    exactly the sketch built directly at the coarse tier."""
    return (
        rows.select(_bucket("bucket", width_sec).alias("bucket"), "cell", "cnt")
        .groupBy("bucket", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    rows: DataFrame,
    items: DataFrame,
    item: str = "item",
    depth: int = 3,
    width: int = 64,
    salt: str = "",
) -> DataFrame:
    """Point estimates for ``items`` (a small frame, broadcast against the
    sketch rows): est = min over the depth rows of that item's cell count,
    0 when any cell is empty.  Must be called with the depth/width/salt the
    sketch was built with.  Output: (bucket, <item>, est)."""
    probes = items.select(
        F.col(item),
        F.posexplode(
            F.array(*[_cms_cell(F.col(item), j, width, salt) for j in range(depth)])
        ).alias("_j", "cell"),
    )
    buckets = rows.select("bucket").distinct()
    grid = buckets.crossJoin(probes)  # |buckets| x |items| x depth — small
    return (
        grid.join(rows, ["bucket", "cell"], "left")
        .groupBy("bucket", item)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
