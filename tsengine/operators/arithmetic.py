"""Scalar and pairwise series arithmetic (SURVEY.md §2.8 C1-C10, §2.3 J1).

Scalar ops (tf:588-721): plain column arithmetic; the scalar wrapper's
±inf -> NaN -> drop behavior (tf:605-606) becomes an explicit finite-filter.
``scalar_power`` truncates its exponent to int (tf:705, pinned by
timeseries_functions_tests.py:496-511).

Pairwise ops (ts_pair_operation, tf:727-756): an INNER equi-join on
(series_id, epoch) — pandas index alignment + dropna ≡ inner join — with the
reference's scalar-broadcast special case: when exactly one side of a series
pair has length 1, that side acts as a scalar over the other side's epochs
(tf:743-750).  Series lengths come from a tiny one-row-per-series aggregate
that is broadcast-joined, so the classification adds no extra shuffle of the
big frames.
"""

from __future__ import annotations

from operator import add, mul, sub

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _div(a, b):
    # ANSI-safe division: the reference's x/0 -> inf -> dropped / 0/0 -> NaN
    # -> dropped (tf:982-986) becomes try_divide -> NULL -> dropped.
    return F.try_divide(a, b)

from tsengine.core import TsError

_INF = float("inf")


def _drop_nonfinite(df: DataFrame, col: str = "value") -> DataFrame:
    c = F.col(col)
    return df.filter(c.isNotNull() & ~F.isnan(c) & (c != _INF) & (c != -_INF))


def scalar_product(df: DataFrame, number: float = 1.0) -> DataFrame:
    """value * k (tf:614-632)."""
    return _scalar(df, lambda v: v * F.lit(float(number)))


def scalar_sum(df: DataFrame, number: float = 0.0) -> DataFrame:
    """value + k (tf:636-654)."""
    return _scalar(df, lambda v: v + F.lit(float(number)))


def scalar_division(df: DataFrame, number: float = 1.0) -> DataFrame:
    """value / k; ±inf dropped (tf:658-676, tf:605-606)."""
    return _scalar(df, lambda v: _div(v, F.lit(float(number))))


def scalar_sub(df: DataFrame, number: float = 0.0) -> DataFrame:
    """value - k (tf:680-698)."""
    return _scalar(df, lambda v: v - F.lit(float(number)))


def scalar_power(df: DataFrame, number: float = 1.0) -> DataFrame:
    """value ** int(k) — exponent truncated to int (tf:702-721)."""
    return _scalar(df, lambda v: F.pow(v, F.lit(int(float(number)))))


def _scalar(df: DataFrame, fn) -> DataFrame:
    out = df.select("series_id", "epoch", fn(F.col("value").cast("double")).alias("value"))
    return _drop_nonfinite(out)


_PAIR_FNS = {"add": add, "sub": sub, "mul": mul, "div": _div}


def pair_op(df1: DataFrame, df2: DataFrame, op: str) -> DataFrame:
    """Elementwise op between two series frames matched by series_id.

    - both sides multi-row (or both single): inner join on (series_id, epoch);
    - exactly one side single-row for a series: broadcast that value across
      the other side's epochs (tf:743-750);
    - NaN results dropped (tf:752); division additionally drops ±inf
      (tf:982-986).
    """
    if op not in _PAIR_FNS:
        raise TsError(f"unknown pair op: {op}")
    fn = _PAIR_FNS[op]

    n1 = df1.groupBy("series_id").agg(F.count("*").alias("_n1"))
    n2 = df2.groupBy("series_id").agg(F.count("*").alias("_n2"))
    sizes = F.broadcast(n1.join(n2, "series_id", "inner"))

    both = (F.col("_n1") == 1) == (F.col("_n2") == 1)  # both single or both multi

    # case 1+2: index-aligned inner join (covers both-multi and both-single)
    aligned_sids = sizes.filter(both).select("series_id")
    aligned = (
        df1.join(F.broadcast(aligned_sids), "series_id", "left_semi")
        .withColumnRenamed("value", "_v1")
        .join(df2.withColumnRenamed("value", "_v2"), ["series_id", "epoch"], "inner")
        .select("series_id", "epoch", fn(F.col("_v1"), F.col("_v2")).alias("value"))
    )

    # case 3: df1 single, df2 multi -> scalar from df1 over df2's epochs
    s1 = (
        df1.join(sizes.filter((F.col("_n1") == 1) & (F.col("_n2") != 1)), "series_id")
        .select("series_id", F.col("value").alias("_s"))
    )
    c3 = df2.join(F.broadcast(s1), "series_id").select(
        "series_id", "epoch", fn(F.col("_s"), F.col("value")).alias("value")
    )

    # case 4: df2 single, df1 multi
    s2 = (
        df2.join(sizes.filter((F.col("_n2") == 1) & (F.col("_n1") != 1)), "series_id")
        .select("series_id", F.col("value").alias("_s"))
    )
    c4 = df1.join(F.broadcast(s2), "series_id").select(
        "series_id", "epoch", fn(F.col("value"), F.col("_s")).alias("value")
    )

    out = aligned.unionByName(c3).unionByName(c4)
    out = out.filter(F.col("value").isNotNull() & ~F.isnan(F.col("value")))
    if op == "div":
        out = _drop_nonfinite(out)
    return out


_DIM_MSG = {
    "add": "Timeseries lists must have the same dimension",  # tf:793
    "sub": "Subtraction - Timeseries list must have same dimension",  # tf:847
    "mul": "Product - Timeseries list must have same dimension",  # tf:901
    "div": "Division - Timeseries list must have same dimension",  # tf:956
}


def check_same_dimension(df1: DataFrame, df2: DataFrame, op: str = "add") -> None:
    """Pairwise-arithmetic dimension gate with the reference's per-op
    messages (tf:793/847/901/956).  The reference compares ts-LIST lengths;
    in long format the analogue is series-set equality — both operands must
    carry the same series ids (an unmatched id is exactly a missing list
    position).  One symmetric anti-join action at the trust boundary, same
    design as core.check_series (explicit, not per-operator)."""
    a = df1.select("series_id").distinct()
    b = df2.select("series_id").distinct()
    diff = a.exceptAll(b).unionAll(b.exceptAll(a))
    if diff.limit(1).count():
        raise TsError(_DIM_MSG[op])


def scalar_number_af(scalar) -> float:
    """af scalar layer's number validation — message differs from tf's
    'number is not numeric': af names the value
    ('Value received is not a number: %s', af:358-362)."""
    try:
        return float(scalar)
    except (TypeError, ValueError):
        raise TsError(f"Value received is not a number: {scalar}") from None


def scalar_product_af(df: DataFrame, scalar) -> DataFrame:
    """af scalar_product (af:356-372): same multiply as the tf scalar op,
    validated with the af layer's exact message."""
    return scalar_product(df, scalar_number_af(scalar))


def addition(*dfs: DataFrame) -> DataFrame:
    """Variadic fold of pairwise addition (tf:760-801)."""
    if len(dfs) <= 1:
        raise TsError("Addition requires at least two arguments")
    acc = dfs[0]
    for other in dfs[1:]:
        acc = pair_op(acc, other, "add")
    return acc


def subtraction(df1: DataFrame, df2: DataFrame) -> DataFrame:
    """tf:822-872."""
    return pair_op(df1, df2, "sub")


def product(df1: DataFrame, df2: DataFrame) -> DataFrame:
    """tf:876-926."""
    return pair_op(df1, df2, "mul")


def division(df1: DataFrame, df2: DataFrame) -> DataFrame:
    """÷0 / ±inf rows dropped (tf:930-986)."""
    return pair_op(df1, df2, "div")


def truncate_values(df: DataFrame, truncate_unit: float = 1.0) -> DataFrame:
    """Floor value to multiples of a unit — the *intent* of the reference's
    dead ``truncate_timeseries`` (af:376-406 has a loop-variable NameError;
    SURVEY.md §7.4 item 17: implement intent, don't reproduce the bug)."""
    u = float(truncate_unit)
    if u <= 0:
        raise TsError("truncate_unit is not positive")
    return df.select(
        "series_id", "epoch",
        (F.lit(u) * F.floor(F.col("value") / F.lit(u))).alias("value"),
    )


def round_values(df: DataFrame, round_unit: float = 1.0) -> DataFrame:
    """Round value to multiples of a unit (intent of af:421-441)."""
    u = float(round_unit)
    if u <= 0:
        raise TsError("round_unit is not positive")
    return df.select(
        "series_id", "epoch",
        (F.lit(u) * F.round(F.col("value") / F.lit(u))).alias("value"),
    )


def clean_duplicated(df: DataFrame) -> DataFrame:
    """Drop consecutive duplicate values, keep first of each run (af:619-650)."""
    from pyspark.sql import Window

    w = Window.partitionBy("series_id").orderBy("epoch")
    prev = F.lag("value").over(w)
    return (
        df.withColumn("_prev", prev)
        .filter(F.col("_prev").isNull() | (F.col("value") != F.col("_prev")))
        .drop("_prev")
    )


def delete_critical_values(df: DataFrame, critical_value: float) -> DataFrame:
    """Filter out sentinel values (af:653-667)."""
    return df.filter(F.col("value") != F.lit(critical_value))
