"""Deterministic sampling / splitting / contamination: reproducibility,
rate accuracy, split exclusivity, hand-computed contamination vectors."""

import pytest
from pyspark.sql import functions as F

from tsengine.operators.sampling import (
    H_SPACE,
    hash_draw,
    hash_sample,
    hash_split,
    stratified_sample,
    threshold,
)
from tsengine.operators.textops import contamination_check


def _ids(spark, n=2000):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_hash_sample_deterministic_and_calibrated(spark):
    df = _ids(spark)
    a = {r[0] for r in hash_sample(df, rate=0.2, salt="s").collect()}
    b = {r[0] for r in hash_sample(df, rate=0.2, salt="s").collect()}
    assert a == b  # pure function of (key, salt)
    # calibration: binomial(2000, 0.2) within 5 sigma
    assert abs(len(a) - 400) < 5 * (2000 * 0.2 * 0.8) ** 0.5
    # different salt decorrelates (not identical subset)
    c = {r[0] for r in hash_sample(df, rate=0.2, salt="t").collect()}
    assert c != a
    # nested rates: a lower-rate sample with the same salt is a subset
    d = {r[0] for r in hash_sample(df, rate=0.1, salt="s").collect()}
    assert d <= a


def test_hash_sample_partitioning_invariance(spark):
    df = _ids(spark)
    one = {r[0] for r in hash_sample(df.coalesce(1), rate=0.3).collect()}
    many = {r[0] for r in hash_sample(df.repartition(13), rate=0.3).collect()}
    assert one == many


def test_threshold_bounds():
    assert threshold(0.0) == 0
    assert threshold(1.0) == H_SPACE
    with pytest.raises(ValueError):
        threshold(1.5)


def test_stratified_rates(spark):
    df = _ids(spark, 3000).withColumn(
        "lang", F.element_at(F.array(F.lit("en"), F.lit("zh"), F.lit("de")),
                             (F.col("doc_id") % 3 + 1).cast("int")))
    out = stratified_sample(df, rates={"en": 1.0, "zh": 0.0},
                            default_rate=0.5, salt="x")
    got = out.groupBy("lang").count().collect()
    by = {r["lang"]: r["count"] for r in got}
    assert by.get("en") == 1000         # rate 1.0 keeps everything
    assert "zh" not in by                # rate 0.0 drops everything
    assert 350 < by.get("de", 0) < 650   # default 0.5


def test_hash_split_exclusive_exhaustive_stable(spark):
    df = _ids(spark)
    out = hash_split(df, fracs={"train": 0.8, "val": 0.1, "test": 0.1})
    rows = out.collect()
    assert len(rows) == 2000             # every row labeled exactly once
    by = {}
    for r in rows:
        by[r["split"]] = by.get(r["split"], 0) + 1
    assert set(by) == {"train", "val", "test"}
    assert 1450 < by["train"] < 1750 and by["val"] > 100 and by["test"] > 100
    # same key -> same split in a DIFFERENT table sharing the key space
    other = hash_split(_ids(spark), fracs={"train": 0.8, "val": 0.1, "test": 0.1})
    m1 = {r["doc_id"]: r["split"] for r in rows}
    m2 = {r["doc_id"]: r["split"] for r in other.collect()}
    assert m1 == m2
    with pytest.raises(ValueError):
        hash_split(df, fracs={"a": 0.5, "b": 0.1})


def test_hash_draw_range(spark):
    mx = _ids(spark).select(F.max(hash_draw(F.col("doc_id"))).alias("m"),
                            F.min(hash_draw(F.col("doc_id"))).alias("n")).first()
    assert 0 <= mx["n"] and mx["m"] < H_SPACE


def test_contamination_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),        # shingles: abc bcd cde
            (2, "a b c x y"),        # abx? no: abc bcx cxy -> overlap abc
            (3, "z z"),              # too short: no shingles -> absent
            (4, "p q r s"),          # pqr qrs: clean
        ],
        "doc_id long, text string",
    )
    bench = docs.where(F.col("doc_id") == 1)
    out = {r["doc_id"]: r for r in
           contamination_check(docs, bench, k=3, threshold=0.5).collect()}
    assert out[1]["contam_frac"] == 1.0 and out[1]["contaminated"]
    r2 = out[2]
    assert r2["n_shingles"] == 3 and r2["n_overlap"] == 1
    assert abs(r2["contam_frac"] - 0.333333) < 1e-9 and not r2["contaminated"]
    assert 3 not in out                  # no shingles -> no row
    assert out[4]["n_overlap"] == 0 and not out[4]["contaminated"]


def test_contamination_duplicate_shingles_counted_once(spark):
    docs = spark.createDataFrame(
        [(1, "a b c a b c a b c")],   # 'a b c' appears 3x raw -> distinct once
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
    r = contamination_check(docs, bench, k=3).collect()[0]
    # raw shingles: abc bca cab abc bca cab abc -> distinct {abc,bca,cab}
    assert r["n_shingles"] == 3 and r["n_overlap"] == 1


def test_sampling_is_map_only_plan(spark):
    df = _ids(spark)
    plan = (
        hash_sample(df, rate=0.5)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan        # pure filter, no shuffle
    plan2 = (
        hash_split(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan2
