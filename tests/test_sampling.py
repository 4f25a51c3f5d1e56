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


def _py_draw(key, salt=""):
    """Independent python mirror of sampling.hash_draw."""
    import hashlib
    return int(hashlib.md5(f"{key}{salt}".encode()).hexdigest()[:15], 16)


def test_hash_draw_matches_python_md5(spark):
    rows = _ids(spark, 50).select(
        "doc_id", hash_draw(F.col("doc_id"), "s1").alias("h")).collect()
    for r in rows:
        assert r["h"] == _py_draw(r["doc_id"], "s1")


def test_source_quota_hand_computed(spark):
    from tsengine.operators.sampling import source_quota

    rows = [(i, "a" if i < 8 else "b") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = source_quota(df, quota=3, salt="q").collect()
    by = {}
    for r in out:
        by.setdefault(r["source"], set()).add(r["doc_id"])
    # class b (4 docs) capped at 3; class a (8 docs) capped at 3
    assert len(by["a"]) == 3 and len(by["b"]) == 3
    # survivors = lowest-draw keys per class (python md5 mirror)
    exp_a = set(sorted(range(8), key=lambda k: (_py_draw(k, "q"), k))[:3])
    exp_b = set(sorted(range(8, 12), key=lambda k: (_py_draw(k, "q"), k))[:3])
    assert by["a"] == exp_a and by["b"] == exp_b
    # under-quota classes untouched
    assert source_quota(df, quota=100).count() == 12


def test_pack_sequences_hand_computed(spark):
    from tsengine.operators.sampling import pack_sequences

    lens = {1: 4, 2: 10, 3: 7, 4: 25, 5: 1, 6: 0}
    df = spark.createDataFrame(list(lens.items()), "doc_id long, n_tokens long")
    out = {r["doc_id"]: r for r in
           pack_sequences(df, max_len=10, shards=1, salt="p").collect()}
    assert 6 not in out  # zero-length docs dropped
    order = sorted([k for k in lens if lens[k] > 0],
                   key=lambda k: (_py_draw(k, "p"), k))
    cum = 0
    for k in order:
        r = out[k]
        assert r["shard"] == 0
        assert r["offset"] == cum, (k, r["offset"], cum)
        assert r["seq_first"] == cum // 10
        assert r["seq_last"] == (cum + lens[k] - 1) // 10
        assert r["n_seqs"] == r["seq_last"] - r["seq_first"] + 1
        cum += lens[k]
    # a 25-token doc at any offset spans >= 3 chunks of 10
    assert out[4]["n_seqs"] >= 3


def test_pack_sequences_single_exchange(spark):
    from tsengine.operators.sampling import pack_sequences

    df = spark.createDataFrame([(1, 5)], "doc_id long, n_tokens long")
    plan = (
        pack_sequences(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") <= 2  # one shard shuffle (+AQE read)


def test_budget_sample(spark):
    from pyspark.sql import functions as F

    from tsengine.operators.sampling import budget_sample

    rows = [(i, "a" if i < 60 else "b", 100) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    # a: 60 docs x 100 chars = 6000 total, budget 1500 -> rate .25
    # b: budget exceeds total -> kept whole
    out = budget_sample(df, class_col="source", weight_col="n_chars",
                        budgets={"a": 1500.0, "b": 99999.0}, salt="t")
    kept = out.groupBy("source").count().collect()
    got = {r["source"]: r["count"] for r in kept}
    assert got["b"] == 40
    assert 5 <= got["a"] <= 25  # ~15 expected at rate .25
    # no budget and no default -> class kept whole
    out2 = budget_sample(df, class_col="source", weight_col="n_chars",
                         budgets={"a": 1500.0}, default_budget=None, salt="t")
    assert out2.where(F.col("source") == "b").count() == 40
    # determinism + partitioning invariance
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in budget_sample(df.repartition(7), class_col="source",
                               weight_col="n_chars",
                               budgets={"a": 1500.0, "b": 99999.0},
                               salt="t").collect()
    )
    assert a == b
