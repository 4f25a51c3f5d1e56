"""cohort_retention and priority_sample: hand-built matrices and an
independent hashlib/python mirror of the priority-sampling math."""

import hashlib

import pyspark.sql.functions as F

from tsengine.operators.eventops import cohort_retention
from tsengine.operators.sampling import H_SPACE, priority_sample

DAY = 86400


def _draw(key, salt=""):
    return int(hashlib.md5((str(key) + salt).encode()).hexdigest()[:15], 16)


def test_cohort_retention_matrix(spark):
    # u1: days 0,1,2 ; u2: days 0,2 ; u3: day 1 only ; u4: days 1,2
    # duplicate activity within a day must count once (u1 twice on day 0)
    rows = [
        (0 * DAY + 10, 1), (0 * DAY + 99, 1), (1 * DAY + 5, 1), (2 * DAY, 1),
        (0 * DAY + 3, 2), (2 * DAY + 7, 2),
        (1 * DAY + 1, 3),
        (1 * DAY + 2, 4), (2 * DAY + 2, 4),
    ]
    df = spark.createDataFrame(rows, "ep long, user_id long")
    got = {
        (r["cohort"], r["offset"]): (r["n_users"], r["retention"])
        for r in cohort_retention(df, width_sec=DAY).collect()
    }
    assert got == {
        (0, 0): (2, 1.0),        # u1, u2
        (0, 1): (1, 0.5),        # u1
        (0, 2): (2, 1.0),        # u1, u2
        (DAY, 0): (2, 1.0),      # u3, u4
        (DAY, 1): (1, 0.5),      # u4
    }


def test_cohort_retention_max_offset(spark):
    rows = [(0, 1), (5 * DAY, 1), (0, 2)]
    df = spark.createDataFrame(rows, "ep long, user_id long")
    got = {
        (r["cohort"], r["offset"]): r["n_users"]
        for r in cohort_retention(df, width_sec=DAY, max_offset=2).collect()
    }
    assert got == {(0, 0): 2}


def _docs(spark, n=40, groups=("a", "b")):
    rows = [
        (i, groups[i % len(groups)], float(10 + (i * 7) % 90))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, weight double")


def test_priority_sample_matches_python_mirror(spark):
    k = 4
    df = _docs(spark)
    got = {
        (r["lang"], r["doc_id"]): (r["priority"], r["est_weight"])
        for r in priority_sample(df, k=k, by="lang", salt="s1").collect()
    }
    # independent mirror: same math via hashlib
    exp = {}
    for lang in ("a", "b"):
        rows = [r for r in df.collect() if r["lang"] == lang]
        pri = sorted(
            (
                (r["weight"] * float(H_SPACE) / float(_draw(r["doc_id"], "s1") + 1),
                 r["doc_id"], r["weight"])
                for r in rows
            ),
            key=lambda t: (-t[0], t[1]),
        )
        tau = pri[k][0] if len(pri) > k else 0.0
        for q, did, w in pri[:k]:
            exp[(lang, did)] = (round(q, 6), round(max(w, tau), 6))
    assert got == exp


def test_priority_sample_small_group_kept_whole(spark):
    df = _docs(spark, n=3, groups=("a",))
    out = priority_sample(df, k=10, by="lang").collect()
    assert len(out) == 3
    assert all(r["est_weight"] == r["weight"] for r in out)


def test_priority_sample_global_and_partitioning_invariance(spark):
    df = _docs(spark, n=50)
    a = sorted(
        r["doc_id"] for r in priority_sample(df.repartition(1), k=7).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in priority_sample(df.repartition(9, "lang"), k=7).collect()
    )
    assert a == b and len(a) == 7
    # zero/negative weights are excluded
    df0 = df.withColumn(
        "weight",
        F.when(F.col("doc_id") < 45, F.lit(0.0)).otherwise(F.col("weight")),
    )
    kept = priority_sample(df0, k=10).collect()
    assert {r["doc_id"] for r in kept} == set(range(45, 50))
    assert all(r["est_weight"] == r["weight"] for r in kept)


def test_plan_shapes(spark):
    """Scale guards: cohort_retention = 3 exchanges (user agg, matrix agg,
    cohort-size window over the tiny post-agg matrix); grouped
    priority_sample = 2 (rank window + tau join); global priority_sample
    plans TakeOrderedAndProject, never a full sort."""
    ev = spark.createDataFrame([(0, 1)], "ep long, user_id long")
    p = cohort_retention(ev)._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange hashpartitioning") == 3, p

    docs = _docs(spark, n=20)
    p2 = (
        priority_sample(docs, k=3, by="lang")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert p2.count("Exchange hashpartitioning") <= 2, p2
    p3 = priority_sample(docs, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p3 and "Sort " not in p3, p3
