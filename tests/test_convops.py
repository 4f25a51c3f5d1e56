"""Conversation-native ops: turn-stutter dedup, context-window truncation,
shared-prefix fork detection (hand-built goldens + invariants)."""

import pytest
from pyspark.sql import functions as F

from tsengine.operators import convops


def _t(spark, rows):
    """rows: (conv_id, turn_idx, role, text)"""
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


def test_dedup_turns_stutter(spark):
    t = _t(spark, [
        ("c", 1, "user", "hi"),
        ("c", 2, "assistant", "yo"),
        ("c", 3, "assistant", "yo"),     # stutter -> dropped
        ("c", 4, "assistant", "yo!"),    # different text -> kept
        ("c", 5, "user", "yo!"),         # different role -> kept
        ("c", 6, "user", "yo!"),         # stutter -> dropped
        ("d", 1, "user", "hi"),          # other conv unaffected
    ])
    out = convops.dedup_turns(t, keep_cols=False).orderBy("conv_id", "turn_idx")
    got = [(r.conv_id, r.turn_idx, r.orig_turn_idx, r.text) for r in out.collect()]
    assert got == [
        ("c", 1, 1, "hi"), ("c", 2, 2, "yo"), ("c", 3, 4, "yo!"),
        ("c", 4, 5, "yo!"), ("d", 1, 1, "hi"),
    ]
    # dense re-rank invariant
    assert [g[1] for g in got if g[0] == "c"] == [1, 2, 3, 4]


def test_dedup_turns_null_text(spark):
    # NULL text: consecutive NULLs with same role are duplicates (eqNullSafe)
    t = _t(spark, [("c", 1, "a", None), ("c", 2, "a", None), ("c", 3, "a", "x")])
    out = convops.dedup_turns(t, keep_cols=False)
    assert out.count() == 2


def test_truncate_context_suffix_and_pin(spark):
    # texts sized so tokens = 1,2,3,4,5 (4 chars/token, ceil)
    rows = [("c", i, "user", "x" * (4 * i)) for i in range(1, 6)]
    t = _t(spark, rows)
    # budget 9 fits suffix [4,5]; pin_first=1 keeps turn 1 regardless
    out = convops.truncate_context(t, budget=9, pin_first=1).orderBy("turn_idx")
    got = [(r.turn_idx, r.new_turn_idx, r.pinned, r.tokens) for r in out.collect()]
    assert got == [(1, 1, True, 1), (4, 2, False, 4), (5, 3, False, 5)]

    # no pinning: pure suffix; budget 12 fits [3,4,5]
    out = convops.truncate_context(t, budget=12).orderBy("turn_idx")
    assert [r.turn_idx for r in out.collect()] == [3, 4, 5]

    # budget smaller than last turn: nothing but pins survive
    out = convops.truncate_context(t, budget=4, pin_first=2)
    assert sorted(r.turn_idx for r in out.collect()) == [1, 2]

    # suffix is contiguous by construction
    out = convops.truncate_context(t, budget=100)
    assert out.count() == 5


def test_truncate_context_custom_tokens(spark):
    t = _t(spark, [("c", 1, "u", "a"), ("c", 2, "u", "b")]).withColumn(
        "ntok", F.when(F.col("turn_idx") == 1, 10).otherwise(3)
    )
    out = convops.truncate_context(t, budget=3, tokens_col="ntok")
    assert [r.turn_idx for r in out.collect()] == [2]


def _fork_frame(spark):
    """a/b share 4-turn prefix then diverge; c/d identical 5 turns;
    a vs c share 3; e is unrelated; f too short."""
    base = [("u", "s0"), ("a", "s1"), ("u", "s2")]
    conv = {
        "a": base + [("a", "s3"), ("u", "zzA")],
        "b": base + [("a", "s3"), ("u", "zzB")],
        "c": base + [("a", "x3"), ("u", "x4")],
        "d": base + [("a", "x3"), ("u", "x4")],
        "e": [("u", "q0"), ("a", "q1"), ("u", "q2"), ("a", "q3")],
        "f": [("u", "s0"), ("a", "s1")],  # shares only depth-2 prefix
    }
    rows = [
        (cid, i + 1, role, text)
        for cid, turns in conv.items()
        for i, (role, text) in enumerate(turns)
    ]
    return _t(spark, rows)


def test_conv_forks_golden(spark):
    out = convops.conv_forks(_fork_frame(spark), min_depth=3)
    got = {(r.conv_a, r.conv_b): r.shared_depth for r in out.collect()}
    assert got == {
        ("a", "b"): 4,
        ("c", "d"): 5,
        ("a", "c"): 3, ("a", "d"): 3, ("b", "c"): 3, ("b", "d"): 3,
    }


def test_conv_forks_min_depth_and_group_cap(spark):
    t = _fork_frame(spark)
    # min_depth=5: only the fully-identical pair survives
    out = convops.conv_forks(t, min_depth=5)
    assert {(r.conv_a, r.conv_b, r.shared_depth) for r in out.collect()} == {
        ("c", "d", 5)
    }
    # max_group=3: the depth-3 cell holds 4 convs (a,b,c,d) -> excluded
    # from pairing as boilerplate AND surfaced as a template marker row
    # (r04 task 5), while the deeper (smaller) cells still pair
    out = convops.conv_forks(t, min_depth=3, max_group=3)
    rows = out.collect()
    pairs = {(r.conv_a, r.conv_b): r.shared_depth
             for r in rows if not r.template}
    assert pairs == {("a", "b"): 4, ("c", "d"): 5}
    assert all(r.group_n is None for r in rows if not r.template)
    markers = [(r.shared_depth, r.group_n) for r in rows if r.template]
    assert markers == [(3, 4)]  # the depth-3 cell shared by a,b,c,d
    marker_row = [r for r in rows if r.template][0]
    assert marker_row.conv_a is None and marker_row.conv_b is None
    # schema identical whether or not any cell overflows
    assert out.columns == convops.conv_forks(t, min_depth=3).columns


def test_conv_forks_max_depth_truncates(spark):
    # identical 6-turn convs with max_depth=4: shared depth caps at 4
    rows = []
    for cid in ("p", "q"):
        for i in range(1, 7):
            rows.append((cid, i, "u", f"t{i}"))
    out = convops.conv_forks(_t(spark, rows), min_depth=2, max_depth=4)
    assert [(r.conv_a, r.conv_b, r.shared_depth) for r in out.collect()] == [
        ("p", "q", 4)
    ]


def test_prefix_hashes_distinguish_order(spark):
    # same multiset of turns, different order -> different prefix hash at
    # depth 2 (the rolling hash is positional, unlike a bag hash)
    t = _t(spark, [
        ("x", 1, "u", "A"), ("x", 2, "u", "B"),
        ("y", 1, "u", "B"), ("y", 2, "u", "A"),
    ])
    p = convops.prefix_hashes(t).filter(F.col("depth") == 2).collect()
    by = {r.conv_id: (r.ph1, r.ph2) for r in p}
    assert by["x"] != by["y"]


def test_conv_forks_partitioning_invariance(spark):
    t = _fork_frame(spark)
    a = convops.conv_forks(t, min_depth=3)
    b = convops.conv_forks(t.repartition(7, "text"), min_depth=3)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_dedup_turns_plan_single_exchange(spark):
    """lag-compare + survivor re-rank reuse ONE conv_id exchange."""
    t = _t(spark, [("c", 1, "u", "x")])
    plan = convops.dedup_turns(t)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def _calls(spark, rows):
    """rows: (conv_id, turn_idx, tool, epoch) — tool None = plain turn."""
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, tool string, epoch long"
    ).withColumn("ts", F.col("epoch").cast("timestamp")).drop("epoch")


def test_tool_transitions_golden(spark):
    t = _calls(spark, [
        ("c", 1, "search", 100),
        ("c", 2, None, 110),          # plain turn skipped
        ("c", 3, "fetch", 120),       # search -> fetch
        ("c", 4, "fetch", 86500),     # fetch -> fetch, next day bucket
        ("d", 1, "fetch", 100),       # first call of d: no transition
        ("d", 2, "search", 130),      # fetch -> search
    ])
    out = convops.tool_transitions(t, width_sec=86400)
    got = {(r.bucket, r.tool_from, r.tool_to): r.n for r in out.collect()}
    assert got == {
        (0, "search", "fetch"): 1,
        (86400, "fetch", "fetch"): 1,
        (0, "fetch", "search"): 1,
    }


def test_tool_loops_golden_and_min_run(spark):
    t = _calls(spark, [
        ("c", 1, "a", 0), ("c", 2, None, 0), ("c", 3, "a", 0),  # run a x2 (gap turn ignored)
        ("c", 4, "b", 0),                                       # run b x1
        ("c", 5, "a", 0), ("c", 6, "a", 0), ("c", 7, "a", 0),   # run a x3
        ("d", 1, "b", 0), ("d", 2, "b", 0),                     # run b x2
    ])
    out = convops.tool_loops(t, min_run=2)
    got = {(r.conv_id, r.tool, r.start_turn_idx): (r.run_len, r.end_turn_idx)
           for r in out.collect()}
    assert got == {
        ("c", "a", 1): (2, 3),
        ("c", "a", 5): (3, 7),
        ("d", "b", 1): (2, 2),
    }
    assert convops.tool_loops(t, min_run=3).count() == 1


def test_tool_loops_plan_single_exchange(spark):
    """run-id window + island groupBy share ONE conv_id exchange (group
    keys are a superset of the window partitioning)."""
    t = _calls(spark, [("c", 1, "a", 0)])
    plan = convops.tool_loops(t)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_conv_forks_confirm_rejects_planted_collision(spark, monkeypatch):
    """r04 task 6: with the turn hash sabotaged to a constant (every turn
    'collides'), the hash stage claims EVERY conv pair shares a full
    prefix; confirm=True re-verifies against the actual (role, text) turns
    and keeps only the textually-true forks at their true depths."""
    t = _fork_frame(spark)
    truth = {(r.conv_a, r.conv_b): r.shared_depth
             for r in convops.conv_forks(t, min_depth=3).collect()
             if not r.template}

    monkeypatch.setattr(
        convops, "_turn_hash", lambda role, text: F.lit(7).cast("long")
    )
    collided = convops.conv_forks(t, min_depth=3)
    got_pairs = {(r.conv_a, r.conv_b) for r in collided.collect() if not r.template}
    assert len(got_pairs) > len(truth)  # collisions produced false pairs

    confirmed = convops.conv_forks(t, min_depth=3, confirm=True)
    got = {(r.conv_a, r.conv_b): r.shared_depth
           for r in confirmed.collect() if not r.template}
    assert got == truth  # false pairs rejected, true depths restored


def test_conv_forks_confirm_noop_without_collisions(spark):
    """With healthy hashes, confirm=True must not change the result."""
    t = _fork_frame(spark)
    a = convops.conv_forks(t, min_depth=3)
    b = convops.conv_forks(t, min_depth=3, confirm=True)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
