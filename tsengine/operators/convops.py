"""Conversation-native transcript operators: turn-stutter dedup, context-
window truncation, and shared-prefix (fork) detection.

These are transcript-shaped curation ops the tier/rollup layer does not
cover: they operate on the raw turn stream of the north rule's table
(conv_id, turn_idx, role, text, tool, ts) and preserve its invariants
(dense 1-based turn_idx, per-turn text equality under stable ordering).

Scale shapes (every op here is one conv_id-keyed exchange plus, for forks,
one bounded group join):

- :func:`dedup_turns` — retry/stutter removal — lag compare + re-rank over
  the SAME conv_id window partitioning (one Exchange in the executed plan).
- :func:`truncate_context` — longest suffix under a token budget —
  a descending-order running sum over the same window (the growing-frame
  direction Spark evaluates incrementally, see resample.py's bfill note).
- :func:`conv_forks` — agent retries / resampled branches share a turn
  prefix; detecting them pairwise without comparing every conversation
  against every other.  A double polynomial rolling hash (two independent
  2^31-scale prime moduli -> ~2^62 combined collision space) makes every
  prefix a 2-long fingerprint computable as a cumulative windowed SUM:
  prefix_k(d) = sum_{i<=d} h_i * base_k^(i-1) mod m_k.  No suffix arrays,
  no per-row Python, no pairwise scan: conversations collide only through
  an equi-join on (depth, ph1, ph2), so join volume is the number of
  genuinely shared prefixes, not n^2.  Reference analogue: none (the
  reference has no text surface); the per-doc MinHash/LSH family
  (dedup.py) covers unordered near-duplication — this covers ORDERED
  exact-prefix duplication, which is what conversation forks are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# two independent rolling-hash planes: primes just under 2^31 keep every
# product (m - 1) * base < 2^62 inside a long with no intermediate overflow
_M1, _B1 = 2147483629, 1000003
_M2, _B2 = 2147483587, 1000033

# turn content hash: the repo-wide cross-engine md5 convention
# (sampling.py:30 — Spark conv(substr(md5(x),1,15),16,10) ==
#  DuckDB CAST('0x'||substr(md5(x),1,15) AS BIGINT)), 60 uniform bits
def _turn_hash(role, text):
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", role, text)), 1, 15), 16, 10
    ).cast("long")


def dedup_turns(transcripts: DataFrame, keep_cols: bool = True) -> DataFrame:
    """Drop CONSECUTIVE duplicate turns (same role AND text as the previous
    turn of the conversation) — the retry-stutter artifact of agent loops —
    and re-rank the survivors to a dense 1-based ``turn_idx``.

    The first occurrence is kept (with its timestamp), so per-turn text
    equality under (conv_id, turn_idx) ordering is preserved for every
    surviving turn.  ``orig_turn_idx`` records the pre-dedup position.

    Plan: one Exchange on conv_id; the lag comparison and the survivor
    re-rank run over the same window partitioning."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    flagged = transcripts.withColumn(
        "_dup",
        (F.col("role").eqNullSafe(F.lag("role").over(w)))
        & (F.col("text").eqNullSafe(F.lag("text").over(w))),
    )
    kept = flagged.filter(~F.coalesce(F.col("_dup"), F.lit(False)))
    out = kept.withColumn(
        "new_turn_idx", F.row_number().over(w)
    ).withColumnRenamed("turn_idx", "orig_turn_idx").withColumnRenamed(
        "new_turn_idx", "turn_idx"
    )
    cols = ["conv_id", "turn_idx", "orig_turn_idx", "role", "text"]
    if keep_cols:
        cols += [c for c in ("tool", "ts") if c in transcripts.columns]
    return out.select(*cols)


def truncate_context(transcripts: DataFrame, budget: int,
                     pin_first: int = 0,
                     tokens_col: str | None = None) -> DataFrame:
    """Keep, per conversation, the longest SUFFIX of turns whose cumulative
    token count fits ``budget`` — the context-window assembly rule (newest
    turns matter most) — optionally pinning the first ``pin_first`` turns
    (system prompt) regardless of budget.  Pinned turns do not consume the
    suffix budget.

    Tokens come from ``tokens_col`` if given, else the cross-engine
    ``greatest(1, ceil(length(text)/4))`` estimate (the usual 4-chars/token
    rule; exact BPE counting is a tokenizer concern, not an engine one).

    The suffix is found with ONE descending-order running sum over the
    conv_id window — the growing-frame direction Spark evaluates in O(n)
    per series — and is contiguous by construction (token counts are
    positive, so the running sum is monotone from the tail).

    Output keeps the original ``turn_idx`` (text equality stays anchored)
    plus ``new_turn_idx`` densely re-ranked over the kept turns and
    ``pinned`` marking budget-exempt rows."""
    t = transcripts
    if tokens_col is None:
        t = t.withColumn(
            "_tok",
            F.greatest(F.lit(1), F.ceil(F.length(F.coalesce("text", F.lit(""))) / 4)).cast("long"),
        )
    else:
        t = t.withColumn("_tok", F.col(tokens_col).cast("long"))
    wdesc = Window.partitionBy("conv_id").orderBy(F.col("turn_idx").desc())
    t = t.withColumn("_revcum", F.sum("_tok").over(wdesc))
    kept = t.filter(
        (F.col("turn_idx") <= pin_first) | (F.col("_revcum") <= budget)
    )
    wasc = Window.partitionBy("conv_id").orderBy("turn_idx")
    out = kept.withColumn("new_turn_idx", F.row_number().over(wasc)).withColumn(
        "pinned", F.col("turn_idx") <= pin_first
    )
    cols = ["conv_id", "turn_idx", "new_turn_idx", "pinned", "role", "text"]
    cols += [c for c in ("tool", "ts") if c in transcripts.columns]
    return out.select(*cols, F.col("_tok").alias("tokens"))


def tool_transitions(transcripts: DataFrame, width_sec: int = 86400) -> DataFrame:
    """Per-bucket tool-call bigram counts: order each conversation's
    TOOL-CALL turns (``tool`` non-null) by ``turn_idx`` and count
    (previous tool -> tool) transitions, bucketed by the destination
    call's timestamp — the agent-behavior transition matrix (which tool
    follows which), the companion of :func:`rollup.latency_by_transition`
    (role plane) on the tool plane.

    Plan: ONE Exchange on conv_id for the lag window; the groupBy runs
    partial (map-side) aggregation before its own keyed exchange, so
    shuffle volume is the number of distinct (bucket, from, to) cells per
    task, not the call count."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    calls = transcripts.filter(F.col("tool").isNotNull())
    t = calls.withColumn("_prev", F.lag("tool").over(w)).filter(
        F.col("_prev").isNotNull()
    )
    return t.groupBy(
        (F.floor(F.col("ts").cast("long") / width_sec) * width_sec).alias("bucket"),
        F.col("_prev").alias("tool_from"),
        F.col("tool").alias("tool_to"),
    ).agg(F.count("*").cast("long").alias("n"))


def tool_loops(transcripts: DataFrame, min_run: int = 3) -> DataFrame:
    """Maximal runs of CONSECUTIVE same-tool calls per conversation with
    length >= ``min_run`` — the stuck-agent detector (a model retrying one
    tool over and over), positional like :func:`dedup_turns` but on the
    tool-call subsequence rather than adjacent raw turns.

    Gaps-and-islands without a second window partitioning: a run starts
    where the tool differs from the previous call's (lag), the run id is
    the running sum of starts over the SAME conv_id window, and the final
    ``groupBy(conv_id, run_id, tool)`` is clustering-satisfied by the
    window's conv_id hashpartitioning (group keys are a superset) — ONE
    Exchange in the executed plan, same shape as eventops.session_stats."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    calls = transcripts.filter(F.col("tool").isNotNull())
    start = (~F.col("tool").eqNullSafe(F.lag("tool").over(w))).cast("long")
    t = calls.withColumn("_run", F.sum(start).over(w))
    return (
        t.groupBy("conv_id", "_run", "tool")
        .agg(
            F.count("*").cast("long").alias("run_len"),
            F.min("turn_idx").cast("long").alias("start_turn_idx"),
            F.max("turn_idx").cast("long").alias("end_turn_idx"),
        )
        .filter(F.col("run_len") >= int(min_run))
        .select("conv_id", "tool", "run_len", "start_turn_idx", "end_turn_idx")
    )


def prefix_hashes(transcripts: DataFrame, max_depth: int = 4096) -> DataFrame:
    """Per (conv_id, depth<=max_depth): the double rolling-hash fingerprint
    of the conversation's first ``depth`` turns (role + text content).

    The base-power table (base^(i-1) mod m, i = 1..max_depth) is a tiny
    broadcast-joined frame, not a literal array — the plan stays constant-
    size in max_depth.  The prefix hash itself is a cumulative windowed SUM
    of h_i * power_i taken mod m at each row: terms are < 2^31, so even a
    4096-deep sum stays < 2^43, no overflow, no intermediate mods."""
    spark = transcripts.sparkSession
    pows, q1, q2 = [], 1, 1
    for i in range(1, max_depth + 1):
        pows.append((i, q1, q2))
        q1 = (q1 * _B1) % _M1
        q2 = (q2 * _B2) % _M2
    powers = spark.createDataFrame(pows, "i int, q1 long, q2 long")

    h = (
        transcripts.filter(F.col("turn_idx") <= max_depth)
        .select(
            "conv_id", "turn_idx", _turn_hash(F.col("role"), F.col("text")).alias("_h")
        )
        .join(F.broadcast(powers), F.col("turn_idx") == F.col("i"))
        .select(
            "conv_id",
            "turn_idx",
            ((F.col("_h") % _M1) * F.col("q1") % _M1).alias("_t1"),
            ((F.col("_h") % _M2) * F.col("q2") % _M2).alias("_t2"),
        )
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return h.select(
        "conv_id",
        F.col("turn_idx").alias("depth"),
        (F.sum("_t1").over(w) % _M1).alias("ph1"),
        (F.sum("_t2").over(w) % _M2).alias("ph2"),
    )


def conv_forks(transcripts: DataFrame, min_depth: int = 3,
               max_depth: int = 4096, max_group: int = 64,
               confirm: bool = False) -> DataFrame:
    """Conversation pairs sharing a turn prefix of length >= ``min_depth``
    (role AND text equal turn-by-turn), with the maximal shared depth —
    the fork/retry/resample-branch detector.

    Output: (conv_a, conv_b, shared_depth, template, group_n).  Pair rows
    carry template=False, group_n=NULL.  A prefix cell shared by MORE than
    ``max_group`` conversations (a fleet-wide system preamble) is template
    text, not a fork — its pair semantics would be quadratic in group size
    — so instead of dropping silently (VERDICT r04 task 5) each oversized
    (depth, ph1, ph2) cell surfaces as ONE marker row: conv_a/conv_b NULL,
    shared_depth = the cell's depth, template=True, group_n = how many
    conversations share it.  A preamble of length L yields at most
    L - min_depth + 1 markers (its nested prefixes), bounded by template
    length, never by fleet size.  Raise ``max_group`` (or pre-strip the
    preamble with :func:`truncate_context`) when fleet-template pairs are
    wanted.

    Mechanics: :func:`prefix_hashes` fingerprints every prefix; an
    aggregation splits (depth, ph1, ph2) cells into pair cells
    (2..max_group members, self-equi-joined) and template cells (markers);
    max(depth) per pair collapses the nested prefixes.  Join volume is
    sum-over-shared-prefixes, never n^2.

    Collision honesty: equality is through two independent 2^31-prime
    rolling hashes (~2^62 joint space); at 10^9 shared-prefix cells the
    expected false-pair count is ~1e-4.  ``confirm=True`` (VERDICT r04
    task 6) removes even that: every candidate pair is re-verified against
    the ACTUAL (role, text) turns — the true shared depth is recomputed as
    the last turn before the first textual mismatch, pairs falling below
    ``min_depth`` (pure hash collisions) are dropped, and deeper-collision
    pairs are truncated to their textual depth.  Cost O(shared text
    volume): only turns up to the candidate depth of candidate pairs are
    ever joined."""
    pref = prefix_hashes(transcripts, max_depth=max_depth).filter(
        F.col("depth") >= min_depth
    )
    counted = pref.groupBy("depth", "ph1", "ph2").agg(F.count("*").alias("_n"))
    cells = counted.filter(
        (F.col("_n") >= 2) & (F.col("_n") <= max_group)
    ).drop("_n")
    member = pref.join(cells, ["depth", "ph1", "ph2"])
    a = member.select("depth", "ph1", "ph2", F.col("conv_id").alias("conv_a"))
    b = member.select("depth", "ph1", "ph2", F.col("conv_id").alias("conv_b"))
    pairs = a.join(b, ["depth", "ph1", "ph2"]).filter(
        F.col("conv_a") < F.col("conv_b")
    )
    out = (
        pairs.groupBy("conv_a", "conv_b")
        .agg(F.max("depth").cast("long").alias("shared_depth"))
    )
    if confirm:
        out = _confirm_forks(transcripts, out, min_depth)
    markers = counted.filter(F.col("_n") > max_group).select(
        F.lit(None).cast("string").alias("conv_a"),
        F.lit(None).cast("string").alias("conv_b"),
        F.col("depth").cast("long").alias("shared_depth"),
        F.lit(True).alias("template"),
        F.col("_n").cast("long").alias("group_n"),
    )
    return out.select(
        "conv_a", "conv_b", "shared_depth",
        F.lit(False).alias("template"),
        F.lit(None).cast("long").alias("group_n"),
    ).unionByName(markers)


def _confirm_forks(transcripts: DataFrame, cand: DataFrame,
                   min_depth: int) -> DataFrame:
    """Exact-confirm stage for :func:`conv_forks` candidates: join each
    pair's actual turns 1..shared_depth side by side and recompute the
    textual shared depth (last turn before the first (role, text)
    mismatch).  Hash-collision pairs (textual depth < min_depth) are
    dropped; deeper collisions truncate to the textual depth."""
    turns = transcripts.select(
        "conv_id", "turn_idx", F.col("role").alias("_r"), F.col("text").alias("_t")
    )
    left = cand.join(
        turns, cand["conv_a"] == turns["conv_id"]
    ).filter(
        (F.col("turn_idx") >= 1) & (F.col("turn_idx") <= F.col("shared_depth"))
    ).select("conv_a", "conv_b", "shared_depth", "turn_idx",
             F.col("_r").alias("_ra"), F.col("_t").alias("_ta"))
    both = left.join(
        turns.withColumnRenamed("conv_id", "conv_b"), ["conv_b", "turn_idx"]
    )
    eq = (F.col("_ra").eqNullSafe(F.col("_r"))
          & F.col("_ta").eqNullSafe(F.col("_t")))
    return (
        both.groupBy("conv_a", "conv_b", "shared_depth")
        .agg(
            F.min(F.when(~eq, F.col("turn_idx"))).alias("_first_bad"),
        )
        .select(
            "conv_a", "conv_b",
            F.coalesce(F.col("_first_bad") - 1, F.col("shared_depth"))
            .cast("long").alias("shared_depth"),
        )
        .filter(F.col("shared_depth") >= int(min_depth))
    )
