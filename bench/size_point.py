#!/usr/bin/env python
"""One row of the throughput-vs-input-size table (BENCH/BASELINE.md):
generate (or reuse) the deterministic synthetic transcripts table at
--n-conv conversations, run the raw->1m->1h->1d tier chain under the bench
protocol (local[32], 16 shuffle partitions, coalesce(16) input, untimed
warm-up, best-of-3), print one JSON line.

The point of the sweep is the 100-TB question in miniature: does per-point
cost keep improving as the input grows past job fixed costs, or does some
stage stop scaling?  r3 measured 2.7M/9M/27M turns; --n-conv 800000 with
--base-turns 60 adds a ~100M-turn point (4x the largest prior).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-conv", type=int, required=True)
    ap.add_argument("--base-turns", type=int, default=60)
    ap.add_argument("--hot-factor", type=int, default=40)
    def _positive(v: str) -> int:
        n = int(v)
        if n < 1:
            raise argparse.ArgumentTypeError("--runs must be >= 1")
        return n

    ap.add_argument("--runs", type=_positive, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--partitions", type=int, default=16)
    args = ap.parse_args()

    os.environ.setdefault("TSENGINE_TMPFS_SHUFFLE", "1")
    os.environ.setdefault("TSENGINE_PRETOUCH", "1")

    from tsengine.session import get_spark, release_persistent_rdds
    from tsengine.operators import rollup as R
    from tsengine.synth import write_transcripts

    # cache key carries EVERY generation parameter: a rerun with the same
    # --n-conv but different --base-turns/--hot-factor must not silently
    # reuse stale data (ADVICE r04).  The bare-n_conv name stays the alias
    # for the default parameters so existing cached tables keep working.
    if (args.base_turns, args.hot_factor) == (60, 40):
        tdir = f"/tmp/tsengine_bench_transcripts_{args.n_conv}"
    else:
        tdir = (f"/tmp/tsengine_bench_transcripts_{args.n_conv}"
                f"_b{args.base_turns}_h{args.hot_factor}")
    spark = get_spark(
        app_name="size-point",
        master=f"local[{args.cpus}]",
        shuffle_partitions=str(args.partitions),
    )
    if not os.path.exists(os.path.join(tdir, "_SUCCESS")):
        write_transcripts(
            spark, tdir, n_conv=args.n_conv,
            base_turns=args.base_turns, hot_factor=args.hot_factor,
        )

    raw = spark.read.parquet(tdir)
    n_turns = raw.count()
    role_vocab = R._vocab(raw, "role")
    tool_vocab = R._vocab(raw, "tool")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    best = None
    tier_secs: dict[str, float] = {}
    tier_rows: dict[str, int] = {}
    for it in range(-1, args.runs):
        t0 = time.perf_counter()
        turns = R.with_latency(raw.coalesce(args.partitions))
        tiers = R.build_all_tiers(
            turns, persist=True, role_vocab=role_vocab, tool_vocab=tool_vocab
        )
        t_prev = t0
        for name in ("1m", "1h", "1d"):
            noop(tiers[name])
            now = time.perf_counter()
            if it >= 0:
                tier_secs[name] = min(tier_secs.get(name, 1e18), now - t_prev)
            t_prev = now
        dt = time.perf_counter() - t0
        if it == 0:
            for name in ("1m", "1h", "1d"):
                tier_rows[name] = tiers[name].count()
        release_persistent_rdds(spark)
        if it >= 0:
            best = dt if best is None else min(best, dt)

    tier_inputs = {"1m": n_turns, "1h": tier_rows["1m"], "1d": tier_rows["1h"]}
    print(json.dumps({
        "n_conv": args.n_conv,
        "turns": n_turns,
        "tier_chain_best_sec": round(best, 2),
        "pts_per_sec": round(n_turns / best, 1),
        "pts_per_sec_by_tier": {
            n: round(tier_inputs[n] / tier_secs[n], 1) for n in ("1m", "1h", "1d")
        },
        "tier_rows": tier_rows,
        "cpus": args.cpus,
        "shuffle_partitions": args.partitions,
    }))


if __name__ == "__main__":
    main()
