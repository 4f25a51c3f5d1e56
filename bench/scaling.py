#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.md protocol): run the FULL
tier pipeline (raw -> 1m -> 1h -> 1d incl. gap-fill-ready latency plane +
Gorilla/DoD compression) on the SAME synthetic transcripts input at two
parallelism levels (default local[8] vs local[32]), ≥3 runs each, report
median points/sec and scaling efficiency = pps_32 / (4 * pps_8).

Each measurement runs in a FRESH subprocess (own JVM) so parallelism is
honest; the input table is generated once and shared.

Usage: python bench/scaling.py [--n-low 8] [--n-high 32] [--runs 3]
Writes results to BENCH/BASELINE.md (and prints the JSON).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_ONE = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from tsengine.session import get_spark
from tsengine.operators import rollup as R
from tsengine import compress as C

cpus = int(sys.argv[1]); tdir = sys.argv[2]
spark = get_spark(app_name=f"scaling-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=str(max(cpus, 8)))
raw = spark.read.parquet(tdir)
n = raw.count()
spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

t0 = time.perf_counter()
turns = R.with_latency(raw)
tiers = R.build_all_tiers(turns, persist=True)
for name in ("1m", "1h", "1d"):
    tiers[name].write.format("noop").mode("overwrite").save()
series = turns.selectExpr("cast(hash(conv_id) as long) as series_id", "epoch",
                          "coalesce(value, 0.0) as value")
C.compress_series(series).write.format("noop").mode("overwrite").save()
dt = time.perf_counter() - t0
print(json.dumps({{"cpus": cpus, "turns": n, "sec": dt, "pps": n / dt}}))
"""


def run_once(cpus: int, tdir: str) -> dict:
    script = RUN_ONE.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), tdir],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-low", type=int, default=8)
    ap.add_argument("--n-high", type=int, default=32)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--n-conv", type=int, default=1500)
    ap.add_argument("--tdir", default=None)
    args = ap.parse_args()
    if args.tdir is None:
        args.tdir = f"/tmp/tsengine_bench_transcripts_{args.n_conv}"

    if not os.path.exists(os.path.join(args.tdir, "_SUCCESS")):
        sys.path.insert(0, REPO)
        from tsengine.session import get_spark
        from tsengine.synth import transcripts

        spark = get_spark(app_name="scaling-gen", master="local[32]")
        transcripts(spark, n_conv=args.n_conv, base_turns=150, hot_factor=100).write.mode(
            "overwrite"
        ).parquet(args.tdir)
        spark.stop()

    results = {}
    for cpus in (args.n_low, args.n_high):
        runs = [run_once(cpus, args.tdir) for _ in range(args.runs)]
        pps = statistics.median(r["pps"] for r in runs)
        results[cpus] = {
            "runs": [round(r["sec"], 2) for r in runs],
            "median_sec": round(statistics.median(r["sec"] for r in runs), 2),
            "median_pps": round(pps, 1),
            "turns": runs[0]["turns"],
        }

    ratio = args.n_high / args.n_low
    eff = results[args.n_high]["median_pps"] / (ratio * results[args.n_low]["median_pps"])
    summary = {
        "n_low": args.n_low,
        "n_high": args.n_high,
        "cpu_count": os.cpu_count(),
        "results": results,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary, indent=2))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return summary


if __name__ == "__main__":
    main()
