#!/usr/bin/env python
"""Multi-executor scaling evidence (BASELINE.md protocol step 2): the tier
pipeline submitted with ``spark-submit --py-files tsengine.zip`` on
``local-cluster[N,1,m]`` vs ``local-cluster[4N,1,m]`` — REAL executor JVM
processes with the package shipped the way a production cluster ships it,
not local[N] thread pools.

Protocol:
- one shared transcripts table (seed-deterministic), generated once;
- each level runs the identical job (with_latency -> build_all_tiers ->
  noop sink + Gorilla compress) best-of-R;
- the process tree is taskset-pinned to (executors + 2 service) cores so an
  N-executor run cannot borrow the idle host cores for GC/JIT/shuffle
  threads (the "local[N] is not an N-core box" substrate effect measured in
  BENCH/BASELINE.md);
- efficiency(N->4N) = pps_4N / (4 * pps_N); writes BENCH/scaling_cluster.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = r"""
import json, sys, time
# NO repo path insert: tsengine must resolve from the --py-files zip, on the
# driver and inside every executor's Python worker
from pyspark.sql import SparkSession
from tsengine.operators import rollup as R
from tsengine import compress as C

tdir = sys.argv[1]
spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
raw = spark.read.parquet(tdir)
n = raw.count()
rv = R._vocab(raw, "role"); tv = R._vocab(raw, "tool")
spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM/codegen warmup

t0 = time.perf_counter()
turns = R.with_latency(raw)
tiers = R.build_all_tiers(turns, persist=True, role_vocab=rv, tool_vocab=tv)
tiers["1m"].unionByName(tiers["1h"]).unionByName(tiers["1d"]) \
    .write.format("noop").mode("overwrite").save()
series = turns.selectExpr("conv_id as series_id", "epoch",
                          "coalesce(value, 0.0) as value")
C.compress_series(series).write.format("noop").mode("overwrite").save()
dt = time.perf_counter() - t0
print(json.dumps({"execs": spark.sparkContext.defaultParallelism,
                  "turns": n, "sec": dt, "pps": n / dt}))
spark.stop()
"""


def build_zip(path: str) -> str:
    pkg = os.path.join(REPO, "tsengine")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return path


def spark_submit_bin() -> str:
    import pyspark

    return os.path.join(pyspark.__path__[0], "bin", "spark-submit")


def run_level(n_exec: int, zip_path: str, job_path: str, tdir: str) -> dict:
    service_cores = 2  # driver + standalone master/worker daemons
    pin = list(range(min(n_exec + service_cores, os.cpu_count())))
    cmd = [
        "taskset", "-c", ",".join(map(str, pin)),
        spark_submit_bin(),
        "--master", f"local-cluster[{n_exec},1,2048]",
        "--py-files", zip_path,
        "--conf", "spark.executor.memory=1536m",
        "--conf", "spark.driver.memory=3g",
        "--conf", f"spark.sql.shuffle.partitions={max(2 * n_exec, 8)}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf", "spark.ui.enabled=false",
        job_path, tdir,
    ]
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip, not the repo, must provide tsengine
    out = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=1200)
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from level {n_exec}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    os.environ.setdefault("TSENGINE_TMPFS_SHUFFLE", "1")
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="2,8", help="executor counts (N,4N)")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--n-conv", type=int, default=9000)
    ap.add_argument("--tdir", default=None)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    tdir = args.tdir or f"/tmp/tsengine_bench_transcripts_{args.n_conv}"

    if not os.path.exists(os.path.join(tdir, "_SUCCESS")):
        sys.path.insert(0, REPO)
        from tsengine.session import get_spark
        from tsengine.synth import write_transcripts

        spark = get_spark(app_name="cluster-scaling-gen", master="local[16]")
        write_transcripts(spark, tdir, n_conv=args.n_conv, base_turns=60, hot_factor=40)
        spark.stop()

    zip_path = build_zip("/tmp/tsengine_pyfiles.zip")
    job_path = "/tmp/tsengine_cluster_job.py"
    with open(job_path, "w") as f:
        f.write(JOB)

    results = {}
    for n in levels:
        runs = [run_level(n, zip_path, job_path, tdir) for _ in range(args.runs)]
        best = max(runs, key=lambda r: r["pps"])
        results[n] = {"best_pps": round(best["pps"], 1),
                      "best_sec": round(best["sec"], 2),
                      "turns": best["turns"],
                      "all_pps": [round(r["pps"], 1) for r in runs]}
        print(f"executors={n}: best {best['pps']:,.0f} pts/s over {args.runs} runs",
              file=sys.stderr)

    pairs = {}
    for lo in levels:
        hi = lo * 4
        if hi in results:
            pairs[f"{lo}->{hi}"] = round(
                results[hi]["best_pps"] / (4 * results[lo]["best_pps"]), 3
            )
    primary = sorted(pairs)[-1] if pairs else None
    summary = {
        "protocol": (
            "spark-submit --py-files tsengine.zip, master=local-cluster[N,1,2048] "
            "(real executor JVMs, 1 core each), taskset-pinned to N+2 cores, "
            f"best-of-{args.runs}"
        ),
        "levels": levels,
        "results": {str(k): v for k, v in results.items()},
        "scaling_efficiency": pairs,
        "target": 0.8,
        "pair_pass": {k: v >= 0.8 for k, v in pairs.items()},
        "primary_pair": primary,
        "pass": bool(primary) and pairs[primary] >= 0.8,
    }
    print(json.dumps(summary, indent=2))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_cluster.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
