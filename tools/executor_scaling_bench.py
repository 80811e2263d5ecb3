"""N vs 4N EXECUTOR scaling bench — independent Spark processes.

`local[N]` inside one JVM is a poor proxy for executor-count scaling: it
bounds concurrent *task slots*, not threads, so at low N the JVM scan/Arrow
feeder threads and the Python workers spread over MORE physical cores than
the nominal count (a local[2] run really consumes ~3-4 cores), deflating
the measured N→4N efficiency below what a real cluster would see.

This bench models executors faithfully: K INDEPENDENT Spark processes,
each `local[1]` with its own JVM and Python workers (exactly one executor's
shape), all processing the same fixed per-executor workload (weak scaling,
matching the north rule's throughput criterion). A file barrier synchronizes
the timed section so all K contend realistically. Efficiency =
throughput(4K) / (4 × throughput(K)).

Usage: python tools/executor_scaling_bench.py [sf_dir] [K] [replicate]
  (runs K and 4K; defaults sf0.1, K=2, replicate=8)

Caveat observed on this sandbox: the VM's hypervisor schedules 8 fully
independent JVM+PythonWorker pairs very unevenly (identical per-executor
work measured 31-52 s across executors in one pass), so on THIS host the
in-JVM local[N] bench plus the Spark-free workload ceiling
(tools/scaling_bench.py) is the more signal-bearing proxy. On real
separate-host executors neither artifact exists.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import glob, json, os, sys, time
sys.path.insert(0, {repo!r})
from odinson_spark.session import get_spark
import bench

idx = int(sys.argv[1]); barrier_dir = sys.argv[2]
sf_dir = sys.argv[3]; replicate = int(sys.argv[4]); n_procs = int(sys.argv[5])
spark = get_spark(app_name=f"exec-{{idx}}", master="local[1]",
                  shuffle_partitions=2)
# warm: JVM, python workers, code paths
bench.run_kg_pipeline(spark, sf_dir, 1)
# barrier: announce ready, wait for GO (written when all procs are ready)
open(os.path.join(barrier_dir, f"ready_{{idx}}"), "w").close()
while not os.path.exists(os.path.join(barrier_dir, "GO")):
    time.sleep(0.05)
t0 = time.time()
n = bench.run_kg_pipeline(spark, sf_dir, replicate)
dt = time.time() - t0
docs = spark.read.parquet(f"{{sf_dir}}/documents.parquet").count() * replicate
print(json.dumps({{"idx": idx, "secs": round(dt, 3), "docs": docs,
                   "triples": n}}))
spark.stop()
"""


def run_pass(n_procs: int, sf_dir: str, replicate: int) -> dict:
    script = RUNNER.format(repo=REPO)
    with tempfile.TemporaryDirectory() as barrier:
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", script, str(i), barrier, sf_dir,
                 str(replicate), str(n_procs)],
                stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL,
                text=True,
                cwd=REPO,
            )
            for i in range(n_procs)
        ]
        deadline = time.time() + 600
        while time.time() < deadline:
            ready = len([f for f in os.listdir(barrier) if f.startswith("ready_")])
            if ready == n_procs:
                break
            if any(p.poll() is not None for p in procs):
                raise RuntimeError("an executor process died before the barrier")
            time.sleep(0.2)
        open(os.path.join(barrier, "GO"), "w").close()
        results = []
        for p in procs:
            out, _ = p.communicate(timeout=900)
            for line in reversed(out.strip().splitlines()):
                if line.startswith("{"):
                    results.append(json.loads(line))
                    break
    if len(results) != n_procs:
        raise RuntimeError(f"expected {n_procs} results, got {len(results)}")
    total_docs = sum(r["docs"] for r in results)
    wall = max(r["secs"] for r in results)
    return {
        "executors": n_procs,
        "wall_secs": wall,
        "per_exec_secs": sorted(r["secs"] for r in results),
        "total_docs": total_docs,
        "docs_per_sec": round(total_docs / wall, 2),
        "triples_per_exec": results[0]["triples"],
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    replicate = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    rounds = int(os.environ.get("SCALING_ROUNDS", "2"))
    best = {}
    for _ in range(rounds):  # interleaved rounds, best-of per point
        for n in (k, 4 * k):
            r = run_pass(n, sf_dir, replicate)
            if n not in best or r["docs_per_sec"] > best[n]["docs_per_sec"]:
                best[n] = r
    lo, hi = best[k], best[4 * k]
    eff = round(hi["docs_per_sec"] / lo["docs_per_sec"] / 4, 4)
    out = {
        "sf_dir": sf_dir,
        "mode": "independent local[1] Spark processes (one per executor)",
        "runs": [lo, hi],
        "pair": f"{k}->{4 * k} executors",
        "throughput_scaling_efficiency": eff,
        "target": 0.8,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
