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

Usage: python tools/executor_scaling_bench.py [sf_dir] [points] [replicate]
  points = comma-separated executor counts (default "2,8,32"); efficiency
  is reported for each consecutive pair. Example: "8,32" for the 4× pair.

CPU pinning (PIN_CORES=1, default): each executor process — its JVM, its
GC/scan threads AND its Python workers — is confined to ONE distinct core
via ``taskset -c``. Without pinning this VM's scheduler spreads a local[1]
JVM's helper threads over idle cores (so low-K runs borrow capacity and
deflate measured efficiency) and conversely schedules K independent
JVM+worker pairs very unevenly (round-3 measured 31-52 s spread for
identical work). Pinning removes both artifacts: every executor owns the
same 1-core budget at every K, which is exactly the per-executor shape of
a real cluster.
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
extra = {{}}
if os.environ.get("PRETOUCH", "1") == "1":  # default ON (SCALE.md: pre-touched fixed heaps)
    # fixed, pre-faulted JVM heap: every heap page is touched at JVM start,
    # so the timed section pays ZERO heap-growth page faults — isolates the
    # host's (serialized, slow) first-touch fault path from pipeline cost
    extra = {{"spark.driver.memory": "1g",
              "spark.driver.extraJavaOptions": "-XX:+AlwaysPreTouch -XX:InitialHeapSize=1g"}}
spark = get_spark(app_name=f"exec-{{idx}}", master="local[1]",
                  shuffle_partitions=2, extra_conf=extra)
# warm: JVM, python workers, code paths
bench.run_kg_pipeline(spark, sf_dir, 1)
# barrier: announce ready, wait for GO (written when all procs are ready)
open(os.path.join(barrier_dir, f"ready_{{idx}}"), "w").close()
while not os.path.exists(os.path.join(barrier_dir, "GO")):
    time.sleep(0.05)
def faults():
    # minor faults of this proc + its whole tree (JVM + pyspark daemon +
    # workers): /proc/<pid>/stat fields ppid=4, minflt=10 (1-based)
    stats = {{}}
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{{p}}/stat") as f:
                parts = f.read().rsplit(") ", 1)[1].split()
            stats[int(p)] = (int(parts[1]), int(parts[7]))  # (ppid, minflt)
        except Exception:
            pass
    tree = {{os.getpid()}}
    grew = True
    while grew:
        grew = False
        for pid, (ppid, _) in stats.items():
            if ppid in tree and pid not in tree:
                tree.add(pid); grew = True
    return sum(mf for pid, (pp, mf) in stats.items() if pid in tree)
f0 = faults()
t0 = time.time()
n = bench.run_kg_pipeline(spark, sf_dir, replicate)
dt = time.time() - t0
docs = spark.read.parquet(f"{{sf_dir}}/documents.parquet").count() * replicate
print(json.dumps({{"idx": idx, "secs": round(dt, 3), "docs": docs,
                   "triples": n, "minor_faults": faults() - f0}}))
spark.stop()
"""


def run_pass(n_procs: int, sf_dir: str, replicate: int) -> dict:
    script = RUNNER.format(repo=REPO)
    pin = os.environ.get("PIN_CORES", "1") == "1"
    with tempfile.TemporaryDirectory() as barrier:
        procs = [
            subprocess.Popen(
                (["taskset", "-c", str(i)] if pin else [])
                + [sys.executable, "-c", script, str(i), barrier, sf_dir,
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
    mf = sorted(r.get("minor_faults", 0) for r in results)
    return {
        "executors": n_procs,
        "wall_secs": wall,
        "per_exec_secs": sorted(r["secs"] for r in results),
        "total_docs": total_docs,
        "docs_per_sec": round(total_docs / wall, 2),
        "triples_per_exec": results[0]["triples"],
        "minor_faults_per_exec_median": mf[len(mf) // 2],
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    points = (
        [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2 else [2, 8, 32]
    )
    replicate = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    rounds = int(os.environ.get("SCALING_ROUNDS", "2"))
    best = {}
    for _ in range(rounds):  # interleaved rounds, best-of per point
        for n in points:
            r = run_pass(n, sf_dir, replicate)
            if n not in best or r["docs_per_sec"] > best[n]["docs_per_sec"]:
                best[n] = r
    pairs = {}
    for lo_n, hi_n in zip(points, points[1:]):
        lo, hi = best[lo_n], best[hi_n]
        ratio = hi_n / lo_n
        pairs[f"{lo_n}->{hi_n}"] = round(
            hi["docs_per_sec"] / lo["docs_per_sec"] / ratio, 4
        )
    out = {
        "sf_dir": sf_dir,
        "mode": "independent local[1] Spark processes (one per executor), "
        + ("1 core each via taskset" if os.environ.get("PIN_CORES", "1") == "1"
           else "unpinned"),
        "runs": [best[n] for n in points],
        "throughput_scaling_efficiency": pairs,
        "target": 0.8,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
