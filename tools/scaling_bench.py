"""Two-parallelism scaling benchmark (sandbox proxy for N vs 4N executors).

Runs the flagship extraction pipeline at local[8] and local[32] on the SAME
input and reports throughput at both plus scaling efficiency
(= speedup / core-ratio). Writes BENCH.md. The north rule requires ≥ 0.8.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from odinson_spark.session import get_spark
import bench

cores = int(sys.argv[1])
sf_dir = sys.argv[2]
spark = get_spark(app_name=f"scaling-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=max(cores, 8))
# warm up the JVM/Python workers so we measure steady-state throughput
bench.run_kg_pipeline(spark, "/root/testdata/sf0.001")
t0 = time.time()
n = bench.run_kg_pipeline(spark, sf_dir)
dt = time.time() - t0
docs = spark.read.parquet(f"{{sf_dir}}/documents.parquet").count()
print(json.dumps({{"cores": cores, "secs": round(dt, 3), "triples": n,
                   "docs": docs, "docs_per_sec": round(docs / dt, 2)}}))
spark.stop()
"""


def run(cores: int, sf_dir: str) -> dict:
    script = RUNNER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), sf_dir],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=1800,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no result from cores={cores}: {out.stderr[-2000:]}")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    low = run(8, sf_dir)
    high = run(32, sf_dir)
    speedup = low["secs"] / high["secs"]
    efficiency = round(speedup / (32 / 8), 4)
    result = {
        "sf_dir": sf_dir,
        "low": low,
        "high": high,
        "speedup_8_to_32": round(speedup, 4),
        "scaling_efficiency": efficiency,
        "target": 0.8,
    }
    print(json.dumps(result, indent=1))
    md = f"""# BENCH — measured throughput and scaling

Flagship job: full KG extraction pipeline (tokenize → prefilter → match →
triple emission → count) over `{sf_dir}/documents.parquet`, identical input
at two parallelism levels (sandbox proxy for N vs 4N executors per
BASELINE.json).

| cores | wall sec | docs/sec | triples |
|---|---|---|---|
| 8  | {low['secs']} | {low['docs_per_sec']} | {low['triples']} |
| 32 | {high['secs']} | {high['docs_per_sec']} | {high['triples']} |

* speedup 8→32 cores: **{speedup:.2f}×** (core ratio 4×)
* scaling efficiency: **{efficiency}** (target ≥ 0.8)

Notes: the extraction path has no shuffle (tokenize/prefilter/match are all
narrow; triples are an explode+project), so scaling is bounded only by
per-core Python worker throughput and input-split granularity
(`spark.sql.files.maxPartitionBytes` sized so ≥ cores splits exist at this
scale factor).
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
