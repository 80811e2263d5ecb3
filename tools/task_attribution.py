"""Per-component attribution of local[N] scaling loss from Spark task
metrics (round-3 verdict: 'decompose the local[N] gap into scheduler vs
Arrow vs Python-worker components' — measured, not argued).

Runs the flagship KG extraction at local[N] with the UI REST API enabled,
then reads the completed stages' aggregate task metrics and decomposes the
N-slot time budget (wall × N) into:

  cpu        executorCpuTime — actual JVM compute
  gc         jvmGcTime
  wait       executorRunTime − cpuTime − gc: the task held its slot but the
             JVM thread wasn't on-CPU — dominated by waiting on the Python
             worker/Arrow pipe in this job (the stage is one mapInPandas)
  overhead   deserialize + result serialization
  idle       wall×N − Σ task time: no task occupied the slot — scheduler
             gaps, straggler tails, driver-side planning

Usage: python tools/task_attribution.py [cores ...]   (default: 8 32)
Prints one JSON object per core count plus a comparison line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_once(cores: int, sf_dir: str, replicate: int) -> dict:
    from odinson_spark.session import get_spark
    import bench

    spark = get_spark(
        app_name=f"attr-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
        extra_conf={"spark.ui.enabled": "true"},
    )
    try:
        bench.run_kg_pipeline(spark, sf_dir, 1)  # warm JVM + workers
        t0 = time.time()
        triples = bench.run_kg_pipeline(spark, sf_dir, replicate)
        wall = time.time() - t0
        ui = spark.sparkContext.uiWebUrl
        base = f"{ui}/api/v1"
        app = json.load(urllib.request.urlopen(f"{base}/applications"))[0]["id"]
        stages = json.load(
            urllib.request.urlopen(f"{base}/applications/{app}/stages?status=COMPLETE")
        )
        # only stages of the timed run (completed after t0, epoch ms)
        t0_ms = t0 * 1000.0

        def ms(iso: str) -> float:
            # "2026-08-17T05:55:00.123GMT"
            from datetime import datetime, timezone

            return (
                datetime.strptime(iso[:-3], "%Y-%m-%dT%H:%M:%S.%f")
                .replace(tzinfo=timezone.utc)
                .timestamp()
                * 1000.0
            )

        run_ms = cpu_ms = gc_ms = deser_ms = ser_ms = 0.0
        n_tasks = 0
        for st in stages:
            if "completionTime" not in st or ms(st["completionTime"]) < t0_ms:
                continue
            run_ms += st.get("executorRunTime", 0)
            cpu_ms += st.get("executorCpuTime", 0) / 1e6  # ns → ms
            gc_ms += st.get("jvmGcTime", 0)
            deser_ms += st.get("executorDeserializeTime", 0)
            ser_ms += st.get("resultSerializationTime", 0)
            n_tasks += st.get("numCompleteTasks", st.get("numTasks", 0))
        slot_ms = wall * 1000.0 * cores
        wait_ms = max(run_ms - cpu_ms - gc_ms, 0.0)
        idle_ms = max(slot_ms - run_ms - deser_ms - ser_ms, 0.0)
        return {
            "cores": cores,
            "wall_sec": round(wall, 3),
            "triples": triples,
            "n_tasks": n_tasks,
            "slot_sec": round(slot_ms / 1000, 1),
            "cpu_sec": round(cpu_ms / 1000, 1),
            "gc_sec": round(gc_ms / 1000, 1),
            "wait_sec": round(wait_ms / 1000, 1),
            "overhead_sec": round((deser_ms + ser_ms) / 1000, 1),
            "idle_sec": round(idle_ms / 1000, 1),
            "pct": {
                "cpu": round(100 * cpu_ms / slot_ms, 1),
                "gc": round(100 * gc_ms / slot_ms, 1),
                "wait": round(100 * wait_ms / slot_ms, 1),
                "overhead": round(100 * (deser_ms + ser_ms) / slot_ms, 1),
                "idle": round(100 * idle_ms / slot_ms, 1),
            },
        }
    finally:
        spark.stop()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicate = int(os.environ.get("ATTR_REPLICATE", "8"))
    cores_list = [int(c) for c in (sys.argv[1:] or ["8", "32"])]
    results = [run_once(c, sf_dir, replicate) for c in cores_list]
    for r in results:
        print(json.dumps(r))
    if len(results) >= 2:
        lo, hi = results[0], results[-1]
        # how much of the lost efficiency each component explains: the
        # per-doc cpu should be constant; everything that grows is overhead
        print(
            json.dumps(
                {
                    "comparison": f"{lo['cores']}->{hi['cores']}",
                    "cpu_growth_x": round(hi["cpu_sec"] / max(lo["cpu_sec"], 1e-9), 3),
                    "wait_pct_lo_hi": [lo["pct"]["wait"], hi["pct"]["wait"]],
                    "idle_pct_lo_hi": [lo["pct"]["idle"], hi["pct"]["idle"]],
                    "gc_pct_lo_hi": [lo["pct"]["gc"], hi["pct"]["gc"]],
                }
            )
        )


if __name__ == "__main__":
    main()
