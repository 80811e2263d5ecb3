"""End-to-end pipeline driver (tools/run_pipeline.py): repos → sentences →
mentions → triples → nodes/edges → metrics, checkpointed, resumable."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

RULES = """
rules:
  - name: call-args
    label: CallArg
    type: event
    priority: 1
    pattern: |
      trigger = [entity=CALL]
      subject = <next []
      object = >arg [tag=IDENT]
"""


@pytest.mark.slow
def test_run_pipeline_end_to_end(tmp_path, spark):
    rows = []
    for i in range(20):
        content = (
            f"def func{i}():\n"
            f"    total{i} = compute{i}(alpha{i}, beta{i})\n"
            f"    print(total{i})\n"
        )
        rows.append((f"acme/repo{i % 3}", f"src/f{i}.py", "c" * 40, "python", content))
    spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    ).write.parquet(str(tmp_path / "repos"))
    rules = tmp_path / "rules.yml"
    rules.write_text(RULES)
    out_dir = tmp_path / "warehouse"
    cmd = [
        sys.executable,
        str(REPO / "tools" / "run_pipeline.py"),
        "--input", str(tmp_path / "repos"),
        "--rules", str(rules),
        "--output", str(out_dir),
        "--mode", "code",
        "--run-id", "t1",
        "--salt-partitions", "4",
    ]
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, env=env, timeout=500)
    assert r.returncode == 0, r.stderr[-2000:]
    import duckdb

    counts = {
        t: duckdb.sql(f"SELECT count(*) FROM '{out_dir}/{t}/*.parquet'").fetchone()[0]
        for t in ("sentences", "mentions", "triples", "nodes", "edges", "metrics")
    }
    assert counts["sentences"] == 60          # 3 lines per file
    assert counts["triples"] == 40            # 2 (subj,obj) args per call site
    assert counts["nodes"] > 0 and counts["edges"] == 40
    # second run resumes: every stage skipped
    r2 = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, env=env, timeout=500)
    assert r2.returncode == 0
    metrics = json.loads((out_dir / "_metrics_t1.json").read_text())
    assert all(m["skipped"] for m in metrics)
