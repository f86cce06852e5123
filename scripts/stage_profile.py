#!/usr/bin/env python
"""Profile the KG bench pipeline at one core count: runs it once with
the UI on, then prints every completed stage's wall, task count, and
aggregate executor time — the evidence for where an N-core run fails
to keep N cores busy. Usage:

    python scripts/stage_profile.py [cores] [shuffle_partitions]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

import bench  # noqa: E402


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    shuf = int(sys.argv[2]) if len(sys.argv) > 2 else cores
    legs = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    from kgw_spark.session import get_spark, stop_spark
    from kgw_spark.sources.corpus import build_alias_dict

    def fresh():
        stop_spark()
        s = get_spark(
            cores=cores,
            app_name=f"profile_{cores}",
            shuffle_partitions=shuf,
            extra_conf={
                "spark.ui.enabled": "true",
                "spark.ui.port": "4057",
                "spark.port.maxRetries": "64",
            },
        )
        bench._pin_cpus(s, cores)
        return s

    spark = fresh()
    corpus_path, n_files = bench.ensure_corpus(spark)
    alias_rows = [
        {"alias_id": a, "canonical_id": c, "score": float(s)}
        for a, (c, s) in build_alias_dict(12).items()
    ]
    # warm-up legs: the py4j JVM persists across sessions, so leg 1
    # pays the whole-stage-codegen JIT for everything; profile the LAST
    for _ in range(legs - 1):
        spark = fresh()
        w = bench.run_kg_pipeline(spark, corpus_path, alias_rows)
        print("warm leg wall", w["wall_sec"], "cpu", w.get("cpu_sec"))
    spark = fresh()
    t0 = time.time()
    r = bench.run_kg_pipeline(spark, corpus_path, alias_rows)
    print(json.dumps({k: v for k, v in r.items() if k != "decomp"}))
    print("decomp", r.get("decomp"))

    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/stages?status=complete", timeout=10
    ) as resp:
        stages = json.loads(resp.read())
    stages = [
        s
        for s in stages
        if s.get("submissionTime")
        and bench._parse_ui_ts(s["submissionTime"]) >= t0 - 1
    ]
    stages.sort(key=lambda s: s.get("submissionTime") or "")
    total_exec = 0.0
    print(
        f"{'stage':>5} {'wall':>7} {'tasks':>5} {'execT':>8} {'cpuT':>8} "
        f"{'shufWT':>7} {'gc':>5} {'spillMB':>8} {'par':>5}  name"
    )
    for s in stages:
        sub = bench._parse_ui_ts(s["submissionTime"])
        done = bench._parse_ui_ts(s["completionTime"]) if s.get("completionTime") else sub
        wall = done - sub
        execT = s.get("executorRunTime", 0) / 1000.0
        cpuT = s.get("executorCpuTime", 0) / 1e9
        swt = s.get("shuffleWriteTime", 0) / 1e9
        gc = s.get("jvmGcTime", 0) / 1000.0
        spill = (s.get("memoryBytesSpilled", 0) + s.get("diskBytesSpilled", 0)) / 1e6
        total_exec += execT
        par = execT / wall if wall > 0.05 else float("nan")
        print(
            f"{s['stageId']:>5} {wall:>7.2f} {s.get('numCompleteTasks', 0):>5} "
            f"{execT:>8.1f} {cpuT:>8.1f} {swt:>7.1f} {gc:>5.1f} {spill:>8.1f} "
            f"{par:>5.2f}  {(s.get('name') or '')[:40]}"
        )
    print(
        f"pipeline wall {r['wall_sec']}s  sum(executorRunTime) {total_exec:.1f}s "
        f"-> avg busy cores {total_exec / r['wall_sec']:.2f} of {cores}"
    )


if __name__ == "__main__":
    main()
