#!/usr/bin/env python
"""Scaling-leg instrumentation: run the bench KG pipeline once at
``--cores N`` and dump per-stage executor metrics (runtime, cpu, GC,
python worker time, shuffle waits) plus per-stage task-time quantiles.

Diffing the output between two core counts attributes a scaling-
efficiency loss to a concrete stage and metric (GC? python? shuffle
wait? straggler tail?) instead of guessing. VERDICT r4 "Next round" #1.

Usage: python scripts/scaling_probe.py --cores 8 [--out probe8.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def stage_metrics(spark) -> list[dict]:
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app_id}/stages?status=complete&withSummaries=true"
    with urllib.request.urlopen(url, timeout=20) as r:
        stages = json.loads(r.read())
    out = []
    for s in stages:
        row = {
            "stage": s.get("stageId"),
            "name": (s.get("name") or "")[:80],
            "tasks": s.get("numCompleteTasks"),
            "run_s": round(s.get("executorRunTime", 0) / 1e3, 2),
            "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 2),
            "gc_s": round(s.get("jvmGcTime", 0) / 1e3, 2),
            "deser_s": round(s.get("executorDeserializeTime", 0) / 1e3, 2),
            "deser_cpu_s": round(s.get("executorDeserializeCpuTime", 0) / 1e9, 2),
            "sched_delay_hint": None,
            "shuf_fetch_wait_s": round(s.get("shuffleFetchWaitTime", 0) / 1e3, 2),
            "shuf_write_time_s": round(s.get("shuffleWriteTime", 0) / 1e9, 2),
            "result_ser_s": round(s.get("resultSerializationTime", 0) / 1e3, 2),
            "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
            "output_mb": round(s.get("outputBytes", 0) / 1e6, 1),
            "shuf_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
            "shuf_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
            "submit": s.get("submissionTime"),
            "complete": s.get("completionTime"),
        }
        # task-duration quantiles expose straggler tails
        try:
            turl = (
                f"{base}/api/v1/applications/{app_id}/stages/"
                f"{s['stageId']}/{s.get('attemptId', 0)}/taskSummary"
                "?quantiles=0.0,0.5,0.95,1.0"
            )
            with urllib.request.urlopen(turl, timeout=20) as r:
                ts = json.loads(r.read())
            row["task_dur_quantiles_s"] = [
                round(v / 1e3, 2) for v in ts.get("duration", [])
            ]
            row["task_pyworker_quantiles_s"] = None
        except Exception:
            pass
        out.append(row)
    out.sort(key=lambda r: -(r["run_s"]))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--out", default=None)
    ap.add_argument("--no-pin", action="store_true")
    args = ap.parse_args()

    import bench  # reuse corpus/pipeline/pinning machinery

    spark = bench._fresh_spark(args.cores, with_ui=True, pin=not args.no_pin)
    corpus_path, n_files = bench.ensure_corpus(spark)
    from kgw_spark.sources.corpus import build_alias_dict

    alias_rows = [
        {"alias_id": a, "canonical_id": c, "score": float(s)}
        for a, (c, s) in build_alias_dict(12).items()
    ]
    r = bench.run_kg_pipeline(spark, corpus_path, alias_rows)
    stages = stage_metrics(spark)
    jobs = bench.job_timeline(spark)
    # executor-level GC
    try:
        base = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/executors", timeout=20
        ) as f:
            execs = json.loads(f.read())
        gc_total = sum(e.get("totalGCTime", 0) for e in execs) / 1e3
    except Exception:
        gc_total = None
    report = {
        "cores": args.cores,
        "pinned": not args.no_pin,
        "wall_sec": r["wall_sec"],
        "cpu_sec": r.get("cpu_sec"),
        "decomp": r.get("decomp"),
        "gc_total_s": gc_total,
        "sum_stage_run_s": round(sum(s["run_s"] for s in stages), 1),
        "sum_stage_cpu_s": round(sum(s["cpu_s"] for s in stages), 1),
        "sum_stage_gc_s": round(sum(s["gc_s"] for s in stages), 1),
        "sum_deser_s": round(sum(s["deser_s"] for s in stages), 1),
        "jobs": [
            {
                "id": j["id"],
                "dur": round(j["end"] - j["start"], 2),
                "gap_before": round(j["gap_before"], 2),
                "name": j["name"][:60],
            }
            for j in jobs
        ],
        "stages": stages,
    }
    out = args.out or f"/tmp/probe{args.cores}.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: report[k] for k in (
        "cores", "wall_sec", "cpu_sec", "gc_total_s",
        "sum_stage_run_s", "sum_stage_cpu_s", "sum_stage_gc_s", "sum_deser_s",
    )}))
    print("detail:", out, flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
