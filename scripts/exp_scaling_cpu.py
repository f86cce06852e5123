"""Controlled experiment: does decoupling partitioning from lane count
equalize consumed CPU between the 2-lane and 8-lane legs of the KG
pipeline?  (round-5 scaling-efficiency investigation)

Variants:
  cur   — status quo: shuffle.partitions = cores, scan splits sized by
          bytesPerCore (i.e. both scale with the lane count)
  fixed — byte-driven: shuffle.partitions = 8 at every size,
          files.minPartitionNum=1 (+ fixed maxPartitionBytes/openCost)
          so the scan split plan is identical at every size

Each (variant, size) runs N interleaved trials, CPU-pinned, workers
pre-warmed; reports wall, JVM-tree consumed CPU, and per-stage
executorCpuTime from the UI REST API for attribution.
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_SKIP_QUERIES", "1")

import bench  # noqa: E402  (constants + helpers; main() is guarded)
from kgw_spark.session import get_spark, stop_spark  # noqa: E402


def stage_cpu(spark):
    try:
        base = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        url = f"{base}/api/v1/applications/{app_id}/stages?status=complete"
        with urllib.request.urlopen(url, timeout=10) as r:
            stages = json.loads(r.read())
        out = []
        for s in stages:
            out.append(
                {
                    "stage": s.get("stageId"),
                    "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 1),
                    "run_s": round(s.get("executorRunTime", 0) / 1e3, 1),
                    "tasks": s.get("numCompleteTasks"),
                    "in_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                    "sw_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                    "sr_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                    "name": (s.get("name") or "")[:40],
                }
            )
        out.sort(key=lambda s: -s["cpu_s"])
        return out
    except Exception as e:
        return [{"err": str(e)}]


def gc_time(spark):
    try:
        base = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        url = f"{base}/api/v1/applications/{app_id}/executors"
        with urllib.request.urlopen(url, timeout=10) as r:
            ex = json.loads(r.read())
        return round(sum(e.get("totalGCTime", 0) for e in ex) / 1e3, 1)
    except Exception:
        return None


def fresh(cores, variant):
    stop_spark()
    extra = {
        "spark.ui.enabled": "true",
        "spark.ui.port": "4056",
        "spark.port.maxRetries": "64",
    }
    sp = cores
    if variant == "fixed":
        # exactly what bench now runs: the engine's byte-driven policy
        from kgw_spark.plans.partitioning import byte_driven_conf, dir_bytes

        pol = byte_driven_conf(
            dir_bytes(os.environ.get("EXP_CORPUS", bench.CORPUS_CACHE + "_150x200x600m1"))
        )
        sp = int(pol.pop("spark.sql.shuffle.partitions"))
        extra.update(pol)
    elif variant == "fixed2":
        # finer, still byte-driven: ~64 scan tasks (1/file) and ~38
        # reduce partitions -> keeps a 32-lane session busy too
        sp = 38
        extra.update(
            {
                "spark.sql.files.minPartitionNum": "1",
                "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
                "spark.sql.files.openCostInBytes": str(2 * 1024 * 1024),
                "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(
                    4 * 1024 * 1024
                ),
            }
        )
    spark = get_spark(
        cores=cores,
        app_name=f"exp_{variant}_{cores}",
        shuffle_partitions=sp,
        extra_conf=extra,
    )
    bench._pin_cpus(spark, cores)
    return spark


def main():
    from kgw_spark.sources.corpus import build_alias_dict

    alias_rows = [
        {"alias_id": a, "canonical_id": c, "score": float(s)}
        for a, (c, s) in build_alias_dict(12).items()
    ]
    spark = fresh(8, "cur")
    corpus_path, _ = bench.ensure_corpus(spark)

    trials = int(os.environ.get("EXP_TRIALS", "2"))
    variants = os.environ.get("EXP_VARIANTS", "cur,fixed").split(",")
    sizes = [int(x) for x in os.environ.get("EXP_SIZES", "2,8").split(",")]
    res = {}
    for t in range(trials):
        for variant in variants:
            for cores in sizes:
                spark = fresh(cores, variant)
                bench._warm_python_workers(spark, cores)
                r = bench.run_kg_pipeline(spark, corpus_path, alias_rows)
                key = f"{variant}[{cores}]"
                res.setdefault(key, []).append(
                    {
                        "wall": r["wall_sec"],
                        "cpu": r.get("cpu_sec"),
                        "decomp": r.get("decomp"),
                    }
                )
                d = r.get("decomp") or {}
                st = stage_cpu(spark)
                jvm_cpu = sum(s.get("cpu_s", 0) for s in st)
                top = " ".join(
                    f"s{s['stage']}={s['cpu_s']}" for s in st[:4] if s.get("cpu_s")
                )
                print(
                    f"== {key} trial {t}: wall={r['wall_sec']} cpu={r.get('cpu_sec')} "
                    f"jvm_stage_cpu={round(jvm_cpu, 1)} [{top}] "
                    f"serial={d.get('serial_sec')} gc={gc_time(spark)} "
                    f"load={round(os.getloadavg()[0], 1)}",
                    flush=True,
                )
    print("SUMMARY")
    for k, v in res.items():
        walls = [x["wall"] for x in v]
        cpus = [x["cpu"] for x in v]
        print(k, "walls", walls, "cpus", cpus, flush=True)
    # efficiency per variant using min wall / min cpu
    for variant in variants:
        try:
            w2 = min(x["wall"] for x in res[f"{variant}[2]"])
            w8 = min(x["wall"] for x in res[f"{variant}[8]"])
            c2 = min(x["cpu"] for x in res[f"{variant}[2]"])
            c8 = min(x["cpu"] for x in res[f"{variant}[8]"])
            print(
                f"{variant}: eff(best)={round(w2 / (4 * w8), 3)} "
                f"cpu_inflation={round(c8 / c2, 3)}",
                flush=True,
            )
        except Exception:
            pass


if __name__ == "__main__":
    main()
