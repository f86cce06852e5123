#!/usr/bin/env python
"""Run the KG bench pipeline at one core count and account REAL CPU
seconds consumed by the whole worker tree (JVM + python workers),
from /proc/<pid>/stat utime+stime (+ dead-children via cutime/cstime
of the gateway). Separates hypervisor steal (wall up, CPU-s flat)
from genuine work inflation (CPU-s up). Usage:

    python scripts/cpu_account.py [cores] [shuffle_partitions]
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

import bench  # noqa: E402

HZ = os.sysconf("SC_CLK_TCK")


def _tree_cpu(root_pid: int) -> float:
    """utime+stime+cutime+cstime (reaped children) over the live
    process tree rooted at root_pid, in seconds."""
    total = 0.0
    pids = [root_pid]
    seen = set()
    while pids:
        pid = pids.pop()
        if pid in seen:
            continue
        seen.add(pid)
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            # fields after comm: state ppid ... utime(11) stime(12)
            # cutime(13) cstime(14) [0-indexed post-comm]
            total += (
                int(parts[11]) + int(parts[12]) + int(parts[13]) + int(parts[14])
            ) / HZ
            with open(f"/proc/{pid}/task/{pid}/children") as f:
                pids.extend(int(c) for c in f.read().split())
        except Exception:
            continue
        try:
            for tid in os.listdir(f"/proc/{pid}/task"):
                with open(f"/proc/{pid}/task/{tid}/children") as f:
                    pids.extend(int(c) for c in f.read().split())
        except Exception:
            pass
    return total


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    shuf = int(sys.argv[2]) if len(sys.argv) > 2 else cores
    from kgw_spark.session import get_spark, stop_spark
    from kgw_spark.sources.corpus import build_alias_dict

    stop_spark()
    spark = get_spark(cores=cores, app_name=f"acct_{cores}", shuffle_partitions=shuf)
    bench._pin_cpus(spark, cores)
    jvm_pid = spark.sparkContext._gateway.proc.pid
    corpus_path, _ = bench.ensure_corpus(spark)
    alias_rows = [
        {"alias_id": a, "canonical_id": c, "score": float(s)}
        for a, (c, s) in build_alias_dict(12).items()
    ]
    def _self_cpu() -> float:
        with open(f"/proc/{os.getpid()}/stat") as f:
            parts = f.read().rsplit(")", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / HZ

    # JVM tree covers the python workers (daemon.py forks under the
    # JVM); the driver is counted separately WITHOUT children so the
    # JVM subtree isn't double-counted
    c0 = _tree_cpu(jvm_pid) + _self_cpu()
    r = bench.run_kg_pipeline(spark, corpus_path, alias_rows)
    c1 = _tree_cpu(jvm_pid) + _self_cpu()
    cpu = c1 - c0
    print(
        f"cores={cores} shuf={shuf} wall={r['wall_sec']}s "
        f"cpu_consumed={cpu:.1f}s avg_busy={cpu / r['wall_sec']:.2f} "
        f"tps={r['triples_per_sec']}"
    )


if __name__ == "__main__":
    main()
