#!/usr/bin/env python
"""Capture clean paired 2-core/8-core KG-pipeline measurements in calm
host windows. The sandbox is a Firecracker guest with no steal
accounting: host contention silently inflates wall AND utime, so the
only trustworthy measurement is one taken while a calibrated
single-core burn runs at its idle-host speed immediately before and
after each leg. Loops until ``--pairs`` clean pairs are captured or
``--max-min`` minutes elapse. Appends JSON lines to ``--out``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

import bench  # noqa: E402

BURN_ITERS = 20_000_000


def burn_wall() -> float:
    t0 = time.time()
    x = 0
    for i in range(BURN_ITERS):
        x += i & 7
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=2)
    ap.add_argument("--max-min", type=float, default=90)
    ap.add_argument("--calm", type=float, default=2.45, help="burn wall (s) ceiling")
    ap.add_argument("--out", default="/tmp/calm_pairs.jsonl")
    args = ap.parse_args()

    from kgw_spark.sources.corpus import build_alias_dict

    alias_rows = [
        {"alias_id": a, "canonical_id": c, "score": float(s)}
        for a, (c, s) in build_alias_dict(12).items()
    ]
    spark = bench._fresh_spark(8)
    corpus_path, _ = bench.ensure_corpus(spark)

    deadline = time.time() + args.max_min * 60
    got = 0
    while got < args.pairs and time.time() < deadline:
        b0 = burn_wall()
        if b0 > args.calm:
            print(f"stormy (burn {b0:.2f}s), waiting...", flush=True)
            time.sleep(45)
            continue
        rec = {"burn_pre": round(b0, 2), "t": time.strftime("%H:%M:%S")}
        clean = True
        for cores in (8, 2):
            s = bench._fresh_spark(cores, with_ui=True)
            r = bench.run_kg_pipeline(s, corpus_path, alias_rows)
            bmid = burn_wall()
            rec[f"wall_{cores}"] = r["wall_sec"]
            rec[f"decomp_{cores}"] = r.get("decomp")
            rec[f"burn_after_{cores}"] = round(bmid, 2)
            if bmid > args.calm:
                clean = False
                print(
                    f"leg {cores} ended stormy (burn {bmid:.2f}s): "
                    f"wall={r['wall_sec']}", flush=True,
                )
                break
        if clean:
            rec["eff"] = round(rec["wall_2"] / rec["wall_8"] / 4.0, 3)
            got += 1
            print("CLEAN PAIR:", json.dumps(rec), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
    print(f"done: {got} clean pairs", flush=True)


if __name__ == "__main__":
    main()
