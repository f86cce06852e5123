#!/usr/bin/env python
"""Ad-hoc per-query timing harness for perf iteration: times the named
queries() entries at one or more sf dirs with N trials each, printing
per-trial walls. Usage:

    python scripts/time_queries.py emb_ivf_topk emb_near_pairs \
        [--sf /root/testdata/sf0.01 ...] [--trials 3] [--cores 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", action="append", default=None)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()
    sfs = args.sf or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]

    from kgw_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark(cores=args.cores, shuffle_partitions=args.cores)
    qs = E.queries()
    # warm-up
    qs["kg_statistics"](spark, sfs[0]).write.format("noop").mode(
        "overwrite"
    ).save()
    for sf in sfs:
        for name in args.queries:
            walls = []
            for _ in range(args.trials):
                t0 = time.time()
                qs[name](spark, sf).write.format("noop").mode("overwrite").save()
                walls.append(round(time.time() - t0, 2))
            print(f"{os.path.basename(sf):8s} {name:28s} {walls} best={min(walls)}")


if __name__ == "__main__":
    main()
