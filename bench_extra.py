#!/usr/bin/env python
"""Per-query isolation harness for the optimization rounds (guide §1).

NOT part of the frozen measurement contract (bench.py): this script
exists so individual queries can be timed with the noop sink, re-run
with more trials, and have their ``explain("formatted")`` plans dumped
to ``plans/r06/`` for the judge's plan-shape evidence.

Usage:
  python bench_extra.py q1 q2 ...          # time the named queries
  python bench_extra.py --all              # time every headline query
  python bench_extra.py --explain q1 ...   # also dump plans/r06/<q>_<tag>.txt
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python bench_extra.py q1

Session setup mirrors bench.py's query-suite session (local[CPUS],
shuffle_partitions=CPUS) so the numbers are comparable with the frozen
bench's per-query seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TRIALS = int(os.environ.get("SPARK_GRAFT_QUERY_TRIALS", "3"))
PLAN_TAG = os.environ.get("SPARK_GRAFT_PLAN_TAG", "after")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_all = "--all" in sys.argv
    do_explain = "--explain" in sys.argv
    import __spark_entry__ as E
    from kgw_spark.session import get_spark

    spark = get_spark(cores=CPUS, app_name="bench_extra", shuffle_partitions=CPUS)
    qs = E.queries()
    names = [q for q in qs if q != "kg_pipeline_triples"] if do_all else args
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}; known: {sorted(qs)}")

    # same warm-up discipline as bench.run_queries
    qs["kg_statistics"](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    if do_explain:
        os.makedirs(os.path.join(_REPO, "plans", "r06"), exist_ok=True)
        for name in names:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(_REPO, "plans", "r06", f"{name}_{PLAN_TAG}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path}", file=sys.stderr)

    trials: dict[str, list[float]] = {n: [] for n in names}
    for _t in range(TRIALS):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            trials[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    best = {n: min(ts) for n, ts in trials.items()}
    print(json.dumps({"sf": SF_DIR, "cpus": CPUS, "best": best, "trials": trials}))
    os._exit(0)


if __name__ == "__main__":
    main()
