#!/usr/bin/env python
"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the KG-construction
pipeline (the north-rule metric: triples/sec end-to-end) and — unless
SPARK_GRAFT_SKIP_SCALING=1 — the same KG job at local[N/4] vs local[N] for
the scaling-efficiency evidence (sandbox stand-in for N vs 4N executors).

Prints ONE JSON line:
  {"metric": "triples_per_sec_end_to_end", "value": ..., "unit": "triples/sec",
   "queries": {...per-query seconds...}, "sf": ...,
   "kg": {...}, "scaling": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
# python workers (separate processes in local mode) import kgw_spark via env
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SKIP_SCALING = os.environ.get("SPARK_GRAFT_SKIP_SCALING", "") == "1"

# headline queries: every oracled operator except the full KG pipeline,
# which is benched separately as the north-rule throughput metric
# (emb_near_pairs is included now that its certified path is the
# LSH-bucketed join, not the quadratic oracle cross-join).
def _headline():
    import __spark_entry__ as E

    return [q for q in E.queries() if q != "kg_pipeline_triples"]

# KG pipeline corpus size for the throughput metric (big enough that
# local[8] takes >60s; pure function of these numbers + seed)
KG_REPOS = int(os.environ.get("SPARK_GRAFT_KG_REPOS", "150"))
KG_FILES = int(os.environ.get("SPARK_GRAFT_KG_FILES", "200"))
KG_CALL_LINES = int(os.environ.get("SPARK_GRAFT_KG_CALL_LINES", "600"))
KG_FUNCS = 400
# all bench scratch on tmpfs: the sandbox disk has high IO-wait variance
_SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
CORPUS_CACHE = os.environ.get(
    "SPARK_GRAFT_CORPUS_CACHE", f"{_SCRATCH}/kgw_bench_corpus"
)


def _fresh_spark(cores: int):
    from kgw_spark.session import get_spark, stop_spark

    stop_spark()
    return get_spark(
        cores=cores, app_name=f"kgw_bench_{cores}", shuffle_partitions=cores
    )


def run_queries(spark) -> dict[str, float]:
    import __spark_entry__ as E

    qs = E.queries()
    # warm-up: session/parquet-footer/codegen startup lands on a
    # throwaway run so the first timed query is attributable (r1 showed
    # 7s of warm-up attributed to kg_statistics)
    qs["kg_statistics"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    times = {}
    for name in _headline():
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
    return times


def _burn(iters: int) -> int:
    x = 0
    for i in range(iters):
        x += i & 7
    return x


def cpu_probe(sizes=(8, 32), burn_iters=2_500_000) -> dict:
    """Host-capacity evidence recorded per run: aggregate pure-Python
    throughput at N concurrent processes. On a dedicated 32-core box
    ratio_32_over_8 ≈ 4; the shared sandbox saturates well below that,
    which is why the scaling pair is 2→8 (see BASELINE.md)."""
    import multiprocessing as mp

    out = {}
    for n in sizes:
        with mp.Pool(n) as pool:
            t0 = time.time()
            pool.map(_burn, [burn_iters] * (n * 2))
            out[str(n)] = round((n * 2) / (time.time() - t0), 3)
    out["ratio_32_over_8"] = round(out[str(sizes[1])] / out[str(sizes[0])], 3)
    return out


def ensure_corpus(spark) -> tuple[str, int]:
    """Generate the bench corpus once and cache it as parquet
    (pre-split into 64 files so any core count reads parallel)."""
    key = f"{KG_REPOS}x{KG_FILES}x{KG_CALL_LINES}"
    path = f"{CORPUS_CACHE}_{key}"
    marker = f"{path}/_SUCCESS"
    n_files = KG_REPOS * KG_FILES
    if not os.path.exists(marker):
        from kgw_spark.sources.corpus import corpus_df, generate_corpus

        rows, _ = generate_corpus(
            n_repos=KG_REPOS,
            files_per_repo=KG_FILES,
            seed=42,
            n_funcs=KG_FUNCS,
            n_call_lines=KG_CALL_LINES,
            track_truth=False,
        )
        corpus_df(spark, rows).repartition(64).write.mode("overwrite").parquet(path)
    return path, n_files


def run_kg_pipeline(spark, corpus_path, alias_rows) -> dict:
    """Full extract→link→canonicalize→materialize run (fused plan,
    final tables written); returns wall time + triples/sec."""
    from kgw_spark.plans.pipeline import run_pipeline
    from kgw_spark.sinks.store import TableStore
    from kgw_spark.sources.corpus import build_alias_dict  # noqa: F401

    workdir = tempfile.mkdtemp(prefix="kgbench_", dir=_SCRATCH)
    try:
        src = spark.read.parquet(corpus_path)
        adf = spark.createDataFrame(
            alias_rows, schema="alias_id string, canonical_id string, score double"
        )
        store = TableStore(f"{workdir}/store")
        t0 = time.time()
        res = run_pipeline(
            spark,
            src,
            adf,
            store,
            input_fingerprint="bench",
            materialize_intermediate=False,
        )
        wall = time.time() - t0
        n_triples = res.manifests["edges"]["rows"]
        n_nodes = res.manifests["nodes"]["rows"]
        return {
            "wall_sec": round(wall, 3),
            "triples": n_triples,
            "nodes": n_nodes,
            "triples_per_sec": round(n_triples / wall, 2),
        }
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def main():
    from kgw_spark.sources.corpus import build_alias_dict

    alias_rows = [
        {"alias_id": a, "canonical_id": c, "score": float(s)}
        for a, (c, s) in build_alias_dict(12).items()
    ]

    result: dict = {"sf": SF_DIR, "cpus": CPUS}

    spark = _fresh_spark(CPUS)
    corpus_path, n_files = ensure_corpus(spark)
    result["queries"] = run_queries(spark)

    if SKIP_SCALING:
        kg_head = run_kg_pipeline(spark, corpus_path, alias_rows)
        kg_head["cores"] = CPUS
    else:
        # N vs 4N cores, interleaved best-of-K trials. The sandbox host
        # saturates at ~10 effective cores under sustained load (shared
        # infrastructure; raw-CPU probe shows 32 busy procs get ~3.1x
        # the throughput of 8), so the N→4N pair defaults to (2, 8) —
        # inside the host's real capacity, where the measurement
        # reflects the ENGINE's scaling rather than the host ceiling.
        # Interleaving trials and taking the best per size removes the
        # host's minute-scale performance weather. On a real cluster
        # this is the same spark-submit at two executor counts.
        trials = int(os.environ.get("SPARK_GRAFT_SCALING_TRIALS", "3"))
        n_small = int(os.environ.get("SPARK_GRAFT_SCALING_N", str(max(2, CPUS // 16))))
        n_big = n_small * 4
        sizes = [n_small, n_big] + ([CPUS] if CPUS not in (n_small, n_big) else [])
        best: dict[int, dict] = {}
        walls: dict[int, list[float]] = {c: [] for c in sizes}
        for _ in range(trials):
            for cores in sizes:
                s = _fresh_spark(cores)
                r = run_kg_pipeline(s, corpus_path, alias_rows)
                r["cores"] = cores
                walls[cores].append(r["wall_sec"])
                if cores not in best or r["wall_sec"] < best[cores]["wall_sec"]:
                    best[cores] = r
        # paired (same-round, back-to-back = same host weather)
        # efficiencies: each interleaved round contributes one
        # small-vs-big ratio measured minutes apart, the closest this
        # host gets to a controlled comparison
        paired = [
            round((walls[n_small][i] / walls[n_big][i]) / (n_big / n_small), 3)
            for i in range(trials)
        ]

        def median(xs: list[float]) -> float:
            xs = sorted(xs)
            m = len(xs) // 2
            return xs[m] if len(xs) % 2 else round((xs[m - 1] + xs[m]) / 2, 3)

        kg_small, kg_big = best[n_small], best[n_big]
        # headline = peak end-to-end throughput observed across sizes
        kg_head = max(best.values(), key=lambda r: r["triples_per_sec"])
        eff = (kg_big["triples_per_sec"] / kg_small["triples_per_sec"]) / (
            n_big / n_small
        )
        result["scaling"] = {
            "cores_small": n_small,
            "cores_big": n_big,
            "trials_per_size": trials,
            "selection": "best-of-trials (interleaved)",
            "triples_per_sec_small": kg_small["triples_per_sec"],
            "triples_per_sec_big": kg_big["triples_per_sec"],
            "wall_sec_small": kg_small["wall_sec"],
            "wall_sec_big": kg_big["wall_sec"],
            "efficiency": round(eff, 3),
            "efficiency_median": round(
                (median(walls[n_small]) / median(walls[n_big])) / (n_big / n_small), 3
            ),
            "efficiency_paired": paired,
            "efficiency_paired_median": median(paired),
            "best_per_size": {
                str(c): {
                    "wall_sec": b["wall_sec"],
                    "triples_per_sec": b["triples_per_sec"],
                    "wall_sec_median": median(walls[c]),
                    "wall_sec_all": walls[c],
                }
                for c, b in sorted(best.items())
            },
            "host_cpu_probe": cpu_probe(),
            "host_note": (
                "sandbox host saturates ~10 effective cores under sustained "
                "load; pair chosen inside that capacity so the ratio "
                "measures the engine, not the host ceiling"
            ),
        }

    kg_head["files"] = n_files
    result["kg"] = kg_head
    result["metric"] = "triples_per_sec_end_to_end"
    result["value"] = kg_head["triples_per_sec"]
    result["unit"] = "triples/sec"
    print(json.dumps(result))


if __name__ == "__main__":
    main()
