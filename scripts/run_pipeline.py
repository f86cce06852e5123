#!/usr/bin/env python
"""spark-submit entrypoint for the KG-construction pipeline.

Cluster launch (the north-rule mechanism; two cluster sizes = two
submits with different --num-executors / local[N]):

    zip -r kgw_spark.zip kgw_spark
    spark-submit --py-files kgw_spark.zip \
        --master <cluster-or-local[N]> \
        scripts/run_pipeline.py \
        --corpus /path/to/corpus_parquet \
        --store /path/to/store \
        [--alias /path/to/alias_parquet] [--salted] [--fused]

Reads the corpus table (repo, path, commit, lang, content,
content_sha256), runs extract → link → canonicalize → build, commits
partitioned nodes/edges tables with manifests, prints a one-line JSON
summary (rows, wall, triples/sec, stages run/skipped: resubmitting
after a failure resumes from the checkpoint manifests).
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--store", required=True)
    ap.add_argument("--alias", default=None, help="parquet with alias_id/canonical_id/score")
    ap.add_argument("--fingerprint", default="v1")
    ap.add_argument("--salted", action="store_true")
    ap.add_argument("--fused", action="store_true", help="skip intermediate checkpoints")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from kgw_spark.plans.pipeline import run_pipeline
    from kgw_spark.sinks.store import TableStore

    spark = SparkSession.builder.appName("kgw_spark_pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    corpus = spark.read.parquet(args.corpus)
    if args.alias:
        alias_df = spark.read.parquet(args.alias)
    else:
        alias_df = spark.createDataFrame(
            [], schema="alias_id string, canonical_id string, score double"
        )

    t0 = time.time()
    res = run_pipeline(
        spark,
        corpus,
        alias_df,
        TableStore(args.store),
        input_fingerprint=args.fingerprint,
        salted=args.salted,
        materialize_intermediate=not args.fused,
    )
    wall = time.time() - t0
    triples = res.manifests["edges"]["rows"]
    print(
        json.dumps(
            {
                "triples": triples,
                "nodes": res.manifests["nodes"]["rows"],
                "wall_sec": round(wall, 3),
                "triples_per_sec": round(triples / wall, 2),
                "stages_run": res.stages_run,
                "stages_skipped": res.stages_skipped,
                "parallelism": spark.sparkContext.defaultParallelism,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
