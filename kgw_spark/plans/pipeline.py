"""The staged KG-construction pipeline: extract → link → canonicalize →
build → materialize, resumable from checkpoint.

Stage graph (the reference's Luigi DAG, kgw/_shared/base.py:65-244,
re-expressed as a driver-side staged runner — stage boundaries are
committed table writes, not files):

    corpus ──extract──▶ mentions ──link──▶ linked ──canonicalize──▶
    canonical ──build──▶ nodes/edges (partitioned by type/predicate)

Resume semantics (O2): a stage whose manifest exists *for the same
input fingerprint* is skipped and its committed table is reused; a
killed run restarts exactly at the first incomplete stage.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from kgw_spark.operators.canon import alias_pairs, canonicalize, connected_components
from kgw_spark.operators.extract import extract_mentions
from kgw_spark.operators.graph import build_edges, build_nodes
from kgw_spark.operators.link import link_broadcast, link_salted
from kgw_spark.sinks.store import TableStore


@dataclass
class PipelineResult:
    nodes: DataFrame
    edges: DataFrame
    stages_run: list[str] = field(default_factory=list)
    stages_skipped: list[str] = field(default_factory=list)
    manifests: dict = field(default_factory=dict)
    wall_sec: float = 0.0


def run_pipeline(
    spark: SparkSession,
    corpus: DataFrame,
    alias_df: DataFrame,
    store: TableStore,
    input_fingerprint: str,
    salted: bool = False,
    num_salts: int = 16,
) -> PipelineResult:
    """Run (or resume) the full KG-construction pipeline.

    ``input_fingerprint`` identifies the input snapshot (e.g. corpus
    content hash or Iceberg snapshot id); stages checkpointed under a
    different fingerprint are recomputed.
    """
    t0 = time.time()
    res = PipelineResult(nodes=None, edges=None)  # type: ignore[arg-type]

    def stage(name: str, compute, partition_by: str | None):
        if store.is_complete(name, input_fingerprint):
            res.stages_skipped.append(name)
            res.manifests[name] = store.manifest(name)
            return store.read(spark, name)
        df = compute()
        res.manifests[name] = store.write(
            df, name, partition_by=partition_by, input_fingerprint=input_fingerprint
        )
        res.stages_run.append(name)
        return store.read(spark, name)

    mentions = stage("mentions", lambda: extract_mentions(corpus), "pred")
    linker = (
        (lambda: link_salted(mentions, alias_df, num_salts))
        if salted
        else (lambda: link_broadcast(mentions, alias_df))
    )
    linked = stage("linked", linker, "pred")
    canonical = stage(
        "canonical",
        lambda: canonicalize(
            linked, connected_components(alias_pairs(alias_df))
        ),
        "pred",
    )
    res.edges = stage("edges", lambda: build_edges(canonical), "type")
    res.nodes = stage("nodes", lambda: build_nodes(canonical), "type")
    res.wall_sec = time.time() - t0
    return res
