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

from kgw_spark.operators.canon import canonicalize, compose_mapping
from kgw_spark.operators.extract import extract_mentions
from kgw_spark.operators.graph import build_edges, build_nodes
from kgw_spark.operators.link import link_salted
from kgw_spark.sinks.store import TableStore

# corpus-size ceiling for the lineage-dictionary fast path (file count
# tracks corpus bytes — ~2 KB/file floor puts 4 GB at ≲2 M files, a
# few-hundred-MB broadcast at most; beyond it the packed-string path
# runs, which has no broadcast and scales unbounded)
LINEAGE_DICT_MAX_CORPUS_BYTES = 4 << 30


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
    materialize_intermediate: bool = True,
    alias_local=None,
) -> PipelineResult:
    """Run (or resume) the full KG-construction pipeline.

    ``input_fingerprint`` identifies the input snapshot (e.g. corpus
    content hash or Iceberg snapshot id); stages checkpointed under a
    different fingerprint are recomputed.

    ``alias_local``: optional list of (alias_id, canonical_id, score)
    tuples when the dictionary is already driver-resident (loaded from
    a curated file — the common case); the broadcast-path mapping then
    builds with zero probe/collect jobs (compose_mapping_local).

    ``materialize_intermediate=False`` fuses extract→link→canonicalize
    →build into one Catalyst plan and writes only the final nodes/edges
    tables — maximum throughput, no mid-pipeline resume points. The
    default materializes every stage (full resumability); choose per
    job the way you'd choose checkpoint intervals on a cluster.
    """
    t0 = time.time()
    res = PipelineResult(nodes=None, edges=None)  # type: ignore[arg-type]

    def stage(name: str, compute, partition_by: str | None, final: bool = False):
        if not materialize_intermediate and not final:
            res.stages_run.append(name + "(fused)")
            return compute()
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

    # fused runs never materialize the mentions table, so they use the
    # packed-lineage extraction shape (one delimited lineage column —
    # less python CPU and Arrow transfer; build_edges folds the four
    # lineage columns into exactly this key anyway). The materialized
    # mentions TABLE keeps its four-column contract.
    #
    # Lineage dictionary (fused path, size-gated): lineage is constant
    # per FILE, so mention rows shuffle a 4-byte-ish rank instead of the
    # ~110-byte repo/path/commit/sha string; ranks are assigned in
    # (repo, path, commit, sha) order so min(rank) picks the identical
    # lexicographically-first witness. Gated on Catalyst's corpus size
    # estimate: the dictionary is broadcast twice (into the scan and
    # back after the edge reduce), which only pays while the file
    # population is broadcast-sized — a 100 TB corpus with ~100 M files
    # falls back to the string path automatically.
    lineage_dim = None
    packed = not materialize_intermediate
    if packed and not store.is_complete("edges", input_fingerprint):
        from pyspark.sql import Window, functions as F
        from kgw_spark.plans.hints import plan_size_bytes

        if plan_size_bytes(corpus) <= LINEAGE_DICT_MAX_CORPUS_BYTES:
            lcols = ["repo", "path", "commit", "content_sha256"]
            # row_number over a global order on the per-file projection
            # (column-pruned scan — content is never read). Deliberately
            # NOT checkpointed: the dictionary is evaluated lazily
            # inside each consuming broadcast exchange, overlapping the
            # main job instead of paying 2-3 serial driver-scheduled
            # jobs up front (~2 s of fixed wall per run, which the
            # N→4N scaling ratio pays at every cluster size). Two
            # evaluations are safe: dropDuplicates + a total order over
            # all four columns make the rank assignment deterministic.
            # At dictionary sizes past a single task, switch to a
            # range-partitioned rank; the size gate keeps us well
            # inside single-task territory here.
            lineage_dim = (
                corpus.select(*lcols)
                .dropDuplicates(lcols)
                .withColumn(
                    "_lrank", F.row_number().over(Window.orderBy(*lcols))
                )
            )
            corpus = corpus.join(F.broadcast(lineage_dim), lcols)
    mentions = stage(
        "mentions",
        lambda: extract_mentions(corpus, packed_lineage=packed),
        "pred",
    )
    if salted:
        # dictionary too big to broadcast: salted shuffle-hash link,
        # then CC-canonicalization as a separate rewrite
        linked = stage(
            "linked", lambda: link_salted(mentions, alias_df, num_salts), "pred"
        )
        canonical = stage(
            "canonical",
            lambda: canonicalize(linked, compose_mapping(alias_df)),
            "pred",
        )
    else:
        # broadcast path: link∘canonicalize composed into ONE mapping
        # (disambiguated best candidates → connected components),
        # applied with a single pair of broadcast joins
        canonical = stage(
            "canonical",
            lambda: canonicalize(
                mentions, compose_mapping(alias_df, alias_rows=alias_local)
            ),
            "pred",
        )
    res.edges = stage(
        "edges", lambda: build_edges(canonical, lineage_dim=lineage_dim),
        "type", final=True,
    )
    # nodes derive from the committed edges table — one chain
    # evaluation, and the read-back is a 3-column pruned scan (~0.1% of
    # the table thanks to the first-class n_mentions column), so it is
    # nearly free. Persisting the edge aggregate instead was measured
    # STRICTLY worse: the cache forces an extra in-memory columnar
    # materialization of the full table (2.8x the parquet bytes) whose
    # build cost and GC churn grow with executor-lane count — at
    # local[32] it tripled the pipeline wall.
    edges_committed = res.edges
    res.nodes = stage("nodes", lambda: build_nodes(edges_committed), "type", final=True)
    res.wall_sec = time.time() - t0
    return res
