"""Synchronous min-label propagation over the KG edge set.

Community/cluster detection primitive (the Pregel "hash-min" workload
— Kiveris et al.'s building block, also the classic GraphX example) as
pure DataFrame rounds: after ``rounds`` synchronous updates every node
carries the MINIMUM node id reachable within ``rounds`` undirected
hops — a deterministic, exactly SQL-oracle-able label (string min is
binary-collation min in both Spark and DuckDB; no floats anywhere).
Unlike ``canon.connected_components`` (which iterates to a fixpoint
with path-doubling stars) this exposes the bounded-round propagation
itself: radius-k cluster seeds, the per-round convergence profile, and
the exact primitive a fixed-budget community pass at 100 TB would run.

Plan shape per round (the measured-best variant of the pagerank-style
iterative shape): one join edges⋈labels on the neighbor id producing
messages, then self-rows ∪ messages through ONE min-aggregate shuffled
by node id (partial map-side min — the shuffle carries ≤|V| rows
regardless of |E|), each round ``localCheckpoint``-ed so plan depth
stays O(1) in ``rounds``. While the label vector fits the broadcast
budget it ships to the edge partitions instead of shuffling the edge
set every round; past the gate the message join falls back to a
hash-partitioned shuffle (of the checkpointed pair list, never the
full edge derivation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# same gate as pagerank: a (string id, string lbl) row is ~2x a rank
# row, so halve the node budget
_BCAST_MAX_NODES = 1_500_000


def min_label_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    rounds: int = 3,
    id_col: str = "id",
    src_col: str = "source_id",
    dst_col: str = "target_id",
) -> DataFrame:
    """Labels ``(id, label)`` after ``rounds`` synchronous min-label
    updates: ``label_0(v) = v``, ``label_i(v) = min(label_{i-1}(v),
    min over undirected neighbors u of label_{i-1}(u))``. Direction,
    multi-edges, and self-loops are collapsed (none can change a min);
    isolated nodes keep their own id."""
    if rounds < 1:
        raise ValueError(f"min_label_propagation needs rounds >= 1, got {rounds}")
    s, d = F.col(src_col), F.col(dst_col)
    # canonical u<v pair list, ONE distinct over |E| rows (half the rows
    # of dedup-ing the both-directions list — same trade measured in
    # linkpred.common_neighbors), materialized once: every round's join
    # re-reads it, so multi-edge fan-in is paid once, not per round
    pairs = (
        edges.filter(s != d)
        .select(F.least(s, d).alias("u"), F.greatest(s, d).alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # swap-union of a distinct u<v list is dedup-free (disjoint branches)
    und = pairs.select(F.col("u").alias("x"), F.col("v").alias("y")).union(
        pairs.select(F.col("v").alias("x"), F.col("u").alias("y"))
    )
    labels = nodes.select(F.col(id_col).alias("id")).withColumn(
        "label", F.col("id")
    )
    n_nodes = labels.count()
    bcast = n_nodes <= _BCAST_MAX_NODES
    labels = labels.localCheckpoint(eager=True)
    for _ in range(rounds):
        lbl = F.broadcast(labels) if bcast else labels
        # one pass per round: neighbor messages unioned with the self
        # rows, ONE min-aggregate (map-side partial min bounds the
        # shuffle at ≤|V| rows) — A/B-measured at sf0.1/32 lanes
        # against the two-join (nbmin + left-join-least) update:
        # 4.1 s vs 4.8 s warm, one broadcast build per round not two
        msgs = und.join(lbl, und["y"] == lbl["id"]).select(
            F.col("x").alias("id"), "label"
        )
        labels = (
            labels.union(msgs)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
    return labels


def label_propagation_py(
    node_ids: list[str],
    edge_list: list[tuple[str, str]],
    rounds: int = 3,
) -> dict[str, str]:
    """Pure-Python replica of ``min_label_propagation`` — the
    independent oracle (exact string mins are order-independent)."""
    neigh: dict[str, set[str]] = {n: set() for n in node_ids}
    for u, v in edge_list:
        if u == v:
            continue
        neigh.setdefault(u, set()).add(v)
        neigh.setdefault(v, set()).add(u)
    labels = {n: n for n in neigh}
    for _ in range(rounds):
        labels = {
            n: min([labels[n]] + [labels[m] for m in ms]) for n, ms in neigh.items()
        }
    return labels
