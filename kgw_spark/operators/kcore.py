"""k-core decomposition by iterative peeling over the KG edge set.

The k-core of a graph is its maximal subgraph in which every node has
degree >= k — the standard graph-health / dense-region primitive
(Seidman 1983; the peeling algorithm is the textbook O(|E|) sequential
method, here expressed as bounded DataFrame rounds). All arithmetic is
integer degree counting over deterministic sets, so the result (node
id, degree-within-core) is exactly value-oracle-able against a
pure-Python replica.

Plan shape per round (mirrors the measured-best iterative shape shared
by pagerank/label-prop in this package):

- degrees: one map-side-combined groupBy over the 2|E|-row endpoint
  union — the shuffle carries <= |V| rows regardless of |E|;
- the PEELED set (degree < k) is materialized, not the survivor set:
  peeled nodes shrink geometrically after the first rounds, so the
  anti-join ships the small side (AQE broadcasts it once it fits);
- surviving pairs are ``localCheckpoint``-ed so plan depth stays O(1)
  in rounds and each round re-reads a materialized pair list;
- termination = an empty peel set (2 jobs/round: degree agg + peel
  count ride one materialization, anti-join + checkpoint the other).

Rounds are data-bounded (the peel depth, a.k.a. degeneracy diameter),
not fixed: ``max_rounds`` is a runaway guard, and hitting it raises
rather than returning a non-core.

At 100 TB: every round's shuffle is keyed on node id (degree agg) or
the pair's endpoint (anti-join); nothing is ever all-pairs and no
per-node state exceeds one long. Skewed hubs cost one counted key, not
a buffered group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_core(
    edges: DataFrame,
    k: int,
    src_col: str = "source_id",
    dst_col: str = "target_id",
    max_rounds: int = 100,
) -> DataFrame:
    """Nodes of the k-core of the undirected simple graph induced by
    ``edges`` (direction, multi-edges, and self-loops collapsed), as
    ``(id, degree)`` with ``degree`` counted WITHIN the core. Empty
    result when no k-core exists."""
    if k < 1:
        raise ValueError(f"k_core needs k >= 1, got {k}")
    s, d = F.col(src_col), F.col(dst_col)
    # canonical u<v pair list: ONE distinct over |E| rows, materialized
    # once — every round's degree agg and anti-join re-read it
    pairs = (
        edges.filter(s != d)
        .select(F.least(s, d).alias("u"), F.greatest(s, d).alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        und = pairs.select(F.col("u").alias("id")).union(
            pairs.select(F.col("v").alias("id"))
        )
        deg = und.groupBy("id").agg(F.count(F.lit(1)).alias("degree"))
        # materialize the PEELED side: small after round 1, and the
        # count that decides termination rides the same materialization
        low = deg.filter(F.col("degree") < k).select("id").localCheckpoint(eager=True)
        if low.count() == 0:
            return deg
        pairs = (
            pairs.join(low.withColumnRenamed("id", "u"), "u", "left_anti")
            .join(low.withColumnRenamed("id", "v"), "v", "left_anti")
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(f"k_core did not converge within {max_rounds} rounds")


def k_core_py(edge_list: list[tuple[str, str]], k: int) -> dict[str, int]:
    """Pure-Python replica of ``k_core`` — the independent oracle
    (iterative peeling to the same fixpoint; degrees are exact
    integers, so the results are identical)."""
    adj: dict[str, set[str]] = {}
    for u, v in edge_list:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    while True:
        low = [n for n, ns in adj.items() if len(ns) < k]
        if not low:
            break
        for n in low:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
    return {n: len(ns) for n, ns in adj.items()}
