"""PageRank over the KG edge set — exact integer arithmetic.

Floating-point PageRank sums contributions in shuffle order, so the
low bits differ run to run and the result can't be value-oracled.
This implementation scales all rank mass to 64-bit integers
(``rank_scaled = rank * scale``) and expresses damping as a rational
(num/den), so every operation is exact and order-independent:

- contribution of an edge u→v: ``rank(u) div out_degree(u)`` (integer
  floor division; the dropped remainder is deterministic),
- update: ``rank'(v) = teleport + (num * Σ contribs) div den`` with
  ``teleport = ((den - num) * scale) div den``,
- dangling nodes (no out-edges) keep receiving teleport mass but their
  own mass is dropped — the standard simplification, documented.

Initial rank is ``scale`` per node. OVERFLOW GUARD: total mass is
bounded by N·scale and a single node's damped in-mass by
``damping_num · N · scale``, so the requested scale is auto-shrunk
(powers of 10) until that bound stays under 2^63 — at the
reference-CKG node count (14.5M) the default 10^12 shrinks to 10^9,
keeping ANSI mode from throwing and non-ANSI from silently wrapping.
Both engines derive the same effective scale from the same node count,
so results remain bit-identical. A pure-Python replica
(``pagerank_py``) computes those bit-identical results — the oracle.
Plan shape per iteration: one join edges⋈ranks on the source id, one
groupBy target, one left join back to the node set; each iteration
``localCheckpoint``-ed. The out-degree rides inside the rank vector
(8 bytes/node) instead of being pre-joined onto the edge list — the
edge table is scanned as-checkpointed every iteration and never
materializes a third copy (A/B at sf0.1/32 cores: median 3.3 s vs
4.4 s for the pre-joined-links plan, every interleaved trial
disjoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def effective_scale(n_nodes: int, scale: int, damping_num: int) -> int:
    """Largest power-of-10 ≤ ``scale`` with damping_num·N·scale < 2^63
    (the worst-case single-node in-mass product). Shared by the Spark
    and pure-Python paths so both shrink identically."""
    bound = (1 << 63) - 1
    while scale > 1 and damping_num * max(n_nodes, 1) * scale > bound:
        scale //= 10
    if damping_num * max(n_nodes, 1) * scale > bound:
        raise ValueError(f"graph too large for 64-bit pagerank: {n_nodes} nodes")
    return scale


def _graph_parts(edges: DataFrame) -> DataFrame:
    """Node set with out-degree attached: ``(id, _deg)`` where ``_deg``
    is 0 for dangling nodes (never referenced — a dangling id never
    appears as a join source, so only the distinct-ness of the id set
    and the out-degree of source nodes matter). ONE map-side-combined
    aggregation over the tagged endpoint union replaces the r5 shape's
    three exchanges (endpoint distinct + out-degree groupBy + join):
    sources contribute 1 to the sum, targets 0, so the aggregate is
    simultaneously the distinct node set and the out-degree vector —
    A/B at sf0.1/32 lanes 0.6-0.9 s vs 0.95-2.0 s per build."""
    return (
        edges.select(F.col("source_id").alias("id"), F.lit(1).alias("_c"))
        .union(edges.select(F.col("target_id").alias("id"), F.lit(0).alias("_c")))
        .groupBy("id")
        .agg(F.sum("_c").alias("_deg"))
    )


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
    pre_materialized: bool = False,
) -> DataFrame:
    """Returns ``(id, rank_scaled)`` after ``iters`` exact iterations.
    ``pre_materialized=True`` declares that ``edges`` is ALREADY a
    materialized (persisted/checkpointed) 2-column
    (source_id, target_id) frame — e.g. a session-shared derived view —
    so the internal checkpoint is skipped; multi-edges must be intact
    (out-degree and contributions count edge instances)."""
    # materialize the 2-column edge projection ONCE: `edges` is usually
    # an expensive derivation (the KG construction joins), and without
    # this both the node set and the contribution joins would recompute
    # it; it is the ONLY edge-sized materialization in the whole run
    if not pre_materialized:
        edges = edges.select("source_id", "target_id").localCheckpoint(eager=True)
    else:
        edges = edges.select("source_id", "target_id")
    nodes = _graph_parts(edges).localCheckpoint(eager=True)
    n_nodes = nodes.count()
    scale = effective_scale(n_nodes, scale, damping_num)
    teleport = ((damping_den - damping_num) * scale) // damping_den
    ranks = nodes.withColumn("rank_scaled", F.lit(scale).cast("long"))
    # The rank vector is |nodes| (id, long, long) rows — while it fits
    # the broadcast budget, ship IT to the edge partitions each
    # iteration instead of shuffling the (much larger) edge set twice
    # per round: the contribution join becomes a map-side pass over the
    # checkpointed edges with a partial-aggregated shuffle of ~|nodes|
    # rows, and the update join broadcasts the aggregated contributions
    # back onto ``nodes``. The out-degree rides in the rank vector, so
    # no degree join ever touches the edge list. Past the gate
    # (CKG-scale: 14.5M nodes) both joins fall back to hash-partitioned
    # shuffles — the standard frontier trade-off (the carried ``_deg``
    # adds 8 bytes/row to the node-sized shuffle, nothing edge-sized).
    bcast = n_nodes <= 3_000_000
    for _ in range(iters):
        r = F.broadcast(ranks) if bcast else ranks
        contribs = (
            edges.join(r, edges["source_id"] == r["id"])
            .select(
                F.col("target_id").alias("id"),
                F.expr("rank_scaled div _deg").alias("_c"),
            )
            .groupBy("id")
            .agg(F.sum("_c").alias("_s"))
        )
        # per-iteration eager checkpoint: measured FASTER than letting
        # the final action evaluate the nested plan (8.0-8.4s vs
        # 5.9-7.0s at sf0.1/32 cores) — each iteration's broadcast
        # exchange is built exactly once from a materialized rank
        # vector instead of re-deriving the whole prior chain inside a
        # deep AQE plan; it also keeps plan depth O(1) in `iters`
        ranks = (
            nodes.join(F.broadcast(contribs) if bcast else contribs, "id", "left")
            .select(
                "id",
                "_deg",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({damping_num} * coalesce(_s, 0L)) div {damping_den}"
                    )
                ).cast("long").alias("rank_scaled"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("id", "rank_scaled")


def pagerank_py(
    edge_list: list[tuple[str, str]],
    iters: int = 10,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
) -> dict[str, int]:
    """Pure-Python replica — bit-identical to ``pagerank`` (exact
    integer arithmetic is order-independent). The independent oracle."""
    nodes: set[str] = set()
    out_deg: dict[str, int] = {}
    for u, v in edge_list:
        nodes.add(u)
        nodes.add(v)
        out_deg[u] = out_deg.get(u, 0) + 1
    scale = effective_scale(len(nodes), scale, damping_num)
    teleport = ((damping_den - damping_num) * scale) // damping_den
    ranks = {n: scale for n in nodes}
    for _ in range(iters):
        sums: dict[str, int] = {}
        for u, v in edge_list:
            sums[v] = sums.get(v, 0) + ranks[u] // out_deg[u]
        ranks = {
            n: teleport + (damping_num * sums.get(n, 0)) // damping_den
            for n in nodes
        }
    return ranks
