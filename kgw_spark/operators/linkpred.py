"""Common-neighbor link prediction over the KG edge list.

Candidate generation for missing-edge prediction: non-adjacent node
pairs ranked by how many neighbors they share. The naive formulation
(adjacency self-join) does Σ deg² work — a single 10^6-degree hub
emits 10^12 pairs. The scale shape caps the *intermediate* node's
degree: pairs are generated only through nodes with degree ≤ cap, so
wedge work is bounded by cap × |edges| on any graph. That is also the
operator's documented semantics (not an approximation of something
else): hub-mediated co-occurrence ("both cite the root node") carries
no link signal — the same reason Adamic-Adar discounts high-degree
common neighbors to ~0.

Everything is integer counting over deterministic orderings, so the
result (with the (count DESC, u, v) total order on the top-k cut) is
exactly value-oracle-able in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def common_neighbors(
    edges: DataFrame,
    src_col: str = "source_id",
    dst_col: str = "target_id",
    deg_cap: int = 32,
    top: int = 20,
) -> DataFrame:
    """Top ``top`` non-adjacent pairs ``(u, v, n_common)`` (``u < v``)
    by count of shared neighbors of degree ≤ ``deg_cap``, over the
    undirected simple graph induced by ``edges`` (direction, edge type,
    multi-edges, and self-loops collapsed)."""
    if deg_cap < 1 or top < 1:
        raise ValueError(f"common_neighbors needs deg_cap/top >= 1, got {deg_cap}/{top}")
    s, d = F.col(src_col), F.col(dst_col)
    e = edges.filter(s != d)
    # und feeds degree counting, wedge generation, and the adjacency
    # anti-join; it is deliberately NOT checkpointed — recomputing the
    # distinct per reference reads the (typically cached) edge view,
    # and an A/B on the bench host measured materializing the 2|E|-row
    # list a LOSS vs recompute at every trial (same memory-bandwidth
    # lesson as the wide shingle-table persist in dedup.py). Callers
    # whose edge source is an expensive uncached pipeline should
    # persist it before calling.
    und = (
        e.select(s.alias("x"), d.alias("y"))
        .union(e.select(d.alias("x"), s.alias("y")))
        .distinct()
    )
    # degree pre-filter BEFORE collect_list: a hub never reaches a
    # reducer's buffer, so per-group state is bounded by deg_cap
    low = und.join(
        und.groupBy("x").agg(F.count(F.lit(1)).alias("d")).filter(F.col("d") <= deg_cap),
        "x",
    )
    # wedge pairs expanded per intermediate node with JVM higher-order
    # functions (sorted neighbor list -> all u<v combinations, <= C(cap,2)
    # per group) — one groupBy shuffle instead of the self-join's two
    grouped = low.groupBy("x").agg(F.sort_array(F.collect_list("y")).alias("ns"))
    pairs = grouped.select(
        F.explode(
            F.expr(
                "flatten(transform(ns, (a, i) -> "
                "transform(slice(ns, i + 2, size(ns)), b -> struct(a AS u, b AS v))))"
            )
        ).alias("p")
    ).select("p.u", "p.v")
    cn = pairs.groupBy("u", "v").agg(F.count(F.lit(1)).alias("n_common"))
    nonadj = cn.join(
        und.select(F.col("x").alias("u"), F.col("y").alias("v")), ["u", "v"], "left_anti"
    )
    return nonadj.orderBy(F.desc("n_common"), "u", "v").limit(top)
