"""Canonicalization: alias resolution as distributed connected components.

Union-find re-expressed for Spark as the alternating large-star /
small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC 2014 — public paper; converges in
O(log n) rounds, each round pure DataFrame groupBy + self-join).
Each round is ``localCheckpoint()``-ed to cut lineage, and convergence
is detected by edge-set stability — the "iterative DataFrame self-joins
with checkpointed convergence" the north rule requires.

Canonical id convention: lexicographic minimum of the component
(documented deviation from the reference's order-dependent first-seen
dedup, kgw/biomedicine/_oregano.py:190-196; SURVEY §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(pairs: DataFrame) -> DataFrame:
    fwd = pairs.select(F.col("u"), F.col("v"))
    rev = pairs.select(F.col("v").alias("u"), F.col("u").alias("v"))
    return fwd.union(rev).filter(F.col("u") != F.col("v")).distinct()


def _large_star(e: DataFrame) -> DataFrame:
    mins = e.groupBy("u").agg(F.min("v").alias("_mv"))
    mins = mins.withColumn("m", F.least(F.col("u"), F.col("_mv"))).select("u", "m")
    return (
        e.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    smaller = e.filter(F.col("v") <= F.col("u"))
    mins = smaller.groupBy("u").agg(F.min("v").alias("_mv"))
    mins = mins.withColumn("m", F.least(F.col("u"), F.col("_mv"))).select("u", "m")
    via_neighbors = (
        smaller.join(mins, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_edges = mins.select(F.col("u"), F.col("m").alias("v"))
    return via_neighbors.union(self_edges).filter(F.col("u") != F.col("v"))


def connected_components(
    pairs: DataFrame, max_iterations: int = 50
) -> DataFrame:
    """``pairs(u, v)``: undirected equivalence edges between entity ids.

    Returns a mapping DataFrame ``(id, canonical_id)`` covering every id
    that appears in ``pairs`` (canonical roots map to themselves).
    """
    e = _symmetrize(pairs).localCheckpoint(eager=True)
    prev = None
    for _ in range(max_iterations):
        e = _symmetrize(_large_star(e))
        e = _symmetrize(_small_star(e))
        e = e.localCheckpoint(eager=True)
        if prev is not None:
            changed = e.exceptAll(prev).limit(1).count() + prev.exceptAll(e).limit(
                1
            ).count()
            if changed == 0:
                break
        prev = e
    else:
        raise RuntimeError("connected_components failed to converge")

    labels = (
        e.groupBy("u")
        .agg(F.min("v").alias("_mv"))
        .select(
            F.col("u").alias("id"),
            F.least(F.col("u"), F.col("_mv")).alias("canonical_id"),
        )
    )
    roots = labels.select(F.col("canonical_id").alias("id")).distinct().withColumn(
        "canonical_id", F.col("id")
    )
    return labels.union(roots).groupBy("id").agg(
        F.min("canonical_id").alias("canonical_id")
    )


def alias_pairs(alias_df: DataFrame) -> DataFrame:
    """Alias dictionary rows → undirected equivalence pairs."""
    return alias_df.select(
        F.col("alias_id").alias("u"), F.col("canonical_id").alias("v")
    )


def canonicalize(mentions: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite subj/obj through the component mapping (left joins; ids
    outside any component are already canonical)."""
    m = F.broadcast(mapping)
    out = mentions
    for col in ("subj", "obj"):
        mm = m.withColumnRenamed("id", f"_{col}_id").withColumnRenamed(
            "canonical_id", f"_{col}_canon"
        )
        out = (
            out.join(mm, out[col] == mm[f"_{col}_id"], "left")
            .withColumn(col, F.coalesce(F.col(f"_{col}_canon"), F.col(col)))
            .drop(f"_{col}_id", f"_{col}_canon")
        )
    return out
