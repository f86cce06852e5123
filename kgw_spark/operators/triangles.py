"""Exact triangle counting over an undirected pair graph.

The 100-TB-safe formulation is degree-ordered orientation: every
undirected edge points from its (degree, id)-smaller endpoint to the
larger one, so each triangle is counted exactly once — as a wedge at
its lowest-degree vertex closed by one edge lookup. Wedge work is
Σ out-deg², and orientation bounds out-degree by O(√m) on any graph:
a 10^6-degree hub emits NO wedges (all its edges point inward), which
is what makes this shape survive skewed similarity graphs where the
naive 3-way self-join explodes.

Everything is integer counting over deterministic orderings, so the
result is exactly value-oracle-able in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_count(pairs: DataFrame, a_col: str = "a", b_col: str = "b") -> DataFrame:
    """One row ``(n_edges, n_wedges, n_triangles)`` for the undirected
    simple graph induced by ``pairs`` (self-loops and duplicate /
    reversed pairs collapsed)."""
    a, b = F.col(a_col), F.col(b_col)
    und = (
        pairs.select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        # the edge list feeds degree counting, orientation, and the
        # closing-edge lookup (4 plan references): materialize it once
        # — when `pairs` is itself an expensive pipeline (an LSH
        # near-dup join), recomputing it per reference dominates the
        # whole census. The collapsed pair graph is orders of magnitude
        # smaller than the corpus that produced it.
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("u").alias("x"))
        .union(und.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    ed = und.join(du, "u").join(dv, "v")
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ed.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    o1 = oriented.select(F.col("src"), F.col("dst").alias("b1"))
    o2 = oriented.select(F.col("src"), F.col("dst").alias("b2"))
    wedges = o1.join(o2, "src").filter(F.col("b1") < F.col("b2"))
    # wedge count and closed-wedge (triangle) count in ONE pass over
    # the wedge set: a left join against the distinct edge list matches
    # at most one row per wedge, so count(*) is the wedge count and
    # count(matched key) the triangle count — vs the previous
    # count(wedges) + count(left_semi) pair that built the wedge join
    # twice
    closing = und.select(F.col("u").alias("_cu"), F.col("v").alias("_cv"))
    closed = wedges.join(
        closing,
        (F.col("_cu") == F.least("b1", "b2"))
        & (F.col("_cv") == F.greatest("b1", "b2")),
        "left",
    )
    return und.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(
        closed.agg(
            F.count(F.lit(1)).alias("n_wedges"),
            F.count("_cu").alias("n_triangles"),
        )
    )
