"""As-of (backward, inclusive) join — the temporal lookup a
training-data / eventstream pipeline needs constantly: for every left
row, the single most recent right row with the same key and
``right_time <= left_time``.

Spark has no built-in as-of join; the naive formulation (range join +
per-left-row top-1) explodes quadratically in rows-per-key. The
scale-sound shape used here is the union-and-window trick:

1. tag right rows 0 and left rows 1, union them on (key, time),
2. one window sorted by (time, tag, tie) per key carries the latest
   right payload forward (``last(payload, ignorenulls=True)``),
3. keep the left rows.

Cost: ONE shuffle of |left| + |right| rows on the key and one sort —
no range explosion, no per-row Python. Right rows sort BEFORE left
rows at equal time, so the boundary is inclusive; among right rows
with identical times the ``tie_col``-largest wins, making the result
deterministic (and exactly matchable by an ANSI-SQL
``row_number() ... ORDER BY time DESC, tie DESC`` oracle). Hot keys
bound the per-partition sort exactly like any per-key window
aggregation; salt the key upstream if a single key's rows exceed an
executor partition.

Reference scope note: the reference engine has no temporal-join
operator; this is part of the training-data operator suite
(SURVEY.md §2.8) motivated by the brief's custom-operator list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    tie_col: str | None = None,
) -> DataFrame:
    """Backward inclusive as-of join.

    Returns every ``left`` row with ``payload_cols`` from the matched
    right row appended (NULLs when the key has no right row at or
    before ``left_time``). ``tie_col`` (a right column, default the
    first payload column) breaks equal-``right_time`` ties by MAX —
    required for a deterministic, oracle-able result.
    """
    from pyspark.sql import types as T

    tie = tie_col or payload_cols[0]
    lt = list(left.columns)
    r_fields = {f.name: f.dataType for f in right.schema.fields}
    p_type = T.StructType(
        [T.StructField(c, r_fields[c], True) for c in payload_cols]
    )
    l_type = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in left.schema.fields]
    )
    l_u = left.select(
        *[F.col(c).alias(f"_k{i}") for i, c in enumerate(key_cols)],
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_fields[tie]).alias("_tie"),
        F.struct(*lt).alias("_lrow"),
        F.lit(None).cast(p_type).alias("_p"),
    )
    r_u = right.select(
        *[F.col(c).alias(f"_k{i}") for i, c in enumerate(key_cols)],
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(tie).alias("_tie"),
        F.lit(None).cast(l_type).alias("_lrow"),
        F.struct(*payload_cols).alias("_p"),
    )
    w = (
        Window.partitionBy(*[f"_k{i}" for i in range(len(key_cols))])
        .orderBy(F.asc("_t"), F.asc("_side"), F.asc("_tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l_u.unionByName(r_u)
        .withColumn("_match", F.last("_p", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    return carried.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in lt],
        *[F.col(f"_match.{c}").alias(f"asof_{c}") for c in payload_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_time: str,
    right_time: str,
    lower: int,
    upper: int,
) -> DataFrame:
    """Banded interval join: all (left, right) pairs sharing
    ``key_cols`` with ``right_time ∈ [left_time + lower, left_time +
    upper]`` (times are integer instants, e.g. epoch micros; ``lower``
    may be negative, ``upper > lower``).

    The naive non-equi join is a per-key cross product. Scale shape:
    bucket time at width ``upper - lower`` — every qualifying right row
    lands in one of the ≤ 2 consecutive buckets covering the left
    row's window, so the left side emits at most two (key, bucket)
    probes (usually distinct-folded to fewer), the right side exactly
    one, and the equi-join on (key, bucket) bounds candidates to ~2×
    the true matches before the exact BETWEEN filter. Same pigeonhole
    discipline as the SimHash chunk join and the Hamming-ball probes.
    Floor division is implemented exactly for negative instants via
    ``(x - pmod(x, w)) div w``.
    """
    if upper <= lower:
        raise ValueError(f"range_join needs upper > lower, got [{lower}, {upper}]")
    w = upper - lower

    def _bucket(expr: str) -> str:
        return f"(({expr}) - pmod({expr}, {w})) div {w}"

    keys = [F.col(c).alias(f"_k{i}") for i, c in enumerate(key_cols)]
    l_u = left.select(
        *keys,
        F.struct(*left.columns).alias("_l"),
        F.explode(
            F.array_distinct(
                F.array(
                    F.expr(_bucket(f"{left_time} + {lower}")),
                    F.expr(_bucket(f"{left_time} + {upper}")),
                )
            )
        ).alias("_b"),
    )
    r_u = right.select(
        *keys,
        F.struct(*right.columns).alias("_r"),
        F.expr(_bucket(right_time)).alias("_b"),
    )
    joined = l_u.join(r_u, [f"_k{i}" for i in range(len(key_cols))] + ["_b"])
    rt = F.col(f"_r.{right_time}")
    lt_ = F.col(f"_l.{left_time}")
    return joined.filter(
        (rt >= lt_ + F.lit(lower)) & (rt <= lt_ + F.lit(upper))
    ).select("_l.*", *[F.col(f"_r.{c}").alias(f"r_{c}") for c in right.columns])
