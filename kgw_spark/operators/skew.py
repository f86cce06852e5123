"""Skew utilities: salted two-stage aggregation.

A hot grouping key (the corpus's ``func:logf`` appears in a majority
of files) funnels its whole group through one reducer in a plain
groupBy. The standard fix is salting: aggregate on (key, salt) first —
spreading the hot key over ``num_salts`` reducers — then combine the
partials per key. Works for any algebraic aggregate; here count and
sum, the ones the KG build needs. AQE's skew-join splitting handles
joins; this covers aggregations, which AQE does not split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_salt(df: DataFrame, num_salts: int):
    """Per-row salt that spreads even byte-identical duplicate rows of a
    hot key (hash-of-columns alone would funnel them to one reducer):
    mix the row hash with ``monotonically_increasing_id`` — unique per
    row, deterministic for a given partition layout (stable across task
    retries, which recompute the same partition)."""
    return F.pmod(
        F.hash(*df.columns) + F.monotonically_increasing_id(), F.lit(num_salts)
    ).alias("_salt")


def salted_count(
    df: DataFrame,
    keys: list[str],
    num_salts: int = 16,
    count_name: str = "count",
) -> DataFrame:
    """groupBy(*keys).count() with a salted first stage (no rand())."""
    salt = _row_salt(df, num_salts)
    partial = (
        df.select(*df.columns, salt)
        .groupBy(*keys, "_salt")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return partial.groupBy(*keys).agg(F.sum("_c").alias(count_name))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, str] | None = None,
    num_salts: int = 16,
    count_name: str | None = "count",
) -> DataFrame:
    """Two-stage salted aggregation: counts plus any number of sums
    (``sums`` maps input column → output alias)."""
    sums = sums or {}
    salt = _row_salt(df, num_salts)
    partial_aggs: list[Column] = []
    final_aggs: list[Column] = []
    if count_name:
        partial_aggs.append(F.count(F.lit(1)).alias("_c"))
        final_aggs.append(F.sum("_c").alias(count_name))
    for col, alias in sums.items():
        partial_aggs.append(F.sum(col).alias(f"_s_{alias}"))
        final_aggs.append(F.sum(f"_s_{alias}").alias(alias))
    partial = (
        df.select(*df.columns, salt).groupBy(*keys, "_salt").agg(*partial_aggs)
    )
    return partial.groupBy(*keys).agg(*final_aggs)
