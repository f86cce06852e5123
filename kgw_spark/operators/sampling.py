"""Deterministic corpus sampling.

Training-data pipelines sample reproducibly: the same doc must land in
the same split on every run, on any cluster, under any partitioning —
so sampling is a pure function of the row key, never of rand() or task
layout. ``hash_sample`` keeps a row when an LCG hash of its integral
key lands under the rate. The LCG (glibc constants) is chosen over
xxhash/md5 because it is exactly expressible in BOTH Spark and ANSI
SQL integer arithmetic, making every sample value-oracle-able.

At 100 TB this is a narrow scan + filter — no shuffle, fully pushed
into the data pass that reads the corpus anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 1 << 31


def lcg_bucket(key: Column, buckets: int = 100, salt: int = 0) -> Column:
    """Deterministic bucket in [0, buckets) from an integral key.
    64-bit safe: key * A + C stays under 2^63 for keys < ~8.4e9; larger
    key spaces should pre-fold (key % 2^31) first. Negative keys are
    folded into [0, M) first (sign-following ``%`` would otherwise
    yield negative buckets, silently keeping 100% of negative-keyed
    rows at any rate); the double-mod form is written identically in
    the SQL twin so both engines agree on every 64-bit input."""
    x = key.cast("long") * F.lit(_LCG_A) + F.lit(_LCG_C + salt)
    h = (x % F.lit(_LCG_M) + F.lit(_LCG_M)) % F.lit(_LCG_M)
    return h % F.lit(buckets)


def hash_sample(
    df: DataFrame, key_col: str, rate_pct: int, salt: int = 0
) -> DataFrame:
    """Keep ~rate_pct% of rows, deterministically by key."""
    return df.filter(lcg_bucket(F.col(key_col), 100, salt) < rate_pct)


def lcg_bucket_sql(key_expr: str, buckets: int = 100, salt: int = 0) -> str:
    """The identical bucket computation as ANSI SQL (the oracle twin)."""
    return (
        f"((((CAST({key_expr} AS BIGINT) * {_LCG_A} + {_LCG_C + salt})"
        f" % {_LCG_M}) + {_LCG_M}) % {_LCG_M}) % {buckets}"
    )
