"""Size-gated join hints.

``broadcast_if_small`` replaces unconditional ``F.broadcast(...)`` on
join sides whose size is *data-dependent* (node tables, alias-component
mappings, neighbor sets). Forcing a broadcast is right when the side is
known-small by construction; it is a scale-killer when the side grows
with the input — at reference-CKG scale the node table is 14.5M rows,
and a forced broadcast OOMs the driver.

The gate asks Catalyst's own cost model: the optimized logical plan's
``sizeInBytes`` estimate (file sizes for scans, propagated through
projections/filters; ``Long.MaxValue``-ish for stats-less sources such
as ``mapInPandas``). If the estimate fits inside
``spark.sql.autoBroadcastJoinThreshold`` the hint is applied; otherwise
the DataFrame is returned unhinted and the planner + AQE pick the
strategy from *runtime* sizes (SMJ / shuffled-hash, or a runtime
broadcast if the actual build side turns out small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNITS = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def parse_byte_conf(value: str) -> int:
    """Parse Spark byte-size conf strings: '10485760', '10MB', '64m', '-1'."""
    v = value.strip().lower()
    if v.endswith("b") and not v[:-1].isdigit() and v[:-1][-1:] in _UNITS:
        v = v[:-1]  # '10mb' -> '10m'
    if v and v[-1] in _UNITS and not v[-1].isdigit():
        return int(v[:-1]) * _UNITS[v[-1]]
    return int(v)


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for ``df`` (optimized logical plan stats).
    Returns a huge sentinel when stats are unavailable, so callers fail
    toward NOT broadcasting."""
    try:
        return int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    except Exception:
        return 1 << 62


def broadcast_if_small(df: DataFrame, threshold_bytes: int | None = None) -> DataFrame:
    """Apply a broadcast hint only when Catalyst estimates ``df`` under
    the session's autoBroadcastJoinThreshold (or an explicit override).
    A threshold of -1 (broadcast disabled) never hints."""
    if threshold_bytes is None:
        conf = df.sparkSession.conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10485760"
        )
        threshold_bytes = parse_byte_conf(conf)
    if threshold_bytes < 0:
        return df
    if plan_size_bytes(df) <= threshold_bytes:
        return F.broadcast(df)
    return df
