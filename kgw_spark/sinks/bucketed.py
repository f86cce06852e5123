"""Bucketed materialization for co-located joins.

Big fact-to-fact joins (edges-to-edges, mentions-to-alias at dictionary
scale) shuffle both sides on every query. Bucketing pre-shuffles ONCE
at write time: both tables hash-partitioned into the same number of
buckets on the join key, so Catalyst plans the join with NO Exchange —
at 100 TB this converts a per-query full-network shuffle into a
write-time cost amortized over every subsequent join.

Spark's file-source bucketing metadata lives in the session catalog, so
bucketed tables are written with ``saveAsTable`` (external, at an
explicit path). On an Iceberg catalog the same contract is
``writeTo(t).partitionedBy(bucket(N, col))`` with storage-partitioned
joins. Plan shape (no Exchange / no Sort for sorted buckets) is
asserted in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_by: str,
    num_buckets: int = 16,
    sort_by: str | None = None,
    path: str | None = None,
) -> None:
    """Materialize ``df`` as a bucketed (and optionally per-bucket
    sorted) catalog table. Sorted buckets additionally remove the Sort
    from sort-merge joins — the scan is already join-ready."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_by)
    if sort_by:
        writer = writer.sortBy(sort_by)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Catalog read — the ONLY read path that retains bucket metadata
    (``spark.read.parquet`` on the same files loses it)."""
    return spark.table(table_name)
