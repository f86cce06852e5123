"""Partitioned table store with atomic commits and snapshot manifests.

At production scale this is an Iceberg catalog (``df.writeTo(...)
.partitionedBy("type").createOrReplace()``); the Iceberg runtime jar is
not available in this sandbox, so the same contract is implemented on
plain parquet directories:

- tables live under ``<base>/tables/<name>/`` partitioned by a column
  (entity-type for nodes, predicate for edges — the north rule's
  partitioning),
- writes go to a staging directory and are atomically renamed into
  place (the reference's write-to-.partial-then-rename discipline,
  kgw/_shared/tasks.py:13-28, L9),
- every committed write records a manifest JSON (snapshot id = content
  fingerprint, row count, per-partition metrics, wall time) under
  ``<base>/manifests/`` — the checkpoint/resume unit (Luigi
  output()-exists semantics, kgw/_shared/base.py:300-304, O2).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class TableStore:
    def __init__(self, base_dir: str):
        self.base_dir = base_dir
        self.tables_dir = os.path.join(base_dir, "tables")
        self.manifests_dir = os.path.join(base_dir, "manifests")
        os.makedirs(self.tables_dir, exist_ok=True)
        os.makedirs(self.manifests_dir, exist_ok=True)

    # -- manifests (checkpoint unit) ------------------------------------
    def manifest_path(self, stage: str) -> str:
        return os.path.join(self.manifests_dir, f"{stage}.json")

    def manifest(self, stage: str) -> dict | None:
        p = self.manifest_path(stage)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def is_complete(self, stage: str, input_fingerprint: str | None = None) -> bool:
        m = self.manifest(stage)
        if m is None:
            return False
        if input_fingerprint is not None and m.get("input_fingerprint") != input_fingerprint:
            return False
        # defense in depth: a manifest without its committed table
        # (e.g. manual deletion) must not mark the stage complete
        table = m.get("table")
        if table and not os.path.isdir(self.table_path(table)):
            return False
        return True

    # -- table io --------------------------------------------------------
    def table_path(self, name: str) -> str:
        return os.path.join(self.tables_dir, name)

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        path = self.table_path(name)
        schema_file = os.path.join(path, "_schema.json")
        has_files = any(
            fn.endswith(".parquet")
            for _r, _d, files in os.walk(path)
            for fn in files
        )
        if not has_files and os.path.exists(schema_file):
            # empty table (e.g. a KG with no edges): no parquet files
            # were written — reconstruct from the persisted schema
            from pyspark.sql.types import StructType

            with open(schema_file) as f:
                schema = StructType.fromJson(json.load(f))
            return spark.createDataFrame([], schema=schema)
        return spark.read.parquet(path)

    def write(
        self,
        df: DataFrame,
        name: str,
        partition_by: str | None = None,
        stage: str | None = None,
        input_fingerprint: str | None = None,
    ) -> dict:
        """Atomically (re)materialize ``df`` as table ``name`` and commit
        a manifest for ``stage`` (default: the table name)."""
        stage = stage or name
        t0 = time.time()
        # sweep leftovers from a previous crashed commit of this table
        for fn in os.listdir(self.tables_dir):
            if fn.startswith(f"{name}.old_"):
                shutil.rmtree(os.path.join(self.tables_dir, fn), ignore_errors=True)
        staging = os.path.join(self.base_dir, f"_staging_{name}_{uuid.uuid4().hex[:8]}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.parquet(staging)
        # persist the schema so empty tables round-trip (a partitioned
        # write of zero rows produces no parquet files)
        with open(os.path.join(staging, "_schema.json"), "w") as f:
            json.dump(df.schema.jsonValue(), f)

        # Crash-safe commit ordering: (1) invalidate the stage manifest
        # FIRST — a kill anywhere past this point leaves the stage
        # incomplete, so a resume re-runs it instead of reading a
        # half-replaced table; (2) move the old table aside with a
        # cheap rename (never rmtree the live name); (3) rename the
        # staging dir into place (atomic on one filesystem); (4) only
        # then delete the old copy and (5) commit the new manifest.
        mpath = self.manifest_path(stage)
        if os.path.exists(mpath):
            os.remove(mpath)
        final = self.table_path(name)
        old = None
        if os.path.exists(final):
            old = f"{final}.old_{uuid.uuid4().hex[:8]}"
            os.rename(final, old)
        os.rename(staging, final)
        if old:
            shutil.rmtree(old, ignore_errors=True)

        # per-partition metrics from parquet footers — no extra Spark job
        per_part, rows = self._footer_metrics(final, partition_by)

        manifest = {
            "stage": stage,
            "table": name,
            "snapshot_id": uuid.uuid4().hex,
            "input_fingerprint": input_fingerprint,
            "rows": rows,
            "partition_by": partition_by,
            "partition_metrics": per_part,
            "wall_sec": round(time.time() - t0, 3),
            "committed_at_epoch": time.time(),
        }
        tmp = self.manifest_path(stage) + ".partial"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2, default=str)
        os.rename(tmp, self.manifest_path(stage))
        return manifest

    @staticmethod
    def _footer_metrics(table_dir: str, partition_by: str | None):
        """Row counts per partition directory, read from parquet footers
        (driver-side metadata only — equivalent to Iceberg manifest
        stats, costs no Spark job). Footer reads are farmed to a small
        thread pool: at ~10 ms per footer a sequential walk over a
        few hundred files adds seconds of pure serial wall to every
        stage commit — cost the N→4N scaling ratio pays at all sizes."""
        from concurrent.futures import ThreadPoolExecutor

        import pyarrow.parquet as pq

        targets: list[tuple[str | None, str]] = []
        for root, _dirs, files in os.walk(table_dir):
            part_key = None
            if partition_by:
                for seg in os.path.relpath(root, table_dir).split(os.sep):
                    if seg.startswith(f"{partition_by}="):
                        part_key = seg.split("=", 1)[1]
            for fn in files:
                if fn.endswith(".parquet"):
                    targets.append((part_key, os.path.join(root, fn)))
        per_part: dict[str, int] = {}
        rows = 0
        if targets:
            with ThreadPoolExecutor(max_workers=min(16, len(targets))) as pool:
                counts = pool.map(
                    lambda t: (t[0], pq.read_metadata(t[1]).num_rows), targets
                )
            for part_key, n in counts:
                rows += n
                if part_key is not None:
                    per_part[part_key] = per_part.get(part_key, 0) + n
        return per_part, rows

    def _manifest_for_table(self, name: str, stage: str | None = None) -> dict:
        """The manifest governing table ``name``: the given ``stage``'s
        manifest when provided, else the unique manifest whose ``table``
        field is ``name`` (``write()`` allows stage != name, so keying
        by table name alone could silently miss the real manifest and
        e.g. compact away a partition layout)."""
        if stage is not None:
            m = self.manifest(stage)
            if m is None or m.get("table") != name:
                raise ValueError(
                    f"manifest for stage {stage!r} does not govern table {name!r}"
                )
            return m
        matches = []
        for fn in sorted(os.listdir(self.manifests_dir)):
            if not fn.endswith(".json"):
                continue
            m = self.manifest(fn[: -len(".json")])
            if m and m.get("table") == name:
                matches.append(m)
        if len(matches) != 1:
            raise ValueError(
                f"expected exactly one manifest for table {name!r}, "
                f"found {len(matches)}; pass stage= to disambiguate"
            )
        return matches[0]

    def compact(
        self,
        spark: SparkSession,
        name: str,
        input_fingerprint: str | None = None,
        stage: str | None = None,
    ) -> dict:
        """Small-file compaction (Iceberg ``rewrite_data_files``
        analog): rewrite table ``name`` with one file per partition
        value. Long-running ingestion — micro-batch appends, per-stage
        writes at high parallelism — accretes files far smaller than a
        scan-efficient split; at 100 TB that turns every downstream
        scan into a file-listing storm. The rewrite hash-repartitions
        BY the partition column (one shuffle; every partition value
        lands in exactly one task, so the partitioned write emits one
        file per value), goes through the same atomic staging rename,
        and records a fresh manifest whose per-partition metrics
        reflect the compacted layout. Row content is unchanged. For
        partitions larger than one task should write, split by an
        additional bucket column before calling this (Iceberg: bucket
        transform)."""
        m = self._manifest_for_table(name, stage)
        partition_by = m.get("partition_by")
        df = self.read(spark, name)
        df = df.repartition(partition_by) if partition_by else df.coalesce(1)
        return self.write(
            df,
            name,
            partition_by=partition_by,
            stage=m.get("stage"),
            input_fingerprint=input_fingerprint or m.get("input_fingerprint"),
        )
