"""Graph assembly: canonical mention triples → unified nodes/edges.

Implements the reference's transform semantics at scale:
- T5 triple dedup (kgw/biomedicine/_oregano.py:226-245) with lineage
  aggregation instead of discard,
- T3 node-mention union (subject ∪ object, _primekg.py:197-242),
- T4 deterministic dedup (min lineage key instead of file order),
- T6 type-from-id-prefix (_oregano.py:143-155),
- T8 property assembly as JSON (orjson in the reference; here
  ``to_json(struct(...))`` — JVM-side, codegen'd).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgw_spark.model import node_type_from_id


def build_edges(
    mentions: DataFrame, lineage_dim: DataFrame | None = None
) -> DataFrame:
    """Dedup (subj, pred, obj) keeping aggregated lineage as properties:
    n_mentions plus the lexicographically-first (repo, path, commit,
    content_sha256) witness — deterministic regardless of partitioning.

    ``lineage_dim``: the per-file dictionary (repo, path, commit,
    content_sha256, _lrank) built by the pipeline when mentions carry
    the int rank column ``_lrank`` instead of lineage strings. The
    aggregation then shuffles one int64 per mention and the witness
    strings are joined back AFTER the reduce via a broadcast of the
    (small) dictionary — at 8M mentions this cut the shuffle's raw
    payload ~3x (the sha hex alone is 64 bytes/row). ``row_number``
    ranks are assigned in (repo, path, commit, sha) order, so
    ``min(_lrank)`` selects the identical lexicographically-first
    witness the string path selects."""
    # n_mentions rides BOTH as a first-class column and inside the
    # JSON property bag: downstream numeric consumers (build_nodes'
    # endpoint counts, degree rollups) read the plain column, so
    # their parquet scan prunes the wide JSON strings entirely and
    # never pays a per-row JSON parse — at 8M edges that parse was
    # ~40 s of pure CPU (the dominant, poorly-scaling cost of the
    # nodes stage); at 100 TB it's the difference between scanning
    # a 8-byte column and re-parsing the whole property payload.
    if "_lrank" in mentions.columns:
        if lineage_dim is None:
            raise ValueError("mentions carry _lrank but no lineage_dim given")
        agg = mentions.groupBy("subj", "pred", "obj").agg(
            F.count(F.lit(1)).alias("n_mentions"),
            F.min("_lrank").alias("_lrank"),
        )
        j = agg.join(F.broadcast(lineage_dim), "_lrank")
        return j.select(
            F.col("subj").alias("source_id"),
            F.col("obj").alias("target_id"),
            F.col("pred").alias("type"),
            F.col("n_mentions"),
            F.to_json(
                F.struct(
                    F.col("n_mentions"),
                    F.col("repo"),
                    F.col("path"),
                    F.col("commit"),
                    F.col("content_sha256"),
                )
            ).alias("properties"),
        )
    # lineage witness as a single delimited string: min(string) stays in
    # whole-stage-codegen'd HashAggregate, whereas min(struct) falls back
    # to ObjectHashAggregate (measured ~2.4x slower at 18M rows). The
    # delimiter cannot appear in repo/path/commit/sha values. Mentions
    # produced with extract_mentions(packed_lineage=True) already carry
    # the delimited key as ``_lineage``.
    if "_lineage" in mentions.columns:
        lineage_key = F.col("_lineage")
    else:
        lineage_key = F.concat_ws(
            "\x01", "repo", "path", "commit", "content_sha256"
        )
    agg = mentions.groupBy("subj", "pred", "obj").agg(
        F.count(F.lit(1)).alias("n_mentions"),
        F.min(lineage_key).alias("_w"),
    )
    w = F.split(F.col("_w"), "\x01")
    return agg.select(
        F.col("subj").alias("source_id"),
        F.col("obj").alias("target_id"),
        F.col("pred").alias("type"),
        F.col("n_mentions"),
        F.to_json(
            F.struct(
                F.col("n_mentions"),
                w.getItem(0).alias("repo"),
                w.getItem(1).alias("path"),
                w.getItem(2).alias("commit"),
                w.getItem(3).alias("content_sha256"),
            )
        ).alias("properties"),
    )


def build_nodes(edges: DataFrame) -> DataFrame:
    """Union of edge endpoints (T3), deduped (T4), typed by id prefix
    (T6), with a local-name property.

    Derived from the *deduped* edges table rather than raw mentions:
    endpoint mention counts are recovered exactly as the sum of edge
    ``n_mentions`` over both endpoint positions, so the expensive
    extraction chain is evaluated once, not twice."""
    # the plain n_mentions column when the edge table carries it (it
    # always does for edges built by build_edges — pruned 3-column
    # scan, no JSON parse); fall back to parsing the property bag for
    # foreign edge tables
    if "n_mentions" in edges.columns:
        n = F.col("n_mentions").cast("long")
    else:
        n = F.get_json_object(F.col("properties"), "$.n_mentions").cast("long")
    # both endpoints in ONE scan (array-explode), not a 2-branch union:
    # the union form reads the committed edge table — and parses the
    # properties JSON — twice
    ids = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col("source_id").alias("id"), n.alias("_n")),
                    F.struct(F.col("target_id").alias("id"), n.alias("_n")),
                )
            ).alias("_e")
        )
        .select("_e.id", "_e._n")
        .groupBy("id")
        .agg(F.sum("_n").alias("n_mentions"))
    )
    name = F.when(
        F.instr(F.col("id"), ":") > 0,
        F.expr("substring(id, instr(id, ':') + 1)"),
    ).otherwise(F.col("id"))
    return ids.select(
        F.col("id"),
        node_type_from_id("id").alias("type"),
        F.to_json(
            F.struct(name.alias("name"), F.col("n_mentions"))
        ).alias("properties"),
    )
