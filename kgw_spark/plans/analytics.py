"""Analytics over the unified store — the reference's SQL surface
(kgw/_shared/load.py) as Catalyst-planned DataFrame jobs.

A1 scalar counts, A2 count-distinct, A3 ordered type histograms,
A4 schema detection (2-way equi-join + 3-col group-by),
A5 compact schema, A7 neighborhood query.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgw_spark.plans.hints import broadcast_if_small


def node_type_counts(nodes: DataFrame) -> DataFrame:
    """A3 for nodes: GROUP BY type ORDER BY count DESC, type ASC
    (kgw/_shared/load.py:15-38)."""
    return (
        nodes.groupBy("type")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc("type"))
    )


def edge_type_counts(edges: DataFrame) -> DataFrame:
    """A3 for edges (kgw/_shared/load.py:42-66)."""
    return (
        edges.groupBy("type")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc("type"))
    )


def statistics(nodes: DataFrame, edges: DataFrame) -> dict:
    """The statistics.json payload, key order and type-map ordering
    identical to the reference (load.py:69-80: count DESC, type ASC —
    assembled driver-side because JSON object key order is the
    contract, SURVEY §7.4)."""
    ntc = node_type_counts(nodes).collect()
    etc = edge_type_counts(edges).collect()
    return {
        "num_nodes": sum(r["count"] for r in ntc),
        "num_edges": sum(r["count"] for r in etc),
        "num_node_types": len(ntc),
        "num_edge_types": len(etc),
        "node_types": {r["type"]: r["count"] for r in ntc},
        "edge_types": {r["type"]: r["count"] for r in etc},
    }


def write_statistics(nodes: DataFrame, edges: DataFrame, filepath: str) -> dict:
    data = statistics(nodes, edges)
    with open(filepath, "w") as f:
        json.dump(data, f, indent=2)
    return data


def schema_triples(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """A4 (load.py:109-132): (source_type, edge_type, target_type) →
    triple_count. Physical plan: two hash joins — ``nodes`` is
    broadcast on both sides only while Catalyst estimates it under the
    broadcast threshold (size-gated: at reference-CKG scale the node
    table is 14.5M rows and a forced broadcast would OOM); past the
    gate, AQE picks SMJ/shuffled-hash from runtime sizes, so the only
    guaranteed shuffle is the final 3-column aggregation."""
    src = broadcast_if_small(
        nodes.select(F.col("id").alias("_sid"), F.col("type").alias("source_type"))
    )
    tgt = broadcast_if_small(
        nodes.select(F.col("id").alias("_tid"), F.col("type").alias("target_type"))
    )
    return (
        edges.join(src, edges["source_id"] == F.col("_sid"))
        .join(tgt, edges["target_id"] == F.col("_tid"))
        .groupBy("source_type", F.col("type").alias("edge_type"), "target_type")
        .agg(F.count(F.lit(1)).alias("triple_count"))
        .orderBy(
            F.desc("triple_count"),
            F.asc("source_type"),
            F.asc("edge_type"),
            F.asc("target_type"),
        )
    )


def compact_schema(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """A5 (load.py:218-241): (source_type, target_type) with COUNT(*)
    and COUNT(DISTINCT edge type). Same size-gated join strategy as
    ``schema_triples``."""
    src = broadcast_if_small(
        nodes.select(F.col("id").alias("_sid"), F.col("type").alias("source_type"))
    )
    tgt = broadcast_if_small(
        nodes.select(F.col("id").alias("_tid"), F.col("type").alias("target_type"))
    )
    return (
        edges.join(src, edges["source_id"] == F.col("_sid"))
        .join(tgt, edges["target_id"] == F.col("_tid"))
        .groupBy("source_type", "target_type")
        .agg(
            F.count(F.lit(1)).alias("edge_count"),
            F.countDistinct("type").alias("num_edge_types"),
        )
        .orderBy(F.desc("edge_count"), F.asc("source_type"), F.asc("target_type"))
    )


def neighborhood(edges: DataFrame, node_id: str) -> DataFrame:
    """A7 (examples/downstream_analysis.ipynb): the 1-hop neighborhood
    of ``node_id`` — incident edges plus edges among the neighbors.
    Neighbor-set membership is a semi-join, not a collect. The neighbor
    set of a hub node is unbounded, so the broadcast is size-gated —
    without file-level stats Catalyst can't bound a filtered set, the
    hint is skipped, and AQE converts to a runtime broadcast when the
    set is actually small."""
    incident = edges.filter(
        (F.col("source_id") == node_id) | (F.col("target_id") == node_id)
    )
    neighbors = (
        incident.select(F.col("source_id").alias("nid"))
        .union(incident.select(F.col("target_id").alias("nid")))
        .filter(F.col("nid") != node_id)
        .distinct()
    )
    among = edges.join(
        broadcast_if_small(neighbors),
        edges["source_id"] == F.col("nid"),
        "left_semi",
    ).join(
        broadcast_if_small(neighbors.withColumnRenamed("nid", "nid2")),
        edges["target_id"] == F.col("nid2"),
        "left_semi",
    )
    return incident.union(among).distinct()


def schema_html(nodes: DataFrame, edges: DataFrame, filepath: str) -> None:
    """A6 (load.py:134-184): interactive schema visualization. The
    reference renders a gravis/d3 HTML of the *schema* graph (tiny —
    one node per type). We collect the same schema result and emit a
    self-contained HTML page with an embedded JSON payload + SVG-free
    table rendering (gravis is not available here; the data contract
    is the schema triples, not the pixels)."""
    rows = [r.asDict() for r in schema_triples(nodes, edges).collect()]
    types = [r.asDict() for r in node_type_counts(nodes).collect()]
    payload = json.dumps({"node_types": types, "schema": rows}, indent=1)
    html = (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        "<title>KG schema</title></head><body><h1>Knowledge-graph schema</h1>"
        "<table border='1'><tr><th>source_type</th><th>edge_type</th>"
        "<th>target_type</th><th>triple_count</th></tr>"
        + "".join(
            f"<tr><td>{r['source_type']}</td><td>{r['edge_type']}</td>"
            f"<td>{r['target_type']}</td><td>{r['triple_count']}</td></tr>"
            for r in rows
        )
        + "</table><script type='application/json' id='schema-data'>"
        + payload
        + "</script></body></html>"
    )
    with open(filepath, "w") as f:
        f.write(html)
