"""Unified property-graph data model.

The single intermediate representation for every KG, mirroring the
reference's invariant two-table relational encoding
(kgw/_shared/transform.py:10-30) — all fixed columns are strings and
``properties`` is a schema-less JSON object serialized to a string
(exact fidelity for nested values, parsed on demand with ``from_json``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

NODES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("properties", T.StringType(), True),
    ]
)

EDGES_SCHEMA = T.StructType(
    [
        T.StructField("source_id", T.StringType(), False),
        T.StructField("target_id", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("properties", T.StringType(), True),
    ]
)

# North-rule primary input (BASELINE.json input_hint): a table of
# source-code repository files.
CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
        # per-row invariant checked at the extraction boundary
        # (reference analog: checksum validation kgw/_shared/extract.py:203-214)
        T.StructField("content_sha256", T.StringType(), False),
    ]
)

# Raw mention triples as emitted by the extraction stage, before
# linking/canonicalization. Lineage columns are carried through every
# stage per the north rule.
MENTIONS_SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("content_sha256", T.StringType(), False),
    ]
)

LINEAGE_COLS = ["repo", "path", "commit", "content_sha256"]


def triple_view(edges: DataFrame) -> DataFrame:
    """The (subj, pred, obj) view of the edges table — the canonical
    triple serialization order of the reference's MeTTa "spo" export
    (kgw/_shared/load.py:600-605)."""
    return edges.select(
        F.col("source_id").alias("subj"),
        F.col("type").alias("pred"),
        F.col("target_id").alias("obj"),
    )


def node_type_from_id(id_col: str = "id"):
    """Node type derived from the id prefix before ``:`` (lowercased),
    falling back to ``"code"`` when the id has no prefix — reference
    semantics from kgw/biomedicine/_oregano.py:143-155 (T6)."""
    c = F.col(id_col)
    return F.when(
        F.instr(c, ":") > 0, F.lower(F.split(c, ":", 2).getItem(0))
    ).otherwise(F.lit("code"))
