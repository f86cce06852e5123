"""Raw-format readers (FIXTURES.md F3) vs verbatim reference-logic
oracles: key set, values, ids, and types must match exactly; property
values exercise None/""/NaN dropping, ints, floats, bools, lists, and
nested dicts."""

import csv
import json
import math

import pytest

from kgw_spark.functions.informative import is_informative_value
from kgw_spark.sources import readers


def _nodes_set(df):
    return {
        (r.id, r.type, json.dumps(json.loads(r.properties), sort_keys=True))
        for r in df.collect()
    }


def _edges_set(df):
    return {
        (
            r.source_id,
            r.target_id,
            r.type,
            json.dumps(json.loads(r.properties), sort_keys=True),
        )
        for r in df.collect()
    }


# ---- is_informative_value truth table (reference tests/test_shared.py:72-77)
def test_is_informative_value():
    assert not is_informative_value(None)
    assert not is_informative_value("")
    assert not is_informative_value(float("nan"))
    assert is_informative_value(0)
    assert is_informative_value(0.0)
    assert is_informative_value(False)
    assert is_informative_value("x")
    assert is_informative_value([1])
    assert is_informative_value({"a": 1})


# ---- hetionet-style JSON ---------------------------------------------------
def test_hetionet_reader(spark, tmp_path):
    doc = {
        "nodes": [
            {
                "identifier": 42,
                "kind": "Gene",
                "name": "G1",
                "data": {"chromosome": "7", "weight": 3.5, "flags": [1, 2], "ok": True},
            },
            {"identifier": "D:1", "kind": "Disease", "name": "D1", "data": {}},
        ],
        "edges": [
            {
                "source_id": ["Gene", 42],
                "target_id": ["Disease", "D:1"],
                "kind": "associates",
                "direction": "both",
                "data": {"unbiased": False, "nested": {"a": [1, {"b": 2}]}},
            }
        ],
    }
    p = tmp_path / "kg.json"
    p.write_text(json.dumps(doc))
    nodes, edges = readers.read_hetionet_json(spark, str(p))

    # oracle: verbatim _hetionet.py:115-147 logic
    exp_nodes = set()
    for item in doc["nodes"]:
        props = {"name": item["name"]}
        props.update(item["data"])
        exp_nodes.add(
            (str(item["identifier"]), str(item["kind"]), json.dumps(props, sort_keys=True))
        )
    exp_edges = set()
    for item in doc["edges"]:
        props = {"direction": item["direction"]}
        props.update(item["data"])
        exp_edges.add(
            (
                str(item["source_id"][1]),
                str(item["target_id"][1]),
                item["kind"],
                json.dumps(props, sort_keys=True),
            )
        )
    assert _nodes_set(nodes) == exp_nodes
    assert _edges_set(edges) == exp_edges


# ---- hald-style JSON pair --------------------------------------------------
def test_hald_reader(spark, tmp_path):
    nodes_doc = {
        "k1": [{"entity": "E1", "type": "Gene", "desc": "x", "empty": "", "n": None}],
        "k2": [{"entity": "E2", "type": "Drug", "score": 0.5, "tags": ["a", "b"]}],
    }
    edges_doc = {
        "r1": {
            "source entity": "E1",
            "target entity": "E2",
            "relationship": "binds",
            "source": "redundant",
            "pmid": 123,
            "blank": "",
        }
    }
    np_, ep_ = tmp_path / "n.json", tmp_path / "e.json"
    np_.write_text(json.dumps(nodes_doc))
    ep_.write_text(json.dumps(edges_doc))
    nodes, edges = readers.read_hald_json(spark, str(np_), str(ep_))

    exp_nodes = set()
    for entry in nodes_doc.values():
        entry = entry[0]
        props = {
            k: v
            for k, v in entry.items()
            if k not in ("entity", "type") and is_informative_value(v)
        }
        exp_nodes.add((entry["entity"], entry["type"], json.dumps(props, sort_keys=True)))
    skipped = [
        "source entity", "target entity", "relationship",
        "source", "target", "source type", "target type",
    ]
    exp_edges = set()
    for entry in edges_doc.values():
        props = {
            k: v for k, v in entry.items() if k not in skipped and is_informative_value(v)
        }
        exp_edges.add(
            (
                entry["source entity"],
                entry["target entity"],
                entry["relationship"],
                json.dumps(props, sort_keys=True),
            )
        )
    assert _nodes_set(nodes) == exp_nodes
    assert _edges_set(edges) == exp_edges


# ---- monarch-style TSV pair ------------------------------------------------
def test_monarch_reader(spark, tmp_path):
    nrows = [
        ["id", "category", "label", "xref", "note"],
        ["n1", "gene", "BRCA1", "hgnc:1100", ""],
        ["n2", "disease", "cancer", "", "rare"],
    ]
    erows = [
        ["subject", "predicate", "object", "evidence", "src"],
        ["n1", "causes", "n2", "inferred", ""],
    ]
    np_, ep_ = tmp_path / "nodes.tsv", tmp_path / "edges.tsv"
    for path, rows in ((np_, nrows), (ep_, erows)):
        with open(path, "w", newline="") as f:
            csv.writer(f, delimiter="\t").writerows(rows)
    nodes, edges = readers.read_monarch_tsv(spark, str(np_), str(ep_))

    exp_nodes = set()
    for row in nrows[1:]:
        props = {
            k: v
            for k, v in zip(nrows[0], row)
            if k not in ("id", "category") and is_informative_value(v)
        }
        exp_nodes.add((row[0], row[1], json.dumps(props, sort_keys=True)))
    assert _nodes_set(nodes) == exp_nodes
    got_e = _edges_set(edges)
    assert got_e == {
        ("n1", "n2", "causes", json.dumps({"evidence": "inferred"}, sort_keys=True))
    }


# ---- primekg-style CSV + annotations ----------------------------------------
def test_primekg_reader(spark, tmp_path):
    header = [
        "relation", "display_relation", "x_index", "x_id", "x_type", "x_name",
        "x_source", "y_index", "y_id", "y_type", "y_name", "y_source",
    ]
    rows = [
        ["ppi", "interacts", "0", "9796", "gene", "PHYHIP", "NCBI",
         "1", "56992", "gene", "KIF15", "NCBI"],
        ["indication", "", "2", "DB01", "drug", "aspirin", "DrugBank",
         "0", "9796", "gene", "PHYHIP", "NCBI"],
    ]
    kg = tmp_path / "kg.csv"
    with open(kg, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)
    ann = tmp_path / "ann.csv"
    with open(ann, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["node_index", "mondo_id", "group"])
        w.writerow(["2", "m:77", ""])
    nodes, edges = readers.read_primekg_csv(spark, str(kg), [str(ann)])

    got_n = {r.id: (r.type, json.loads(r.properties)) for r in nodes.collect()}
    assert got_n["0"] == (
        "gene",
        {"identifier": "9796", "name": "PHYHIP", "source": "NCBI"},
    )
    assert got_n["2"] == (
        "drug",
        {"identifier": "DB01", "name": "aspirin", "source": "DrugBank", "mondo_id": "m:77"},
    )
    assert len(got_n) == 3
    got_e = _edges_set(edges)
    assert got_e == {
        ("0", "1", "ppi", json.dumps({"display_relation": "interacts"}, sort_keys=True)),
        ("2", "0", "indication", "{}"),
    }


def test_primekg_annotation_key_collision_matches_dict_update(spark, tmp_path):
    """An annotation key colliding with a base property must produce
    byte-exact dict.update output (_primekg.py:218-219): value replaced
    in place, no duplicate keys, new keys appended in annotation order."""
    header = [
        "relation", "display_relation", "x_index", "x_id", "x_type", "x_name",
        "x_source", "y_index", "y_id", "y_type", "y_name", "y_source",
    ]
    rows = [["ppi", "", "7", "id7", "gene", "G7", "NCBI",
             "8", "id8", "gene", "G8", "NCBI"]]
    kg = tmp_path / "kg.csv"
    with open(kg, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)
    ann = tmp_path / "ann.csv"
    with open(ann, "w", newline="") as f:
        w = csv.writer(f)
        # 'name' collides with the base property; 'extra' is new
        w.writerow(["node_index", "name", "extra"])
        w.writerow(["7", "OVERRIDDEN", "e1"])
    nodes, _ = readers.read_primekg_csv(spark, str(kg), [str(ann)])
    props = {r.id: r.properties for r in nodes.collect()}
    # reference logic: dict.update on the base dict
    expected = {"identifier": "id7", "name": "G7", "source": "NCBI"}
    expected.update({"name": "OVERRIDDEN", "extra": "e1"})
    assert props["7"] == json.dumps(expected, separators=(",", ":"), ensure_ascii=False)
    parsed = json.loads(props["7"])
    assert parsed["name"] == "OVERRIDDEN" and parsed["extra"] == "e1"
    assert list(parsed) == ["identifier", "name", "source", "extra"]


def test_primekg_x_side_keeps_uninformative_values(spark, tmp_path):
    """The reference filters only the y-side properties
    (_primekg.py:210-239): an x-side node with empty name/source keeps
    the empty strings; the same node first seen on the y side drops
    them."""
    header = [
        "relation", "display_relation", "x_index", "x_id", "x_type", "x_name",
        "x_source", "y_index", "y_id", "y_type", "y_name", "y_source",
    ]
    rows = [["r", "", "10", "idA", "gene", "", "",
             "11", "idB", "gene", "", ""]]
    kg = tmp_path / "kg.csv"
    with open(kg, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)
    nodes, _ = readers.read_primekg_csv(spark, str(kg))
    got = {r.id: json.loads(r.properties) for r in nodes.collect()}
    assert got["10"] == {"identifier": "idA", "name": "", "source": ""}
    assert got["11"] == {"identifier": "idB"}


# ---- oregano-style bare triples + annotations --------------------------------
def test_oregano_reader(spark, tmp_path):
    triples = [
        ["COMPOUND:c1", "has_target", "GENE:g1"],
        ["COMPOUND:c1", "has_target", "GENE:g1"],  # duplicate triple
        ["GENE:g1", "has_code", "plaincode"],
    ]
    kg = tmp_path / "kg.tsv"
    with open(kg, "w", newline="") as f:
        csv.writer(f, delimiter="\t").writerows(triples)
    ann = tmp_path / "ann.tsv"
    with open(ann, "w", newline="") as f:
        w = csv.writer(f, delimiter="\t")
        w.writerow(["name", "label ", "desc"])
        w.writerow(["COMPOUND:c1", " Aspirin ", ""])
    nodes, edges = readers.read_oregano_tsv(spark, str(kg), [str(ann)])

    got_n = {r.id: (r.type, json.loads(r.properties)) for r in nodes.collect()}
    assert got_n == {
        "COMPOUND:c1": ("compound", {"label": "Aspirin"}),
        "GENE:g1": ("gene", {}),
        "plaincode": ("code", {}),
    }
    got_e = _edges_set(edges)
    assert got_e == {
        ("COMPOUND:c1", "GENE:g1", "has_target", "{}"),
        ("GENE:g1", "plaincode", "has_code", "{}"),
    }


# ---- pharmebinet-style TSV with embedded JSON --------------------------------
def test_pharmebinet_reader(spark, tmp_path):
    nrows = [
        ["node_id", "labels", "properties", "name", "identifier", "resource",
         "license", "source", "url"],
        ["1", "Gene", '{"synonyms":["a","b"],"n":7}', "G1", "id1", "res", "",
         "src", ""],
    ]
    erows = [
        ["start_id", "end_id", "type", "properties", "relationship_id",
         "resource", "license", "source", "url"],
        ["1", "1", "SELF", '{"w":1.5}', "r9", "", "MIT", "", ""],
    ]
    np_, ep_ = tmp_path / "nodes.tsv", tmp_path / "edges.tsv"
    for path, rows in ((np_, nrows), (ep_, erows)):
        with open(path, "w", newline="") as f:
            csv.writer(f, delimiter="\t").writerows(rows)
    nodes, edges = readers.read_pharmebinet_tsv(spark, str(np_), str(ep_))

    n = nodes.collect()[0]
    props = json.loads(n.properties)
    # nodes: extras added unconditionally, even empty ones
    assert props == {
        "synonyms": ["a", "b"], "n": 7, "name": "G1", "identifier": "id1",
        "resource": "res", "license": None, "source": "src", "url": None,
    }
    e = edges.collect()[0]
    eprops = json.loads(e.properties)
    # edges: extras only when informative
    assert eprops == {"w": 1.5, "relationship_id": "r9", "license": "MIT"}
    assert (e.source_id, e.target_id, e.type) == ("1", "1", "SELF")


# ---- ckg-style CSV pair (post-Neo4j-export shape) -----------------------------
def test_ckg_reader(spark, tmp_path):
    nrows = [
        ["_id", "_labels", "properties"],
        ["7", "Protein", '{"name":"P1","taxid":9606,"none":null,"empty":""}'],
    ]
    erows = [
        ["_start", "_end", "_type", "properties"],
        ["7", "7", "SELF_REF", '{"score":0.9,"bad":""}'],
    ]
    np_, ep_ = tmp_path / "ckg_nodes.csv", tmp_path / "ckg_edges.csv"
    for path, rows in ((np_, nrows), (ep_, erows)):
        with open(path, "w", newline="") as f:
            csv.writer(f).writerows(rows)
    nodes, edges = readers.read_ckg_csv(spark, str(np_), str(ep_))
    n = nodes.collect()[0]
    assert (n.id, n.type) == ("7", "Protein")
    assert json.loads(n.properties) == {"name": "P1", "taxid": 9606}
    e = edges.collect()[0]
    assert (e.source_id, e.target_id, e.type) == ("7", "7", "SELF_REF")
    assert json.loads(e.properties) == {"score": 0.9}
