"""Project/run workflow API: output generation, memoized resume,
arg-matrix validation (reference tests/test_workflows.py shapes)."""

import json
import os
import sqlite3

import pytest

from kgw_spark.api import Project, RawGraphProject, run
from kgw_spark.sources import readers


@pytest.fixture()
def hald_project(spark, tmp_path):
    nodes_doc = {
        "k1": [{"entity": "E1", "type": "Gene", "d": 1}],
        "k2": [{"entity": "E2", "type": "Drug"}],
    }
    edges_doc = {
        "r": {"source entity": "E1", "target entity": "E2", "relationship": "binds"}
    }
    (tmp_path / "n.json").write_text(json.dumps(nodes_doc))
    (tmp_path / "e.json").write_text(json.dumps(edges_doc))
    return RawGraphProject(
        "hald_fixture",
        load=lambda s: readers.read_hald_json(
            s, str(tmp_path / "n.json"), str(tmp_path / "e.json")
        ),
        version="1",
        workdir=str(tmp_path / "work"),
    )


def test_full_workflow(spark, hald_project):
    p = hald_project
    p.to_sqlite()
    p.to_statistics()
    p.to_schema()
    p.to_sql()
    p.to_csv()
    p.to_jsonl()
    p.to_metta("spo")
    p.to_metta("properties_aggregated")
    p.to_metta("properties_expanded")
    p.to_graphml()
    assert run(spark, [p])

    r = p.results_dir
    expected = [
        "kg.sqlite", "statistics.json", "schema.html", "kg.sql",
        "kg_nodes.csv", "kg_edges.csv", "kg_nodes.jsonl", "kg_edges.jsonl",
        "kg_spo.metta", "kg_properties_aggregated.metta",
        "kg_properties_expanded.metta", "kg.graphml",
    ]
    for f in expected:
        assert os.path.exists(os.path.join(r, f)), f

    stats = json.load(open(os.path.join(r, "statistics.json")))
    assert stats["num_nodes"] == 2 and stats["num_edges"] == 1
    conn = sqlite3.connect(os.path.join(r, "kg.sqlite"))
    assert conn.execute("SELECT COUNT(*) FROM nodes").fetchone()[0] == 2

    # memoized resume: rerun touches nothing (mtimes unchanged)
    mtimes = {f: os.path.getmtime(os.path.join(r, f)) for f in expected}
    assert run(spark, p)  # single project accepted too
    assert mtimes == {f: os.path.getmtime(os.path.join(r, f)) for f in expected}


def test_run_arg_validation(spark):
    with pytest.raises(ValueError, match="Invalid workflow"):
        run(spark, "nonsense")
    with pytest.raises(ValueError, match="Invalid workflow item"):
        run(spark, [42])
    assert run(spark, [])  # empty workflow is a no-op success
    assert run(spark, set())


def test_invalid_metta_representation(hald_project):
    with pytest.raises(ValueError, match="Unknown representation"):
        hald_project.to_metta("bogus")


def test_distributed_outputs_match_driver_renders(spark, hald_project, tmp_path):
    """distributed=True exporters write sharded directories whose
    concatenated lines equal the single-file driver renders."""
    import glob
    import os

    proj = hald_project
    proj._outputs = []
    proj.to_graphml().to_graphml(distributed=True)
    proj.to_sql().to_sql(distributed=True)
    proj.to_metta("properties_expanded").to_metta(
        "properties_expanded", distributed=True
    )
    from kgw_spark import api

    assert api.run(spark, proj)
    for single, sharded in (
        ("kg.graphml", "kg_graphml"),
        ("kg.sql", "kg_sql"),
        ("kg_properties_expanded.metta", "kg_properties_expanded_metta"),
    ):
        driver = open(os.path.join(proj.results_dir, single)).read()
        parts = sorted(glob.glob(os.path.join(proj.results_dir, sharded, "part-*")))
        assert parts, sharded
        dist = "".join(open(f).read() for f in parts)
        assert dist == driver, sharded
