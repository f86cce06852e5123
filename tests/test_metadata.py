"""E10 metadata discovery replayed offline against recorded HTTP
fixtures shaped like the real services (reference semantics:
kgw/_shared/extract.py:220-350, version resolution base.py:44-49)."""

import json

import pytest

from kgw_spark.sources.metadata import (
    HETIONET_FETCHER,
    FigshareMetadataFetcher,
    MendeleyMetadataFetcher,
    MonarchMetadataFetcher,
    PrimeKGMetadataFetcher,
    StaticMetadataFetcher,
)


class Recorder:
    """Fixture transport: url → canned bytes, counting requests."""

    def __init__(self, responses):
        self.responses = responses
        self.calls = []

    def __call__(self, url):
        self.calls.append(url)
        return self.responses[url]


FIGSHARE_VERSIONS = json.dumps([{"version": 1}, {"version": 2}, {"version": 3}])
FIGSHARE_V3 = json.dumps(
    {
        "created_date": "2023-05-01T10:00:00Z",
        "files": [
            {
                "name": "kg.json.bz2",
                "download_url": "https://ndownloader.figshare.com/files/111",
                "size": 12345,
                "computed_md5": "aa11",
            },
            {
                "name": "README.txt",
                "download_url": "https://ndownloader.figshare.com/files/112",
                "size": 42,
                "computed_md5": "bb22",
            },
        ],
    }
)


def test_figshare_versions_order_and_latest():
    rec = Recorder(
        {"https://api.figshare.com/v2/articles/22828196/versions": FIGSHARE_VERSIONS}
    )
    f = FigshareMetadataFetcher(22828196, transport=rec)
    assert f.get_versions() == ["1", "2", "3"]
    assert f.resolve_version("latest") == "3"
    assert f.resolve_version("2") == "2"
    with pytest.raises(ValueError, match='Version "9" is not valid'):
        f.resolve_version("9")
    # memoized: three calls above, one request
    f.get_versions()
    assert len(rec.calls) == 1


def test_figshare_metadata_shape():
    rec = Recorder(
        {
            "https://api.figshare.com/v2/articles/22828196/versions": FIGSHARE_VERSIONS,
            "https://api.figshare.com/v2/articles/22828196/versions/3": FIGSHARE_V3,
        }
    )
    f = FigshareMetadataFetcher(22828196, transport=rec)
    md = f.get_metadata("3")
    assert md["kg.json.bz2"] == {
        "version": "3",
        "date": "2023-05-01T10:00:00Z",
        "url": "https://ndownloader.figshare.com/files/111",
        "md5": "aa11",
        "size": 12345,
    }
    f.get_metadata("3")
    assert len([u for u in rec.calls if u.endswith("/versions/3")]) == 1
    with pytest.raises(ValueError):
        f.get_metadata("9")


def test_mendeley_metadata_shape():
    ds = "abc123"
    versions_url = f"https://data.mendeley.com/public-api/datasets/{ds}/versions"
    files_url = (
        f"https://data.mendeley.com/public-api/datasets/{ds}"
        "/files?folder_id=root&version=2"
    )
    rec = Recorder(
        {
            versions_url: json.dumps([{"version": 1}, {"version": 2}]),
            files_url: json.dumps(
                [
                    {
                        "filename": "nodes.tsv.gz",
                        "size": 777,
                        "content_details": {
                            "created_date": "2022-01-02",
                            "download_url": "https://mendeley.example/dl/1",
                            "sha256_hash": "cafe",
                        },
                    }
                ]
            ),
        }
    )
    m = MendeleyMetadataFetcher(ds, transport=rec)
    assert m.get_versions() == ["1", "2"]
    assert m.get_metadata("2")["nodes.tsv.gz"] == {
        "version": "2",
        "date": "2022-01-02",
        "url": "https://mendeley.example/dl/1",
        "size": 777,
        "sha256": "cafe",
    }


MONARCH_INDEX = b"""
<html><body>
<a href="https://data.monarchinitiative.org/monarch-kg/2024-03-01/index.html">2024-03-01</a>
<a href="https://data.monarchinitiative.org/monarch-kg/2024-04-09/index.html">2024-04-09</a>
<a href="https://elsewhere.example/2024-05-01/index.html">2024-05-01</a>
<a href="https://data.monarchinitiative.org/monarch-kg/2024-06-01/index.html">not-a-date</a>
<a href="https://data.monarchinitiative.org/monarch-kg/latest/index.html">latest</a>
</body></html>
"""
MONARCH_V = b"""
<html><body>
<a href="https://data.monarchinitiative.org/monarch-kg/2024-04-09/monarch-kg.tar.gz">monarch-kg.tar.gz</a>
<a href="../index.html">..</a>
<a href="https://data.monarchinitiative.org/monarch-kg/2024-04-09/">subdir</a>
</body></html>
"""


def test_monarch_html_scrape_filters_and_latest():
    rec = Recorder(
        {
            "https://data.monarchinitiative.org/monarch-kg/index.html": MONARCH_INDEX,
            "https://data.monarchinitiative.org/monarch-kg/2024-04-09/index.html": MONARCH_V,
        }
    )
    m = MonarchMetadataFetcher(transport=rec)
    # decoys rejected: foreign host, non-date text, 'latest' link
    assert m.get_versions() == ["2024-03-01", "2024-04-09"]
    assert m.resolve_version("latest") == "2024-04-09"
    md = m.get_metadata("2024-04-09")
    # '..' and extension-less anchors are not files
    assert list(md) == ["monarch-kg.tar.gz"]
    assert md["monarch-kg.tar.gz"] == {
        "version": "2024-04-09",
        "date": "2024-04-09",
        "url": "https://data.monarchinitiative.org/monarch-kg/2024-04-09/monarch-kg.tar.gz",
    }


def test_primekg_mirror_single_fetch():
    payload = json.dumps(
        {
            "2.1": {"kg.csv": {"url": "https://mirror.example/kg.csv", "md5": "x"}},
            "2.2": {"kg.csv": {"url": "https://mirror.example/kg2.csv", "md5": "y"}},
        }
    )
    rec = Recorder({PrimeKGMetadataFetcher.MIRROR_URL: payload})
    p = PrimeKGMetadataFetcher(transport=rec)
    assert p.get_versions() == ["2.1", "2.2"]
    assert p.resolve_version("latest") == "2.2"
    assert p.get_metadata("2.1")["kg.csv"]["md5"] == "x"
    # one mirror request serves versions AND both metadata lookups
    p.get_metadata("2.2")
    assert len(rec.calls) == 1


def test_static_fetchers_never_touch_network():
    assert HETIONET_FETCHER.get_versions() == ["1.0"]
    assert HETIONET_FETCHER.resolve_version("latest") == "1.0"
    assert "hetionet-v1.0.json.bz2" in HETIONET_FETCHER.get_metadata("1.0")
    two = StaticMetadataFetcher({"1.0": {"a": {}}, "2.0": {"b": {}}})
    assert two.resolve_version("latest") == "2.0"
    with pytest.raises(ValueError):
        two.get_metadata("3.0")


def test_offline_default_raises_helpfully():
    f = FigshareMetadataFetcher(1)
    with pytest.raises(RuntimeError, match="transport"):
        f.get_versions()


def test_project_uses_pluggable_fetcher(tmp_path):
    from kgw_spark.api import Project

    class P(Project):
        label = "mon"
        metadata_fetcher = StaticMetadataFetcher(
            {"2024-03-01": {}, "2024-04-09": {}}
        )

    p = P(version="latest", workdir=str(tmp_path))
    assert p.version == "2024-04-09"
    assert p.dirpath.endswith("mon_v2024-04-09")
    with pytest.raises(ValueError):
        P(version="1999-01-01", workdir=str(tmp_path))


def test_project_latest_via_recorded_figshare_end_to_end(spark, tmp_path):
    """E10 wired through the api surface: a Project whose
    metadata_fetcher is a FigshareMetadataFetcher over recorded HTTP
    fixtures resolves version='latest' and runs an output end-to-end
    (reference flow: MetadataFetcher.get_versions -> base.py:44-49
    latest-resolution -> Luigi targets)."""
    import json as _json
    import os

    from kgw_spark.api import Project, run

    rec = Recorder(
        {"https://api.figshare.com/v2/articles/22828196/versions": FIGSHARE_VERSIONS}
    )

    class FigshareProject(Project):
        label = "fig"
        metadata_fetcher = FigshareMetadataFetcher(22828196, transport=rec)

        def load(self, spark):
            nodes = spark.createDataFrame(
                [("a:1", "a", None), ("b:2", "b", None)],
                "id string, type string, properties string",
            )
            edges = spark.createDataFrame(
                [("a:1", "b:2", "rel", None)],
                "source_id string, target_id string, type string, properties string",
            )
            return nodes, edges

    p = FigshareProject(version="latest", workdir=str(tmp_path))
    assert p.version == "3"  # latest from the recorded version list
    assert p.dirpath.endswith("fig_v3")
    assert rec.calls  # resolution really went through the fetcher
    p.to_statistics()
    assert run(spark, [p]) is True
    stats = _json.load(open(os.path.join(p.results_dir, "statistics.json")))
    assert stats["num_nodes"] == 2 and stats["num_edges"] == 1
