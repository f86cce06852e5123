"""E10 — version/metadata discovery with a pluggable transport.

The reference discovers dataset versions and per-file download metadata
live (kgw/_shared/extract.py:220-350): Figshare and Mendeley REST APIs,
Monarch HTML index scraping, plus hardcoded maps for Hetionet /
PharMeBINet and a mirrored metadata.json for PrimeKG. This module ports
those *semantics* — version list construction and ordering,
``latest``-resolution (last element, kgw/_shared/base.py:44-49),
metadata dict shapes, memoization — behind a ``transport`` callable
``url -> bytes`` so they run offline against recorded HTTP fixtures
(tests) or a real HTTP client (ingest-time). Nothing here is a Spark
operator; it is driver-side ingest plumbing.
"""

from __future__ import annotations

import json
import re
from html.parser import HTMLParser


def http_transport(retries: int = 3, delay_sec: float = 1.0):
    """Live transport with the reference's retry discipline
    (extract.py:103-117: up to ``retries`` attempts, fixed delay,
    re-raise the last error)."""
    import time
    import urllib.request

    def fetch(url: str) -> bytes:
        last = None
        for _ in range(retries):
            try:
                with urllib.request.urlopen(url, timeout=30) as r:
                    return r.read()
            except Exception as e:  # noqa: BLE001 — retry any transport error
                last = e
                time.sleep(delay_sec)
        raise last

    return fetch


def _offline(url: str) -> bytes:
    raise RuntimeError(
        "metadata discovery needs a transport: pass transport="
        "http_transport() for live access, or a recorded-fixture "
        f"callable (requested: {url})"
    )


class _Anchors(HTMLParser):
    """Collect (href, text) for every <a> — the subset of BeautifulSoup
    the reference's Monarch scraper uses (extract.py:269-301)."""

    def __init__(self):
        super().__init__()
        self.links: list[tuple[str | None, str]] = []
        self._href: str | None = None
        self._text: list[str] = []
        self._depth = 0

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            self._href = dict(attrs).get("href")
            self._text = []
            self._depth += 1

    def handle_data(self, data):
        if self._depth:
            self._text.append(data)

    def handle_endtag(self, tag):
        if tag == "a" and self._depth:
            self._depth -= 1
            self.links.append((self._href, "".join(self._text).strip()))


class MetadataFetcher:
    """Base fetcher: memoized get_versions / get_metadata plus
    ``latest``-resolution, matching the reference's per-project
    MetadataFetcher classes (e.g. kgw/biomedicine/_hald.py:11-46)."""

    def __init__(self, transport=None):
        self._transport = transport or _offline
        self._cache: dict[str, object] = {}

    # subclasses implement the uncached fetches
    def _fetch_versions(self) -> list[str]:
        raise NotImplementedError

    def _fetch_metadata(self, version: str) -> dict:
        raise NotImplementedError

    def get_versions(self) -> list[str]:
        if "versions" not in self._cache:
            self._cache["versions"] = self._fetch_versions()
        return list(self._cache["versions"])

    def resolve_version(self, version: str) -> str:
        """'latest' → last listed version (base.py:44-49); anything not
        listed raises with the reference's message shape."""
        version = str(version)
        versions = self.get_versions()
        if version.lower() == "latest":
            return versions[-1]
        if version not in versions:
            raise ValueError(
                f'Version "{version}" is not valid.\nAvailable options: {versions}'
            )
        return version

    def get_metadata(self, version: str) -> dict:
        versions = self.get_versions()
        if version not in versions:
            raise ValueError(
                f'Version "{version}" is not valid.\nAvailable options: {versions}'
            )
        key = f"metadata_{version}"
        if key not in self._cache:
            self._cache[key] = self._fetch_metadata(version)
        return self._cache[key]


class FigshareMetadataFetcher(MetadataFetcher):
    """extract.py:220-240 — article versions + per-file md5/url/size."""

    def __init__(self, dataset_id: int, transport=None):
        super().__init__(transport)
        self.dataset_id = dataset_id

    def _fetch_versions(self) -> list[str]:
        url = f"https://api.figshare.com/v2/articles/{self.dataset_id}/versions"
        raw = json.loads(self._transport(url))
        return [str(entry["version"]) for entry in raw]

    def _fetch_metadata(self, version: str) -> dict:
        url = (
            f"https://api.figshare.com/v2/articles/{self.dataset_id}"
            f"/versions/{version}"
        )
        raw = json.loads(self._transport(url))
        date = raw["created_date"]
        return {
            entry["name"]: dict(
                version=version,
                date=date,
                url=entry["download_url"],
                md5=entry["computed_md5"],
                size=entry["size"],
            )
            for entry in raw["files"]
        }


class MendeleyMetadataFetcher(MetadataFetcher):
    """extract.py:243-268 — dataset versions + per-file sha256/url."""

    def __init__(self, dataset_id: str, transport=None):
        super().__init__(transport)
        self.dataset_id = dataset_id

    def _fetch_versions(self) -> list[str]:
        url = (
            "https://data.mendeley.com/public-api/datasets/"
            f"{self.dataset_id}/versions"
        )
        raw = json.loads(self._transport(url))
        return [str(entry["version"]) for entry in raw]

    def _fetch_metadata(self, version: str) -> dict:
        url = (
            "https://data.mendeley.com/public-api/datasets/"
            f"{self.dataset_id}/files?folder_id=root&version={version}"
        )
        raw = json.loads(self._transport(url))
        return {
            entry["filename"]: dict(
                version=version,
                date=entry["content_details"]["created_date"],
                url=entry["content_details"]["download_url"],
                size=entry["size"],
                sha256=entry["content_details"]["sha256_hash"],
            )
            for entry in raw
        }


_MONARCH_DATE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_MONARCH_URL = re.compile(
    r"^https://data\.monarchinitiative\.org/monarch-kg/\d{4}-\d{2}-\d{2}/index\.html$"
)


class MonarchMetadataFetcher(MetadataFetcher):
    """extract.py:269-301 — HTML index scrape. A version link counts
    only when the anchor text is a date, the href matches the canonical
    per-version index URL, and the text appears in the href; file
    entries are anchors whose text contains '.' but not '..'."""

    def _anchors(self, url: str):
        p = _Anchors()
        p.feed(self._transport(url).decode("utf-8", errors="replace"))
        return p.links

    def _fetch_versions(self) -> list[str]:
        url = "https://data.monarchinitiative.org/monarch-kg/index.html"
        versions = []
        for href, text in self._anchors(url):
            if (
                href
                and _MONARCH_DATE.match(text)
                and _MONARCH_URL.match(href)
                and text in href
            ):
                versions.append(text)
        return versions

    def _fetch_metadata(self, version: str) -> dict:
        url = f"https://data.monarchinitiative.org/monarch-kg/{version}/index.html"
        data = {}
        for href, text in self._anchors(url):
            if href and "." in text and ".." not in text:
                data[text] = dict(version=version, date=version, url=href)
        return data


class PrimeKGMetadataFetcher(MetadataFetcher):
    """extract.py:322-331 — a mirrored metadata.json keyed by version."""

    MIRROR_URL = (
        "https://raw.githubusercontent.com/robert-haas/"
        "primekg-mirror/main/metadata.json"
    )

    def _mirror(self) -> dict:
        if "mirror" not in self._cache:
            self._cache["mirror"] = json.loads(self._transport(self.MIRROR_URL))
        return self._cache["mirror"]

    def _fetch_versions(self) -> list[str]:
        return [str(v) for v in self._mirror()]

    def _fetch_metadata(self, version: str) -> dict:
        return self._mirror()[version]


class StaticMetadataFetcher(MetadataFetcher):
    """Hardcoded version→metadata maps — the reference's Hetionet
    (single version, extract.py:334-343) and PharMeBINet (two versions
    with different file layouts, extract.py:346-369) pattern."""

    def __init__(self, metadata_by_version: dict[str, dict]):
        super().__init__(transport=lambda url: (_ for _ in ()).throw(
            RuntimeError("static fetcher performs no requests")
        ))
        self._static = dict(metadata_by_version)

    def _fetch_versions(self) -> list[str]:
        return [str(v) for v in self._static]

    def _fetch_metadata(self, version: str) -> dict:
        return self._static[version]


HETIONET_FETCHER = StaticMetadataFetcher(
    {
        "1.0": {
            "hetionet-v1.0.json.bz2": {
                "url": (
                    "https://github.com/hetio/hetionet/raw/refs/heads/main/"
                    "hetnet/json/hetionet-v1.0.json.bz2"
                ),
                "md5": "cd6268d361592de9d2b2f4639a34a3c7",
            }
        }
    }
)
