"""Ingest-boundary utilities: download / retry / checksum / decompress.

Driver-side (not distributed) by design — the reference treats these
as the extract boundary before any engine work (kgw/_shared/extract.py)
and so do we: at production scale the corpus lands in the table store
by other means, and these helpers exist for workflow parity:

- E1 ranged HTTP download with partial-file resume (extract.py:168-200)
- E2 bounded retry wrapper (extract.py:103-117)
- E3 md5/sha256 file checksum validation (extract.py:203-214)
- E4 bz2 / tar.gz / zip decompression (extract.py:82-97)
- E10 version discovery hook (extract.py:220-350) — here a static
  classmethod on Project subclasses instead of live API scraping
"""

from __future__ import annotations

import bz2
import hashlib
import os
import shutil
import tarfile
import time
import urllib.error
import urllib.request
import zipfile


def with_retries(fn, num_retries: int = 3, delay_sec: float = 1.0):
    """Call ``fn`` up to 1+num_retries times; re-raise the last error
    (reference semantics, extract.py:103-117)."""
    last = None
    for attempt in range(num_retries + 1):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — mirror reference behavior
            last = e
            if attempt < num_retries:
                time.sleep(delay_sec)
    raise last


def file_checksum(filepath: str, algorithm: str = "sha256") -> str:
    h = hashlib.new(algorithm)
    with open(filepath, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def validate_checksum(filepath: str, expected: str, algorithm: str = "sha256"):
    got = file_checksum(filepath, algorithm)
    if got != expected:
        raise ValueError(
            f"Checksum mismatch for {filepath}: expected {expected}, got {got}"
        )


def download_file(
    url: str,
    filepath: str,
    checksum: str | None = None,
    algorithm: str = "sha256",
    num_retries: int = 3,
    chunk_size: int = 1 << 20,
) -> str:
    """Ranged download with resume: partial files continue from their
    current size via a Range header; writes to ``.partial`` and renames
    on success (reference extract.py:168-200 + tasks.py:13-28)."""
    partial = filepath + ".partial"

    def attempt():
        start = os.path.getsize(partial) if os.path.exists(partial) else 0
        req = urllib.request.Request(url)
        if start:
            req.add_header("Range", f"bytes={start}-")
        try:
            with urllib.request.urlopen(req) as resp:
                # append only if the server honored the Range (206);
                # a 200 means full content — restart from scratch
                mode = "ab" if (start and resp.status == 206) else "wb"
                with open(partial, mode) as f:
                    while True:
                        chunk = resp.read(chunk_size)
                        if not chunk:
                            break
                        f.write(chunk)
        except urllib.error.HTTPError as e:
            if e.code == 416 and start:  # already complete
                return
            raise

    with_retries(attempt, num_retries=num_retries)
    if checksum:
        validate_checksum(partial, checksum, algorithm)
    os.replace(partial, filepath)
    return filepath


def decompress(filepath: str, target_dir: str | None = None) -> str:
    """Inflate bz2 / tar.gz / zip next to the source
    (reference extract.py:82-97)."""
    target_dir = target_dir or os.path.dirname(os.path.abspath(filepath))
    os.makedirs(target_dir, exist_ok=True)
    if filepath.endswith(".tar.gz") or filepath.endswith(".tgz"):
        with tarfile.open(filepath, "r:gz") as tf:
            tf.extractall(target_dir, filter="data")
        return target_dir
    if filepath.endswith(".zip"):
        with zipfile.ZipFile(filepath) as zf:
            zf.extractall(target_dir)
        return target_dir
    if filepath.endswith(".bz2"):
        out = os.path.join(
            target_dir, os.path.basename(filepath)[: -len(".bz2")]
        )
        with bz2.open(filepath, "rb") as src, open(out, "wb") as dst:
            shutil.copyfileobj(src, dst)
        return out
    raise ValueError(f"Unsupported archive format: {filepath}")
