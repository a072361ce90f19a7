"""S8: remote archive fetch + extract — the ingestion-prep stage.

Reference behavior (``/root/reference/src/utils/utils.py:97-145``):
``download_dataset`` pulls a Kaggle zip if the local path is absent
(idempotent skip otherwise), ``unzip_dataset`` extracts it if not yet
extracted, ``delete_file`` cleans the archive up. The Kaggle transport
itself needs credentials the engine cannot assume, so this module
keeps the reference's CONTRACT — idempotent fetch-if-absent,
extract-if-absent, cleanup — over a plain HTTP(S) transport via
stdlib urllib, which also covers the arXiv-snapshot-over-HTTP case.

This is deliberately driver-side, single-machine code: archive fetch
is pipeline PREP, not a distributed operator (one zip, once, before
any scan). The distributed story starts the moment the extracted files
exist — ``readers.read_jsonl`` and friends take over, and at 100 TB
the fetch stage is replaced by the data already living on object
storage (the reference's own weekly-refresh DAG has the same shape:
one download task, then table-parallel work).

Safety: extraction refuses path-traversal member names (``../`` or
absolute paths — zip-slip), and fetch retries transient failures with
capped exponential backoff (the same bounded-retry discipline as
``operators/http_enrich``).
"""

from __future__ import annotations

import os
import time
import urllib.request
import zipfile


def fetch_if_absent(
    url: str,
    dest_path: str,
    retries: int = 3,
    backoff_s: float = 0.5,
    timeout_s: float = 30.0,
) -> bool:
    """Download ``url`` to ``dest_path`` unless it already exists
    (reference utils.py:102 idempotency). Returns True if a download
    happened. Partial downloads never land: bytes stream to a ``.part``
    file renamed only on success."""
    if os.path.exists(dest_path):
        return False
    os.makedirs(os.path.dirname(dest_path) or ".", exist_ok=True)
    part = dest_path + ".part"
    last_err: Exception | None = None
    for attempt in range(retries):
        try:
            with urllib.request.urlopen(url, timeout=timeout_s) as resp, open(
                part, "wb"
            ) as out:
                while True:
                    chunk = resp.read(1 << 20)
                    if not chunk:
                        break
                    out.write(chunk)
            os.replace(part, dest_path)
            return True
        except Exception as e:  # noqa: BLE001 — transport errors retry
            last_err = e
            if os.path.exists(part):
                os.remove(part)
            if attempt + 1 < retries:
                time.sleep(backoff_s * (2**attempt))
    raise ConnectionError(f"fetch failed after {retries} tries: {last_err}")


def extract_if_absent(archive_path: str, extracted_dir: str) -> list[str]:
    """Extract ``archive_path`` into ``extracted_dir`` unless the
    directory already exists (reference utils.py:117 idempotency).
    Returns the extracted member names (empty on skip). Rejects
    zip-slip member paths."""
    if not os.path.exists(archive_path) or os.path.exists(extracted_dir):
        return []
    with zipfile.ZipFile(archive_path, "r") as zf:
        for name in zf.namelist():
            norm = os.path.normpath(name)
            if norm.startswith("..") or os.path.isabs(norm):
                raise ValueError(f"unsafe archive member path: {name!r}")
        zf.extractall(extracted_dir)
        return zf.namelist()


def cleanup_archive(archive_path: str) -> bool:
    """Delete the downloaded archive (reference utils.py:129-145
    ``delete_file``); True if a file was removed."""
    if os.path.exists(archive_path):
        os.remove(archive_path)
        return True
    return False


def fetch_extract_cleanup(url: str, work_dir: str) -> str:
    """The full S8 stage as one call: fetch → extract → delete archive.
    Returns the extracted directory, ready for a Spark scan."""
    archive = os.path.join(work_dir, "dataset.zip")
    extracted = os.path.join(work_dir, "extracted")
    fetch_if_absent(url, archive)
    extract_if_absent(archive, extracted)
    cleanup_archive(archive)
    return extracted
