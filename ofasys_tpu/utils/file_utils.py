"""File/cache utilities (reference ofasys/utils/file_utils.py, 375 LoC +
oss.py + file_io.py).

``cached_path`` resolves local paths, file:// URLs, and (when the host has
egress) http(s) downloads into $OFA_CACHE_HOME with etag-style metadata;
``local_file_lock`` is the flock-based cross-process lock used around index
building and cache writes. Object-store schemes (oss://) are recognized and
dispatched to a pluggable fetcher so Aliyun-style readers can be attached
without hard dependencies.
"""

from __future__ import annotations

import contextlib
import fcntl
import hashlib
import json
import os
import shutil
import urllib.request
from typing import Callable, Dict, Optional

_SCHEME_FETCHERS: Dict[str, Callable[[str, str], None]] = {}


def cache_home() -> str:
    home = os.environ.get("OFA_CACHE_HOME", os.path.expanduser("~/.cache/ofasys_tpu"))
    os.makedirs(home, exist_ok=True)
    return home


@contextlib.contextmanager
def local_file_lock(path: str):
    """flock-based lock (reference utils/file_utils.py local_file_lock)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        fcntl.flock(f, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(f, fcntl.LOCK_UN)


def register_scheme_fetcher(scheme: str, fetch: Callable[[str, str], None]):
    """Attach a fetcher for e.g. 'oss' (reference utils/oss.py role):
    fetch(url, local_destination)."""
    _SCHEME_FETCHERS[scheme] = fetch


def cached_path(url_or_path: str, cache_dir: Optional[str] = None) -> str:
    """Resolve to a local filesystem path, downloading into the cache when
    the source is remote (reference cached_path)."""
    if os.path.exists(url_or_path):
        return url_or_path
    if url_or_path.startswith("file://"):
        return url_or_path[len("file://"):]
    scheme = url_or_path.split("://", 1)[0] if "://" in url_or_path else ""
    if not scheme:
        raise FileNotFoundError(url_or_path)
    cache = cache_dir or cache_home()
    key = hashlib.sha256(url_or_path.encode()).hexdigest()[:24]
    name = os.path.basename(url_or_path.split("?")[0]) or "file"
    dest = os.path.join(cache, f"{key}.{name}")
    meta = dest + ".json"
    with local_file_lock(dest + ".lock"):
        if os.path.exists(dest):
            return dest
        tmp = dest + ".tmp"
        if scheme in _SCHEME_FETCHERS:
            _SCHEME_FETCHERS[scheme](url_or_path, tmp)
        elif scheme in ("http", "https"):
            with urllib.request.urlopen(url_or_path, timeout=60) as r, open(tmp, "wb") as f:
                shutil.copyfileobj(r, f)
        else:
            raise ValueError(f"no fetcher for scheme {scheme!r} ({url_or_path})")
        os.rename(tmp, dest)
        with open(meta, "w") as f:
            json.dump({"url": url_or_path}, f)
    return dest
