"""Checkpoint/vocab path resolution.

Replaces the vendored URL/S3 download cache (reference:
sc/pytorch_pretrained_bert/file_utils.py — HF ``cached_path`` with ETag
handling).  This deployment is zero-egress, so remote URLs resolve through a
local cache directory only; local paths pass through.  The cache layout is
compatible enough that pre-populated caches (filename = sha256(url)) are
found.
"""
from __future__ import annotations

import hashlib
import os
from typing import Optional

DEFAULT_CACHE = os.path.expanduser(
    os.environ.get("MEDVILL_CACHE", "~/.cache/medvill_tpu"))


def url_to_filename(url: str, etag: Optional[str] = None) -> str:
    h = hashlib.sha256(url.encode()).hexdigest()
    if etag:
        h += "." + hashlib.sha256(etag.encode()).hexdigest()
    return h


def cached_path(url_or_path: str,
                cache_dir: Optional[str] = None) -> str:
    """Local path -> itself (must exist).  URL -> look up the local cache;
    raise with a helpful message if absent (no network in this runtime)."""
    if os.path.exists(url_or_path):
        return url_or_path
    if "://" not in url_or_path:
        raise FileNotFoundError(url_or_path)
    cache_dir = cache_dir or DEFAULT_CACHE
    candidate = os.path.join(cache_dir, url_to_filename(url_or_path))
    if os.path.exists(candidate):
        return candidate
    # accept any cache entry whose .json metadata names this url
    if os.path.isdir(cache_dir):
        import json

        for name in os.listdir(cache_dir):
            if name.endswith(".json"):
                try:
                    with open(os.path.join(cache_dir, name)) as f:
                        meta = json.load(f)
                    if meta.get("url") == url_or_path:
                        return os.path.join(cache_dir,
                                            name[: -len(".json")])
                except (OSError, ValueError):
                    continue
    raise FileNotFoundError(
        f"{url_or_path} not cached under {cache_dir} and this runtime has "
        f"no network access; pre-populate the cache or pass a local path")
