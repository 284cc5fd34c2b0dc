"""On-disk memoization of derived index artifacts (LSH corpus index,
IVF codes+assignment) keyed by their source fixture.

A 100 TB pipeline computes an index ONCE per corpus version and stores
it (the reference's manifest-as-persistent-state pattern,
Notion_openai_vector_etl.py:190-215, lifted from exact hashes to index
artifacts); the registered bench queries model that by memoizing the
index build under a cache dir so trials after the first measure the
true per-ingest probe cost, not the amortized build.

Staleness + collision hardening (ADVICE r8):

- the fingerprint is ``st_size`` + ``st_mtime_ns`` — nanosecond mtime,
  so a fixture regenerated within the same wall-clock second with an
  identical byte size can no longer be served a stale index;
- the cache key is a fixed-width hash of the source's absolute path,
  so two fixture dirs where one path is a string-prefix of the other
  (``/data/sf1`` vs ``/data/sf1/sub``) can never glob-match each
  other's entries during retirement;
- the cache root is per-user and env-overridable
  (``NVE_INDEX_CACHE_DIR``), not a world-shared literal ``/tmp`` path
  a concurrent user could poison or delete.

Publication is atomic (build into a ``.build-*`` sibling, ``rename``
into place), so concurrent builders race benignly: the loser's rename
fails and its temp dir is discarded.
"""

from __future__ import annotations

import getpass
import glob
import hashlib
import os
import shutil
import tempfile
import uuid
from typing import Callable


def cache_root() -> str:
    """Per-user cache root; override with ``NVE_INDEX_CACHE_DIR``."""
    override = os.environ.get("NVE_INDEX_CACHE_DIR")
    if override:
        return override
    try:
        user = getpass.getuser()
    except Exception:  # no passwd entry (containers)
        user = str(os.getuid()) if hasattr(os, "getuid") else "anon"
    return os.path.join(tempfile.gettempdir(), f"nve_index_cache_{user}")


def _source_key(src_path: str) -> str:
    """Fixed-width (16 hex) key for a source path — unambiguous under
    glob, regardless of how the paths nest."""
    return hashlib.sha1(os.path.abspath(src_path).encode()).hexdigest()[:16]


def memoized_index(
    src_path: str,
    family: str,
    version: str,
    build: Callable[[str], None],
) -> str:
    """Return the cache dir for ``family`` index derived from
    ``src_path``, building it via ``build(tmp_dir)`` when absent.

    The dir name encodes (family, source-path hash, size, mtime_ns,
    construction version): a driver-regenerated fixture changes the
    fingerprint and forces a rebuild; ``version`` bumps on any change
    to the index construction itself (signature family, collapse
    policy, quantization). Superseded fingerprints of the same
    (family, source) are retired after a successful publish.
    """
    key = _source_key(src_path)
    try:
        st = os.stat(src_path)
        fp = f"{st.st_size}_{st.st_mtime_ns}"
    except OSError:
        fp = "nofp"  # non-local source (object store): key+version only
    root = cache_root()
    path = os.path.join(root, f"{family}_{key}_{fp}_{version}")
    if not os.path.isdir(path):
        os.makedirs(root, exist_ok=True)
        tmp = f"{path}.build-{uuid.uuid4().hex[:8]}"
        try:
            build(tmp)
        except BaseException:
            # a failed build must not strand its temp tree: the
            # retirement glob ends in _{version} and can never match
            # the .build-* suffix, so orphans would accumulate forever
            # (ADVICE r9)
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        try:  # atomic publish: concurrent builders race benignly
            os.rename(tmp, path)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
        # retire superseded entries for this (family, source) — ANY
        # fingerprint or construction version (a version-locked glob
        # would strand one full index copy per version bump forever,
        # r10 review finding). The fixed-width key makes the glob
        # unambiguous even when one source path is a prefix of another
        # (ADVICE r8); in-progress ".build-" temps of concurrent
        # builders are skipped by the marker check.
        for old in glob.glob(os.path.join(root, f"{family}_{key}_*")):
            if old == path or old.startswith(path + "."):
                continue
            if ".build-" in os.path.basename(old):
                continue  # another builder's in-flight temp
            shutil.rmtree(old, ignore_errors=True)
    return path
