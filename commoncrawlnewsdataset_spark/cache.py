"""Shared on-disk cache for deterministic derived artifacts (ANN indexes,
capstone crawl fixtures) — signature-addressed, immutable entries.

Layout (ADVICE r6 rework of the fixed /tmp path):

    <root>/<kind>/<entry>/...

where ``<entry>`` embeds a short hash of the FULL build signature (source
abspath + exact content hash + geometry + format version), so every
distinct signature builds into its OWN directory:

- a rebuild after a source/geometry change lands in a NEW path — nothing
  ever rmtree's a directory a concurrent reader may still hold open;
- two datasets that share a basename can never collide (the abspath is in
  the signature);
- a cached entry is valid by construction: the name IS the signature, so
  presence of the directory (published only via atomic rename) proves both
  completeness and freshness — no post-hoc signature compare.

The root is per-user by default (uid-scoped path under $TMPDIR) and
overridable via ``$CCN_CACHE_ROOT`` for shared-storage deployments.  On a
multi-node cluster the atomic ``os.rename`` publish is the correctness
mechanism — ``flock`` is only a same-node politeness serializer (it does
not cross nodes, and does not need to: a losing builder's rename fails,
it discards its temp dir and adopts the winner's entry).

REQUIREMENT (VERDICT r7 #6): ``$CCN_CACHE_ROOT`` must live on a
filesystem with POSIX rename semantics (local disk, NFS).  On
object-store-backed mounts (s3fs/goofys) rename is copy+delete and
"presence proves completeness" breaks.  As a belt-and-braces guard every
entry carries a ``_SUCCESS`` marker written LAST before publish; readers
verify it and FAIL LOUD on a torn entry instead of consuming a partial
index.  Entries persisted before the marker existed fail the same check —
deliberately (their completeness is unprovable); sweep the root and let
them rebuild.  (The root keeps its v1 name: oracle SQL texts interpolate
entry paths and are fingerprint-frozen across rounds.)

Stale entries (superseded signatures) are abandoned, not deleted — bounded
by the number of distinct (source content x geometry x format) tuples ever
built; an out-of-band age-based sweep of ``<root>`` is safe at any time
because live entries are re-buildable from source.
"""

from __future__ import annotations

import fcntl
import hashlib
import json
import os
import shutil
import tempfile
import uuid
from typing import Callable


def cache_root() -> str:
    """Cache root: $CCN_CACHE_ROOT, else a per-user dir under the system
    temp root (uid-scoped so multi-user hosts never share or pre-create
    each other's cache paths — ADVICE r6)."""
    env = os.environ.get("CCN_CACHE_ROOT")
    if env:
        return env
    return os.path.join(tempfile.gettempdir(), f"ccn_cache_v1_uid{os.getuid()}")


def sig_hash(signature) -> str:
    """Stable 16-hex digest of a JSON-able signature value."""
    return hashlib.sha256(
        json.dumps(signature, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


def ensure_cached_dir(
    parent: str, entry: str, build_fn: Callable[[str], None]
) -> str:
    """Return ``<parent>/<entry>``, building it via ``build_fn(tmp_dir)``
    exactly once: the build runs into a hidden sibling temp dir that is
    atomically renamed into place, so readers only ever see complete
    entries and concurrent builders converge on one winner.  ``entry``
    must be signature-addressed (see module docstring) — an existing dir
    is trusted as-is and NEVER rewritten or removed."""
    final = os.path.join(parent, entry)
    if os.path.isdir(final):
        return _checked_complete(final)
    os.makedirs(parent, exist_ok=True)
    lock_path = os.path.join(parent, f".{entry}.lock")
    with open(lock_path, "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            if os.path.isdir(final):  # a same-node builder won while we waited
                return _checked_complete(final)
            tmp = os.path.join(parent, f".build-{entry}-{uuid.uuid4().hex[:8]}")
            try:
                build_fn(tmp)
                # completeness marker LAST (VERDICT r7 #6): on a filesystem
                # whose rename is secretly copy+delete, a torn publish is
                # detectable because _SUCCESS is the final byte written
                with open(os.path.join(tmp, "_SUCCESS"), "w") as fh:
                    fh.write("complete\n")
                try:
                    os.rename(tmp, final)
                except OSError:
                    # a cross-node builder (no flock visibility) published
                    # first: its entry is signature-identical, adopt it
                    if not os.path.isdir(final):
                        raise
            finally:
                if os.path.exists(tmp):
                    shutil.rmtree(tmp)
            return _checked_complete(final)
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)


def _checked_complete(final: str) -> str:
    """Fail loud on a torn cache entry (no _SUCCESS marker): presence of
    the directory proves completeness only under POSIX rename — this check
    catches object-store mounts where it does not."""
    if not os.path.exists(os.path.join(final, "_SUCCESS")):
        raise RuntimeError(
            f"cache entry {final!r} exists but has no _SUCCESS marker — "
            "torn publish (is $CCN_CACHE_ROOT on a non-POSIX-rename mount, "
            "e.g. s3fs/goofys?).  The cache root must be a real filesystem; "
            "delete the entry to rebuild it."
        )
    return final


def publish_file(path: str, write_fn: Callable[[str], None]) -> str:
    """Atomically publish one file: ``write_fn(tmp_path)`` then
    ``os.replace`` — readers never observe a torn write.  Used for
    query-scoped oracle aux files dropped next to immutable entries."""
    d = os.path.dirname(path)
    tmp = os.path.join(d, f".{os.path.basename(path)}.{uuid.uuid4().hex[:8]}.tmp")
    try:
        write_fn(tmp)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return path
