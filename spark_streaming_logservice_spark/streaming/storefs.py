"""storefs — the ONE filesystem seam under every streaming store.

Every durable structure in the streaming layer (sharded rollup profiles,
the digest dedup store, the persisted ANN index, the composed ingest
pipeline's flags/markers/quarantine, foreachBatch batch markers) routes
its state I/O through this module. The crash-safety arguments of those
stores all reduce to the same small contract, stated ONCE here instead of
per-module:

Contract (the POSIX backend below satisfies it on a local or shared
POSIX filesystem — ext4, XFS, NFS, Lustre, GPFS):

1. ``publish_rename(src, dst)`` is ATOMIC and non-copying: after a crash
   at any instant, ``dst`` either does not exist or is the COMPLETE
   published object; readers never observe a partial ``dst``. This is the
   primitive every store's staging→final publish depends on.
2. ``replace_file(src, dst)`` atomically replaces a small file (flag
   records, meta files) — same visibility guarantee for single files,
   including when ``dst`` already exists.
3. ``listdir`` / ``exists`` / ``isdir`` see published objects immediately
   (read-after-publish consistency on the same node or shared mount).
4. ``write_text`` + ``publish``-style naming: small control files are
   written whole; a reader sees the old content, the new content, or (for
   create-new paths) absence — never a torn mix, provided writers go
   through ``replace_file`` for overwrites.
5. Key construction — the ONE path rule, stated once: a backend MUST
   accept '/'-separated keys, because that is what every store module
   produces (``storefs.join`` where converted, ``os.path.join`` elsewhere
   — identical on the POSIX hosts Spark drivers run on; segments never
   contain separators, so an object-store backend treats the joined
   string as an opaque object key). ``join`` exists so a backend with an
   exotic key scheme has one hook to normalize through, but no backend
   may REQUIRE it: '/'-joined keys arriving directly must resolve to the
   same objects. The contract suite pins this with POSIX-shaped keys
   against both backends.

NOT valid on S3-style object stores: rename there is copy+delete (neither
atomic nor cheap), and listings can lag writes. Deploying the store layer
against an object store means implementing a :class:`Backend` with these
primitives mapped to the store's own atomic publish and installing it
with :func:`set_backend` — an adapter, not a rewrite of the stores. That
claim is a TEST, not an assertion: ``storefs_object.py`` ships a
manifest-pointer/conditional-PUT shim (the Delta/Iceberg commit-protocol
shape) that passes the same parameterized contract suite the POSIX
backend passes, and a naive copy+delete port that fails exactly the
clauses above (tests/test_storefs_contract.py). The Spark-side parquet
reads/writes are already object-store-clean (they go through Hadoop
FileSystem); this seam covers only the stores' own control plane.
"""

from __future__ import annotations

import os
import shutil


class Backend:
    """POSIX implementation of the store-filesystem contract (module
    docstring). An alternative deployment subclasses this and installs
    via :func:`set_backend`; method semantics must match the contract,
    signatures mirror the ``os``/``shutil`` calls they replace."""

    def join(self, *parts: str) -> str:
        return os.path.join(*parts)

    def publish_rename(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def replace_file(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def makedirs(self, path: str, exist_ok: bool = False) -> None:
        os.makedirs(path, exist_ok=exist_ok)

    def rmtree(self, path: str, ignore_errors: bool = False) -> None:
        shutil.rmtree(path, ignore_errors=ignore_errors)

    def remove(self, path: str) -> None:
        os.remove(path)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text(self, path: str, data: str) -> None:
        with open(path, "w") as f:
            f.write(data)

    def copy_file(self, src: str, dst: str) -> None:
        shutil.copy2(src, dst)

    # --- lease/metadata group: LRU and build-grace bookkeeping only ---
    # (best-effort; the contract is monotone-ish timestamps, not
    # atomicity — an object-store backend may approximate these with its
    # own last-modified metadata or a sidecar record)

    def getmtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def mtime_ns(self, path: str) -> int:
        return os.stat(path).st_mtime_ns

    def utime(self, path: str) -> None:
        os.utime(path)

    def walk(self, path: str):
        return os.walk(path)


_backend = Backend()


def set_backend(backend: Backend) -> Backend:
    """Install an alternative store-filesystem backend; returns the
    previous one (so tests can restore it)."""
    global _backend
    prev = _backend
    _backend = backend
    return prev


def join(*parts: str) -> str:
    return _backend.join(*parts)


def publish_rename(src: str, dst: str) -> None:
    _backend.publish_rename(src, dst)


def replace_file(src: str, dst: str) -> None:
    _backend.replace_file(src, dst)


def listdir(path: str) -> list[str]:
    return _backend.listdir(path)


def exists(path: str) -> bool:
    return _backend.exists(path)


def isdir(path: str) -> bool:
    return _backend.isdir(path)


def makedirs(path: str, exist_ok: bool = False) -> None:
    _backend.makedirs(path, exist_ok=exist_ok)


def rmtree(path: str, ignore_errors: bool = False) -> None:
    _backend.rmtree(path, ignore_errors=ignore_errors)


def remove(path: str) -> None:
    _backend.remove(path)


def read_text(path: str) -> str:
    return _backend.read_text(path)


def write_text(path: str, data: str) -> None:
    _backend.write_text(path, data)


def copy_file(src: str, dst: str) -> None:
    _backend.copy_file(src, dst)


def getmtime(path: str) -> float:
    return _backend.getmtime(path)


def mtime_ns(path: str) -> int:
    return _backend.mtime_ns(path)


def utime(path: str) -> None:
    _backend.utime(path)


def walk(path: str):
    return _backend.walk(path)
