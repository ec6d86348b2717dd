"""Pluggable commit backends for the manifest log.

The exactly-once story in :mod:`.manifest` rests on exactly two storage
primitives, isolated here so the 2PC protocol survives storage the POSIX
rename/link tricks do not exist on (S3 / GCS / Azure — where a 100 TB
multi-node lake actually lives):

- :meth:`CommitBackend.put_if_absent` — durable, atomic, winner-take-all
  object create. This is THE commit point: of two writers publishing the
  same manifest version, exactly one succeeds.
- :meth:`CommitBackend.put_overwrite` — durable, atomic full-object
  replace (last-writer-wins). Only the cached CURRENT pointer uses it;
  losing a pointer race is self-healing (``current_version`` re-derives
  the head from the version files, which are the source of truth).

Backends:

- :class:`PosixCommitBackend` — local/NFS filesystems: tmp + fsync +
  ``os.link`` (create) / ``os.replace`` (overwrite). The default.
- :class:`MemoryCommitBackend` — an in-process CAS object store modeling
  the conditional-put primitive every major object store now exposes
  (S3 ``PutObject`` with ``If-None-Match: *``, GCS ``ifGenerationMatch=0``,
  Azure Blob ``If-None-Match: *``, or a DynamoDB
  ``attribute_not_exists()`` version row à la delta-rs's S3 lock). Used
  by the test suite to run the whole OCC/crash/vacuum suite against the
  object-store flavor of the protocol; a production S3 backend implements
  the same three methods with one conditional PUT each.

Only the MANIFEST LOG needs these semantics. Data files are immutable,
uniquely named, and invisible until a manifest references them, so plain
unconditional puts (or Arrow filesystem writes) are safe for them on any
store — the reason the Delta protocol (Armbrust et al., VLDB 2020, §3.2)
needs atomicity only for its log, which this module mirrors.
"""

from __future__ import annotations

import os
import threading
import uuid


class CommitBackend:
    """Storage primitives the manifest log needs. Implementations must
    make :meth:`put_if_absent` atomic and durable-before-visible: a True
    return means the object exists in full for every subsequent reader,
    and no other writer's ``put_if_absent`` on the same path returned
    True."""

    def read_bytes(self, path: str) -> bytes | None:
        """Full object contents, or None if absent."""
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def put_if_absent(self, path: str, data: bytes) -> bool:
        """Create ``path`` with ``data`` iff it does not exist. Returns
        True on success, False if the object already existed (another
        writer won). Atomic: concurrent callers serialize."""
        raise NotImplementedError

    def put_overwrite(self, path: str, data: bytes) -> None:
        """Durably replace ``path`` with ``data`` (full object,
        last-writer-wins; readers never observe a partial write)."""
        raise NotImplementedError

    def ensure_dir(self, path: str) -> None:
        """Create the container if the backend has such a notion
        (no-op for flat object stores)."""


class PosixCommitBackend(CommitBackend):
    """Local / NFS filesystems: ``os.link`` is atomic fail-if-exists,
    ``os.replace`` is atomic overwrite; tmp files are fsynced before
    becoming visible so a crash never exposes a partial object."""

    def read_bytes(self, path: str) -> bytes | None:
        try:
            with open(path, "rb") as f:
                return f.read()
        except FileNotFoundError:
            return None

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def _write_tmp(self, path: str, data: bytes) -> str:
        # unique per ATTEMPT (pid alone collides for same-process threads)
        tmp = f"{path}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        return tmp

    def put_if_absent(self, path: str, data: bytes) -> bool:
        tmp = self._write_tmp(path, data)
        try:
            os.link(tmp, path)  # atomic winner-take-all
        except FileExistsError:
            return False
        finally:
            os.remove(tmp)
        return True

    def put_overwrite(self, path: str, data: bytes) -> None:
        tmp = self._write_tmp(path, data)
        os.replace(tmp, path)

    def ensure_dir(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)


class MemoryCommitBackend(CommitBackend):
    """In-process object store with compare-and-set creates — the shape of
    S3 conditional PUT / GCS generation preconditions / a DynamoDB version
    row (see module docstring). Paths are opaque keys; there are no
    directories. One lock per store: conditional PUT on a real object
    store is serialized by the service, the lock models that."""

    def __init__(self) -> None:
        self._objects: dict[str, bytes] = {}
        self._lock = threading.Lock()

    def read_bytes(self, path: str) -> bytes | None:
        with self._lock:
            return self._objects.get(path)

    def exists(self, path: str) -> bool:
        with self._lock:
            return path in self._objects

    def put_if_absent(self, path: str, data: bytes) -> bool:
        with self._lock:
            if path in self._objects:
                return False
            self._objects[path] = bytes(data)
            return True

    def put_overwrite(self, path: str, data: bytes) -> None:
        with self._lock:
            self._objects[path] = bytes(data)
