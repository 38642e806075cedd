"""Commit backends — the CONTROL-PLANE I/O of the versioned-table
commit protocol, behind a conditional-PUT interface (VERDICT r10
item #2).

``VersionedTable`` (and its bucketed subclass) separates two planes:

- **data plane**: immutable parquet files under ``data/vN/`` —
  written by Spark's own writers, hardlinked across snapshots, read
  by Spark's parquet scan. Stays on whatever filesystem Spark talks
  to; nothing here routes it.
- **control plane**: the commit LOCK, the version POINTER, and the
  MANIFESTS — tiny metadata objects whose mutation order IS the
  crash-safety argument. This module owns exactly that plane.

The interface is deliberately the object-store primitive set, so the
local-filesystem implementation and a real S3/GCS/ABS port share one
protocol:

- ``create_exclusive(key, content)`` — conditional PUT with
  if-none-match (S3 ``If-None-Match: *``, GCS
  ``ifGenerationMatch=0``): the lock acquire.
- ``cas(key, expected, content)`` — compare-and-swap (PUT with
  if-match on the observed content/generation): the pointer commit.
- ``delete_if(key, expected)`` — conditional DELETE (if-match): lock
  release and stale-lease reclaim. Deleting ONLY the exact content
  you observed is what makes reclaim race-free: if another reclaimer
  won and a fresh writer re-acquired in between, the content changed
  and the conditional delete fails instead of destroying the live
  writer's lock (the r10-ADVICE TOCTOU).
- ``get / exists / put / delete / list`` — plain object I/O for
  manifests, the sidecar stats cache, and vacuum.

Liveness is LEASE-based, not pid-based, at the interface level:
``new_lease()`` mints a lock payload and ``lease_live(payload)``
answers "may this lock still be held?". The local backend uses the
strongest local signal (pid liveness — no clock involved); the
in-memory/object-store form uses expiry timestamps, because an object
store has no pids (a crashed writer on another machine looks exactly
like a slow one). Expiry semantics and the clock-skew caveat are
documented in DEPLOY.md.
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid
from abc import ABC, abstractmethod
from contextlib import contextmanager


class CommitBackend(ABC):
    """Control-plane storage for the versioned-table commit protocol.

    Keys are ``/``-separated relative paths (``_lock``, ``_current``,
    ``_versions/v00000001.json``); contents are small strings. Every
    conditional operation must be ATOMIC with respect to the others —
    that atomicity is the whole contract."""

    # ------------------------------------------------------- plain I/O

    @abstractmethod
    def get(self, key: str) -> str | None:
        """Content of ``key``, or None if absent."""

    def exists(self, key: str) -> bool:
        return self.get(key) is not None

    @abstractmethod
    def put(self, key: str, content: str) -> None:
        """Durable unconditional overwrite (manifests, sidecars —
        objects owned by the lock holder, so no condition needed)."""

    @abstractmethod
    def delete(self, key: str) -> None:
        """Unconditional delete; absent key is not an error."""

    @abstractmethod
    def list(self, prefix: str) -> list[str]:
        """Sorted keys under ``prefix`` (a ``dir/`` style prefix)."""

    # ---------------------------------------------------- conditionals

    @abstractmethod
    def create_exclusive(self, key: str, content: str) -> bool:
        """Create ``key`` with ``content`` iff it does not exist;
        atomic, content visible in full or not at all (no torn reads).
        True on success."""

    @abstractmethod
    def cas(self, key: str, expected: str | None, content: str) -> bool:
        """Durably set ``key`` to ``content`` iff its current content
        equals ``expected`` (None = must not exist). True on success."""

    @abstractmethod
    def delete_if(self, key: str, expected: str) -> bool:
        """Delete ``key`` iff its current content equals ``expected``.
        True on success (key removed by THIS call)."""

    # --------------------------------------------------------- leases

    @abstractmethod
    def new_lease(self) -> str:
        """Mint a lock payload identifying this writer."""

    @abstractmethod
    def lease_live(self, content: str) -> bool:
        """May the writer that wrote this payload still be running?
        False licenses a reclaim attempt (via ``delete_if`` on exactly
        this payload). Must err toward True — a wrongly-dead verdict
        costs at most a failed conditional delete, but the conditional
        is the real guard, not this answer."""


class LocalFSBackend(CommitBackend):
    """Default backend: the control plane as local files.

    Conditional-op atomicity comes from two local-fs primitives:
    ``create_exclusive`` is a hardlink of a fully-written temp file
    (atomic creation WITH content — a reader can never observe an
    empty lock, unlike O_EXCL-then-write), and ``cas``/``delete_if``
    serialize under a short-lived kernel ``flock`` on a meta-mutex
    file (held microseconds around metadata reads/writes, auto-
    released on process death — it can never be left stale).

    Leases are pid strings and liveness is ``kill(pid, 0)`` — the
    strongest local signal, no clocks involved. The conditional
    delete is still what makes reclaim safe; pid liveness only decides
    WHEN to try."""

    def __init__(self, root: str):
        if "://" in root:
            raise ValueError(
                f"LocalFSBackend root must be a local path, got {root!r}"
            )
        self.root = root

    def _path(self, key: str) -> str:
        return os.path.join(self.root, key)

    @staticmethod
    def _sweep_dead_tmp(d: str) -> None:
        """Opportunistically unlink temp litter (``*.ce.PID.hex``,
        ``*.tmp.PID.hex``) left by writers killed between creating
        their unique temp file and the link/rename/unlink that
        consumes it. Dead-pid files only — a live writer's in-flight
        temp is never touched — so crashed-writer roots don't
        accumulate garbage across restarts (r11 review; the old
        rename-claim protocol had an equivalent sweep)."""
        import re

        try:
            names = os.listdir(d)
        except FileNotFoundError:
            return
        for name in names:
            m = re.search(r"\.(?:ce|tmp)\.(\d+)\.[0-9a-f]{8}$", name)
            if not m:
                continue
            try:
                os.kill(int(m.group(1)), 0)
            except ProcessLookupError:
                try:
                    os.unlink(os.path.join(d, name))
                except FileNotFoundError:
                    pass
            except PermissionError:
                pass  # pid alive under another user

    @contextmanager
    def _mutex(self):
        import fcntl

        os.makedirs(self.root, exist_ok=True)
        fd = os.open(
            os.path.join(self.root, "_meta.lock"), os.O_CREAT | os.O_RDWR
        )
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            os.close(fd)  # closing the fd releases the flock

    # ------------------------------------------------------- plain I/O

    def get(self, key: str) -> str | None:
        try:
            with open(self._path(key)) as f:
                return f.read()
        except FileNotFoundError:
            return None

    def exists(self, key: str) -> bool:
        return os.path.exists(self._path(key))

    def put(self, key: str, content: str) -> None:
        from nycitibike_data_transform_spark.versioning import _durable_write

        path = self._path(key)
        os.makedirs(os.path.dirname(path) or self.root, exist_ok=True)
        self._sweep_dead_tmp(os.path.dirname(path))
        _durable_write(path, content)

    def delete(self, key: str) -> None:
        with self._mutex():
            try:
                os.unlink(self._path(key))
            except FileNotFoundError:
                pass

    def list(self, prefix: str) -> list[str]:
        d = self._path(prefix)
        if not os.path.isdir(d):
            return []
        sep = "" if prefix.endswith("/") else "/"
        return sorted(
            f"{prefix}{sep}{name}"
            for name in os.listdir(d)
            if os.path.isfile(os.path.join(d, name))
        )

    # ---------------------------------------------------- conditionals

    def create_exclusive(self, key: str, content: str) -> bool:
        path = self._path(key)
        os.makedirs(os.path.dirname(path) or self.root, exist_ok=True)
        self._sweep_dead_tmp(os.path.dirname(path))
        tmp = f"{path}.ce.{os.getpid()}.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(content)
            f.flush()
            os.fsync(f.fileno())  # manifests commit through this path
        try:
            os.link(tmp, path)  # atomic create-with-content
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)
        # durability of the directory entry: the pointer CAS that
        # follows a manifest create fsyncs only ITS OWN file+dir, so
        # the manifest's entry must be on disk before the pointer can
        # reference it (power-loss ordering)
        dir_fd = os.open(os.path.dirname(path) or ".", os.O_RDONLY)
        try:
            os.fsync(dir_fd)
        finally:
            os.close(dir_fd)
        return True

    def cas(self, key: str, expected: str | None, content: str) -> bool:
        with self._mutex():
            if self.get(key) != expected:
                return False
            self.put(key, content)
            return True

    def delete_if(self, key: str, expected: str) -> bool:
        with self._mutex():
            if self.get(key) != expected:
                return False
            os.unlink(self._path(key))
            return True

    # --------------------------------------------------------- leases

    def new_lease(self) -> str:
        return str(os.getpid())

    def lease_live(self, content: str) -> bool:
        try:
            pid = int(content.strip() or "0")
        except ValueError:
            return True  # unrecognized payload: err toward live
        if pid == 0:
            return True
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            return False
        except PermissionError:
            return True  # exists, owned by someone else
        return True


class MemoryBackend(CommitBackend):
    """In-memory emulation of an OBJECT-STORE control plane: every
    operation is atomic under one mutex (what S3/GCS conditional
    requests give per-key), and liveness is LEASE-EXPIRY — no pids,
    because an object store cannot see another machine's processes.

    ``clock`` is injectable so tests drive expiry deterministically.
    The expiry trade (documented in DEPLOY.md): a lease long enough to
    cover the slowest honest commit, short enough that a crashed
    writer doesn't block the table for long — and a writer that
    OUTLIVES its lease must treat its own commit as lost (the pointer
    CAS is the backstop: it fails for a writer whose lock was
    reclaimed mid-commit, because the winner moved the pointer)."""

    def __init__(self, lease_ttl: float = 60.0, clock=time.monotonic):
        self._store: dict[str, str] = {}
        self._mu = threading.Lock()
        self.lease_ttl = lease_ttl
        self._clock = clock

    # ------------------------------------------------------- plain I/O

    def get(self, key: str) -> str | None:
        with self._mu:
            return self._store.get(key)

    def put(self, key: str, content: str) -> None:
        with self._mu:
            self._store[key] = content

    def delete(self, key: str) -> None:
        with self._mu:
            self._store.pop(key, None)

    def list(self, prefix: str) -> list[str]:
        p = prefix if prefix.endswith("/") else prefix + "/"
        with self._mu:
            return sorted(k for k in self._store if k.startswith(p))

    # ---------------------------------------------------- conditionals

    def create_exclusive(self, key: str, content: str) -> bool:
        with self._mu:
            if key in self._store:
                return False
            self._store[key] = content
            return True

    def cas(self, key: str, expected: str | None, content: str) -> bool:
        with self._mu:
            if self._store.get(key) != expected:
                return False
            self._store[key] = content
            return True

    def delete_if(self, key: str, expected: str) -> bool:
        with self._mu:
            if self._store.get(key) != expected:
                return False
            del self._store[key]
            return True

    # --------------------------------------------------------- leases

    def new_lease(self) -> str:
        return json.dumps(
            {
                "owner": uuid.uuid4().hex,
                "expires": self._clock() + self.lease_ttl,
            }
        )

    def lease_live(self, content: str) -> bool:
        try:
            lease = json.loads(content)
            return self._clock() < float(lease["expires"])
        except (ValueError, KeyError, TypeError):
            return True  # unrecognized payload: err toward live
