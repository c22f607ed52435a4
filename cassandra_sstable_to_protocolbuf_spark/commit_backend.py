"""Commit-seam storage backends for the versioned table's OCC protocol.

The round-4 audit's #1 forward-looking gap: every commit primitive in
`versioned.py` was POSIX-rename-based (O_EXCL claim, temp+fsync+rename
publish), and none of those primitives exist on S3/GCS -- where a 100 TB
deployment actually keeps its table roots. This module is the seam: the
OCC *protocol* (claim version N exclusively -> publish the current
pointer -> reclaim crashed claims after a grace window) stays in
`versioned.py`, and the five storage primitives it needs live behind
`CommitBackend`:

  read_text / exists / listdir  -- snapshot reads
  put_if_absent                 -- the CAS claim (POSIX: O_EXCL create;
                                   S3: PutObject + If-None-Match:*;
                                   GCS: x-goods-if-generation-match:0)
  put_atomic                    -- last-writer-wins pointer publish
                                   (POSIX: temp+fsync+rename; object
                                   stores: plain PUT, which is atomic)
  steal                         -- at-most-once removal of a crashed
                                   claim (POSIX: rename-then-unlink; S3:
                                   conditional PUT of a tombstone with
                                   If-Match: <etag>, then unconditional
                                   DeleteObject -- GP buckets have no
                                   conditional delete)
  age_s / delete                -- grace-window reclaim + vacuum

Two implementations ship:

* PosixCommitBackend -- the default; byte-for-byte the behavior
  versioned.py had inline before the seam existed (all versioned gates
  and tests/test_versioned_concurrency.py pin it).
* InMemoryCommitBackend -- an object-store-SHAPED backend: no rename, no
  directories, conditional puts under a lock, exactly the primitive set
  an S3 conditional-write implementation would map onto. It exists to
  prove the protocol never leans on a POSIX-only primitive through the
  seam (tests/test_commit_backend.py runs the OCC concurrency battery
  against both), and as the drop-in template for a real S3 backend.

Only the PROTOCOL plane routes through the backend. The data plane
(parquet files under data/c{N}) is written and read by Spark's own
Hadoop filesystem layer, which already speaks s3a/gs natively -- the
seam covers exactly the part Spark does not.
"""

from __future__ import annotations

import abc
import os
import tempfile
import threading
import time


class CommitBackend(abc.ABC):
    """Storage primitives for the versioned-table commit protocol. Paths
    are opaque strings (POSIX paths or object keys); implementations
    must make put_if_absent and steal linearizable -- the protocol's
    correctness reduces to those two being at-most-once."""

    @abc.abstractmethod
    def read_text(self, path: str) -> str:
        """Full contents; raises FileNotFoundError when absent."""

    @abc.abstractmethod
    def exists(self, path: str) -> bool: ...

    @abc.abstractmethod
    def listdir(self, dirpath: str) -> list[str]:
        """Immediate child names under a prefix; raises
        FileNotFoundError for a prefix that was never written."""

    @abc.abstractmethod
    def put_if_absent(self, path: str, text: str) -> bool:
        """CAS create: True if this call created the object, False if it
        already existed (the loser of a race). Never overwrites.

        Contract: `text` must be CALLER-UNIQUE (the protocol layers
        embed a uuid -- versioned manifests a `writer`, txnlog claims an
        `owner`). Backends whose transport can lose a success response
        (S3) disambiguate a retried CAS by reading the object back and
        byte-comparing; identical bodies from different callers would
        let both believe they won."""

    @abc.abstractmethod
    def put_atomic(self, path: str, text: str) -> None:
        """Atomic last-writer-wins publish: readers see the old or the
        new contents, never a prefix."""

    @abc.abstractmethod
    def put_if_match(self, path: str, text: str, expected: str) -> bool:
        """CAS replace: write `text` iff the object currently holds
        exactly `expected`. True when this call's write landed; False
        when the contents differ or the object is absent (the caller
        re-reads and retries -- the optimistic-concurrency loop).
        Same caller-unique contract as put_if_absent: `text` must embed
        a nonce so lost-response disambiguation can identify its own
        write (manifest updates carry a `rev` uuid)."""

    @abc.abstractmethod
    def steal(self, path: str) -> bool:
        """At-most-once removal: of N concurrent stealers of the same
        existing object, exactly one returns True. Used to reclaim a
        crashed writer's claim; the winner retries the CAS create."""

    @abc.abstractmethod
    def delete(self, path: str) -> None:
        """Idempotent removal (vacuum plane)."""

    @abc.abstractmethod
    def age_s(self, path: str) -> float | None:
        """Seconds since the object was written, or None if absent --
        the liveness signal for the stale-claim grace window."""

    def data_exists(self, path: str) -> bool:
        """Existence probe for DATA-plane files referenced by protocol
        objects (manifest entries). The data plane is Spark's
        filesystem by default -- os.path.exists, matching how read
        tasks actually open sstable components -- while protocol reads
        go through the backend; a deployment whose sstable data lives
        in the same object store as the protocol plane overrides this
        to HEAD the store, keeping probe and read on one authority."""
        return os.path.exists(path)


class PosixCommitBackend(CommitBackend):
    """The default: local/NFS filesystems where O_EXCL and rename are
    atomic. Exactly the inline primitives versioned.py grew up on."""

    def read_text(self, path: str) -> str:
        with open(path, encoding="utf-8") as f:
            return f.read()

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def listdir(self, dirpath: str) -> list[str]:
        return os.listdir(dirpath)

    def put_if_absent(self, path: str, text: str) -> bool:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            f.write(text)
            f.flush()
            os.fsync(f.fileno())
        return True

    def put_atomic(self, path: str, text: str) -> None:
        # same-directory temp + fsync + rename: POSIX's only atomic
        # publish primitive
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, prefix=".commit_")
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as f:
                f.write(text)
                f.flush()
                os.fsync(f.fileno())
            os.rename(tmp, path)
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise

    def put_if_match(self, path: str, text: str, expected: str) -> bool:
        # POSIX has no native compare-and-swap on file contents: take a
        # sidecar flock (auto-released on crash -- no deadlock), compare
        # under it, publish via the same temp+fsync+rename primitive.
        # Readers never lock: they see old or new atomically via rename.
        import fcntl

        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path + ".cas-lock", "a+", encoding="utf-8") as lock:
            fcntl.flock(lock.fileno(), fcntl.LOCK_EX)
            try:
                try:
                    with open(path, encoding="utf-8") as f:
                        if f.read() != expected:
                            return False
                except FileNotFoundError:
                    return False
                self.put_atomic(path, text)
                return True
            finally:
                fcntl.flock(lock.fileno(), fcntl.LOCK_UN)

    def steal(self, path: str) -> bool:
        # rename wins at most once: two concurrent stealers cannot both
        # unlink-and-recreate -- the loser's rename raises and it goes
        # back to the CAS create, losing cleanly to the winner's fresh
        # (hence young) claim
        tomb = f"{path}.reclaimed.{os.getpid()}.{threading.get_ident()}"
        try:
            os.rename(path, tomb)
        except OSError:
            return False
        try:
            os.unlink(tomb)
        except OSError:
            pass
        return True

    def delete(self, path: str) -> None:
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass

    def age_s(self, path: str) -> float | None:
        try:
            return time.time() - os.path.getmtime(path)
        except OSError:
            return None


class InMemoryCommitBackend(CommitBackend):
    """Object-store-shaped backend: a flat key space, conditional puts
    under a lock, no rename anywhere. Maps 1:1 onto S3 conditional
    writes (put_if_absent == If-None-Match:*, steal == If-Match etag
    tombstone PUT then plain delete, put_atomic == plain PUT); swapping
    the dict operations for boto3 calls yields a production S3 backend
    with the same contract.
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        # key -> (text, write_monotonic)
        self._objects: dict[str, tuple[str, float]] = {}

    def read_text(self, path: str) -> str:
        with self._lock:
            try:
                return self._objects[path][0]
            except KeyError:
                raise FileNotFoundError(path) from None

    def exists(self, path: str) -> bool:
        with self._lock:
            return path in self._objects

    def listdir(self, dirpath: str) -> list[str]:
        prefix = dirpath.rstrip("/") + "/"
        with self._lock:
            names = {k[len(prefix):].split("/", 1)[0]
                     for k in self._objects if k.startswith(prefix)}
        if not names:
            raise FileNotFoundError(dirpath)
        return sorted(names)

    def put_if_absent(self, path: str, text: str) -> bool:
        with self._lock:
            if path in self._objects:
                return False
            self._objects[path] = (text, time.monotonic())
            return True

    def put_atomic(self, path: str, text: str) -> None:
        with self._lock:
            self._objects[path] = (text, time.monotonic())

    def put_if_match(self, path: str, text: str, expected: str) -> bool:
        with self._lock:
            entry = self._objects.get(path)
            if entry is None or entry[0] != expected:
                return False
            self._objects[path] = (text, time.monotonic())
            return True

    def steal(self, path: str) -> bool:
        with self._lock:
            return self._objects.pop(path, None) is not None

    def delete(self, path: str) -> None:
        with self._lock:
            self._objects.pop(path, None)

    def age_s(self, path: str) -> float | None:
        with self._lock:
            entry = self._objects.get(path)
        return None if entry is None else time.monotonic() - entry[1]


_BACKEND: CommitBackend = PosixCommitBackend()
_BACKEND_LOCK = threading.Lock()


def get_commit_backend() -> CommitBackend:
    return _BACKEND


def set_commit_backend(backend: CommitBackend) -> CommitBackend:
    """Install a backend process-wide; returns the previous one (callers
    restore it -- tests use the use_commit_backend context manager)."""
    global _BACKEND
    with _BACKEND_LOCK:
        prev, _BACKEND = _BACKEND, backend
    return prev


class use_commit_backend:
    """Context manager: run the versioned-table protocol against a
    different backend, restoring the default on exit."""

    def __init__(self, backend: CommitBackend) -> None:
        self._backend = backend
        self._prev: CommitBackend | None = None

    def __enter__(self) -> CommitBackend:
        self._prev = set_commit_backend(self._backend)
        return self._backend

    def __exit__(self, *exc) -> None:
        assert self._prev is not None
        set_commit_backend(self._prev)
