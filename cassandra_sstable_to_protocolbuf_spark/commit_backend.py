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
  steal                         -- at-most-once reclaim of a crashed
                                   claim (POSIX: rename-then-unlink; S3:
                                   conditional PUT of a caller-unique
                                   reclaim TOMBSTONE with If-Match:
                                   <etag>, left in place -- GP buckets
                                   have no conditional delete, and an
                                   unconditional one could land after
                                   another writer re-created the key)
  claim                         -- tombstone-aware CAS create (the
                                   post-steal claim path)
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
import contextlib
import json
import os
import tempfile
import threading
import time
import uuid

# -- reclaim tombstones ---------------------------------------------------
# Backends without an at-most-once *removal* primitive (S3 GP buckets:
# conditional PUT yes, conditional DELETE no) implement steal() as a
# conditional PUT of a recognized, caller-unique TOMBSTONE body that is
# left in place -- no stealer ever issues a DELETE, so a delayed request
# can never destroy a claim another writer re-created at the same key
# (advisor r9, high). The only transition out of a tombstone is the CAS
# replace inside claim(), which arbitrates racers exactly once.
_TOMBSTONE_FIELD = "reclaimed-by"


def make_reclaim_tombstone(guards: list[str] | None = None) -> str:
    """A caller-unique tombstone body (the uuid makes lost-response
    body-compare disambiguation sound, like every other claim body).
    `guards` optionally records which data files the retired object
    referred to: a vacuum may hard-DELETE a tombstone only when it can
    prove the path can never be claimed again (every guarded file
    gone), because an unconditional delete in flight destroys whatever
    a concurrent claimer just created at the path."""
    rec: dict = {_TOMBSTONE_FIELD: uuid.uuid4().hex}
    if guards is not None:
        rec["guards"] = sorted(guards)
    return json.dumps(rec)


def is_reclaim_tombstone(text: str) -> bool:
    """True iff `text` is a reclaim tombstone. Protocol claim bodies
    (versioned manifests, txnlog records, manifest roots) all carry
    other mandatory fields, so the shape cannot collide."""
    try:
        rec = json.loads(text)
    except ValueError:
        return False
    return (isinstance(rec, dict) and _TOMBSTONE_FIELD in rec
            and set(rec) <= {_TOMBSTONE_FIELD, "guards"})


def tombstone_guards(text: str) -> list[str] | None:
    """The `guards` list of a reclaim tombstone (None when absent or
    not a tombstone)."""
    if not is_reclaim_tombstone(text):
        return None
    return json.loads(text).get("guards")


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
        """At-most-once reclaim of an existing object: of N concurrent
        stealers exactly one returns True. Postcondition: the object is
        either ABSENT (backends with an atomic removal primitive) or
        holds a reclaim TOMBSTONE (is_reclaim_tombstone) -- either way
        the key is claimable via claim(). Stealers must NEVER issue an
        unconditional delete that could land after another writer
        re-creates the key: on object stores the tombstone stays in
        place and only the claim() CAS replaces it (advisor r9). A
        stealer that observes an existing tombstone loses cleanly
        (another reclaim is in flight)."""

    @abc.abstractmethod
    def delete(self, path: str) -> None:
        """Idempotent removal (vacuum plane)."""

    def claim(self, path: str, text: str) -> bool:
        """Tombstone-aware CAS create: the claim primitive protocol
        layers use after a steal(). put_if_absent, falling back to a
        CAS replace when the key holds a reclaim tombstone (a stealer
        won but has not -- or crashed before -- re-claiming; on object
        stores the tombstone is steal's normal postcondition). Of N
        racers on one tombstone the put_if_match arbitrates exactly
        one winner. `text` must be caller-unique like every claim
        body."""
        for _ in range(2):
            if self.put_if_absent(path, text):
                return True
            try:
                cur = self.read_text(path)
            except FileNotFoundError:
                continue  # removed between the 412 and the read: retry
            if is_reclaim_tombstone(cur):
                return self.put_if_match(path, text, cur)
            return False
        return False

    def put_atomic_fenced(self, path: str, text: str) -> None:
        """Last-writer-wins overwrite that SERIALIZES with concurrent
        put_if_match CAS attempts on the same path. On backends whose
        CAS is natively atomic against any PUT (object stores: the
        overwrite changes the ETag, so an in-flight If-Match loses)
        this is just put_atomic; backends whose CAS is lock-based
        (POSIX flock) must take the same lock so a reseed cannot be
        silently overwritten by an in-flight CAS holding a pre-reseed
        snapshot (advisor r9). Use for manifest init/reseed."""
        self.put_atomic(path, text)

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

    @contextlib.contextmanager
    def _cas_lock(self, path: str):
        """Sidecar flock serializing CAS/fenced writes on `path`, with
        unlink-safe acquisition: the holder unlinks the sidecar on
        release (no litter), so an acquirer must verify -- after the
        flock lands -- that the path still names the inode it locked;
        a stale inode means the prior holder unlinked it while we
        blocked, and a fresh open may race a third party, so re-open
        and re-verify until path and fd agree. Crash-safe: flocks die
        with the process and a leftover sidecar is just re-used."""
        import fcntl

        lock_path = path + ".cas-lock"
        os.makedirs(os.path.dirname(path), exist_ok=True)
        while True:
            lock = open(lock_path, "a+", encoding="utf-8")
            fcntl.flock(lock.fileno(), fcntl.LOCK_EX)
            try:
                cur = os.stat(lock_path)
            except FileNotFoundError:
                cur = None
            mine = os.fstat(lock.fileno())
            if cur is not None and (cur.st_ino, cur.st_dev) == \
                    (mine.st_ino, mine.st_dev):
                break
            fcntl.flock(lock.fileno(), fcntl.LOCK_UN)
            lock.close()
        try:
            yield
        finally:
            # unlink BEFORE unlock: anyone blocked on our inode sees
            # the stale-inode condition and re-opens -- never two
            # holders on different inodes
            try:
                os.unlink(lock_path)
            except OSError:
                pass
            fcntl.flock(lock.fileno(), fcntl.LOCK_UN)
            lock.close()

    def put_if_match(self, path: str, text: str, expected: str) -> bool:
        # POSIX has no native compare-and-swap on file contents: take a
        # sidecar flock (auto-released on crash -- no deadlock), compare
        # under it, publish via the same temp+fsync+rename primitive.
        # Readers never lock: they see old or new atomically via rename.
        with self._cas_lock(path):
            try:
                with open(path, encoding="utf-8") as f:
                    if f.read() != expected:
                        return False
            except FileNotFoundError:
                return False
            self.put_atomic(path, text)
            return True

    def put_atomic_fenced(self, path: str, text: str) -> None:
        # reseed/overwrite under the SAME lock put_if_match holds, so
        # an in-flight CAS that compared against the pre-reseed
        # snapshot cannot rename over the reseed (its compare re-runs
        # after we release and fails); object-store backends get this
        # for free from ETag arbitration
        with self._cas_lock(path):
            self.put_atomic(path, text)

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
    PUT of a reclaim tombstone -- here collapsed to an atomic pop,
    which is the same linearization point -- put_atomic == plain PUT);
    swapping the dict operations for boto3 calls yields a production
    S3 backend with the same contract.
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


def sweep_cas_locks(root_dir: str) -> list[str]:
    """Remove crash-leftover `.cas-lock` sidecars under `root_dir`
    (recursive). Live CAS holders release-and-unlink their own sidecar,
    so any file present is either actively held or a crash leftover --
    and mtime cannot distinguish them (a reused leftover keeps its old
    mtime while held). The safe discriminator is the flock itself: try
    a NON-BLOCKING exclusive lock; success proves no holder, and
    unlinking under the lock is exactly the release path's discipline
    (the inode-recheck in _cas_lock keeps any concurrent acquirer
    correct). Held locks are skipped. Returns the removed paths."""
    import fcntl
    import glob as _glob

    removed = []
    for path in _glob.glob(os.path.join(root_dir, "**", "*.cas-lock"),
                           recursive=True):
        try:
            f = open(path, "a+", encoding="utf-8")
        except OSError:
            continue
        try:
            try:
                fcntl.flock(f.fileno(), fcntl.LOCK_EX | fcntl.LOCK_NB)
            except OSError:
                continue  # actively held: not ours to sweep
            try:
                cur = os.stat(path)
            except FileNotFoundError:
                continue  # the holder just released and unlinked it
            mine = os.fstat(f.fileno())
            if (cur.st_ino, cur.st_dev) != (mine.st_ino, mine.st_dev):
                continue  # recreated underneath us: leave the new one
            os.unlink(path)
            removed.append(path)
        finally:
            f.close()
    return removed


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
