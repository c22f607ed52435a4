"""Manifest-backed sstable discovery (VERDICT r7 #6).

Native-source planning walked the directory with a recursive glob per
plan -- O(files) driver syscalls, and on an object store one paginated
LIST per query, which dominates planning at 100k+ sstables. This
module gives a plain native directory an OPT-IN manifest: one JSON
object (through the CommitBackend, so it is a single GET on S3)
listing every live Data.db, consulted by reader and planner discovery
before any directory walk. Directories without a manifest keep the
walk -- the manifest is an accelerator a deployment turns on, never a
requirement.

Consistency model (the crash windows are closed by ORDERING, with the
maintenance transaction log as the arbiter):

* The manifest lists every sstable the directory OWNS, including
  in-flight OPTIMIZE outputs; per-transaction visibility stays
  txnlog.filter_live's job, exactly as with the walk. Discovery =
  manifest read + filter_live: identical semantics, one LIST saved.
* OPTIMIZE ordering: outputs are ADDED before txnlog.commit (so the
  instant the swap commits, readers can see them) and inputs are
  REMOVED from the manifest before their files are unlinked (so the
  manifest never references deleted files). txnlog.recover repairs
  both crash windows from the log record: rollback drops the
  transaction's output entries, rollforward re-adds outputs and drops
  inputs -- recover() already runs at every optimize() start.
* A manifest entry whose file is MISSING means external tampering (or
  a writer that bypassed the maintenance APIs): discovery falls back
  to the directory walk for that plan -- degraded to O(files), never
  wrong results. The existence probe routes through the
  CommitBackend's data_exists seam (filesystem by default -- the data
  plane read tasks actually open -- overridable for deployments that
  colocate data with the protocol store), still far cheaper than a
  paginated LIST, and a deployment that trusts its maintenance
  discipline can skip it (verify_exists=False).
* ADDITIONS outside OPTIMIZE stay visible because every driver-side
  publish path records its outputs: the fixture/export writer
  (write_sstable) and the collect-and-publish export helper
  (export_sstables) both call add(); OPTIMIZE adds before
  txnlog.commit as before. A writer that bypasses the engine entirely
  (raw file copy into the directory) is outside the maintenance
  discipline -- reconcile() repairs that by union-ing a fresh walk
  into the manifest.

Updates are COMPARE-AND-SWAP (VERDICT r8 #2): read the current
manifest text, apply the mutation, publish with put_if_match on the
exact snapshot read -- two concurrent updaters (two ingest jobs
appending sstables, an add racing a remove) both keep their entries
because the loser re-reads and retries. Every written body embeds a
`rev` uuid so it is caller-unique (the S3 backend's lost-response
disambiguation contract). Readers only ever GET.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from cassandra_sstable_to_protocolbuf_spark.commit_backend import (
    get_commit_backend)

MANIFEST_NAME = "_sstables-manifest.json"
_VERSION = 1
_CAS_MAX_TRIES = 64


def manifest_path(input_dir: str) -> str:
    return os.path.join(input_dir, MANIFEST_NAME)


def read_entries(input_dir: str) -> list[str] | None:
    """Relative Data.db paths from the manifest, or None when the
    directory has no (or a malformed) manifest -- callers walk."""
    try:
        rec = json.loads(get_commit_backend().read_text(
            manifest_path(input_dir)))
        if rec.get("version") != _VERSION \
                or not isinstance(rec.get("entries"), list) \
                or not all(isinstance(e, str) for e in rec["entries"]):
            return None
        return sorted(rec["entries"])
    except (FileNotFoundError, ValueError):
        return None


def _body(entries: set[str]) -> str:
    # `rev` makes every written body caller-unique -- required by the
    # backends' lost-response CAS disambiguation, and incidentally an
    # ABA guard (two different writers producing the same entry set
    # still write different bytes)
    return json.dumps({"version": _VERSION, "rev": uuid.uuid4().hex,
                       "entries": sorted(entries)})


def _write(input_dir: str, entries: set[str]) -> None:
    # fenced: a reseed must serialize with in-flight CAS updates so a
    # CAS holding the pre-reseed snapshot cannot overwrite it
    get_commit_backend().put_atomic_fenced(manifest_path(input_dir),
                                           _body(entries))


def _cas_update(input_dir: str, mutate) -> None:
    """Apply `mutate(entries: set) -> set` under optimistic CAS: no-op
    without a (well-formed) manifest; on a lost race, re-read and
    retry -- concurrent updaters never lose each other's entries."""
    backend = get_commit_backend()
    path = manifest_path(input_dir)
    for attempt in range(_CAS_MAX_TRIES):
        try:
            cur = backend.read_text(path)
        except FileNotFoundError:
            return
        try:
            rec = json.loads(cur)
        except ValueError:
            return
        if rec.get("version") != _VERSION \
                or not isinstance(rec.get("entries"), list) \
                or not all(isinstance(e, str) for e in rec["entries"]):
            return
        new = mutate(set(rec["entries"]))
        if backend.put_if_match(path, _body(new), cur):
            return
        time.sleep(min(0.001 * (1 << min(attempt, 6)), 0.1))
    raise RuntimeError(
        f"manifest update for {input_dir} lost {_CAS_MAX_TRIES} CAS "
        f"races; a writer is livelocking the manifest")


def exists(input_dir: str) -> bool:
    return get_commit_backend().exists(manifest_path(input_dir))


def init(input_dir: str) -> list[str]:
    """Turn the manifest ON for a directory: seed it from one (final)
    recursive walk. Returns the seeded relative paths."""
    import glob

    from cassandra_sstable_to_protocolbuf_spark.sources.sstable_native import (
        DATA_SUFFIX)

    entries = {os.path.relpath(p, input_dir)
               for p in glob.glob(os.path.join(
                   input_dir, "**", f"*{DATA_SUFFIX}"), recursive=True)}
    _write(input_dir, entries)
    return sorted(entries)


def add(input_dir: str, data_paths: list[str]) -> None:
    """Record new sstables (no-op without a manifest). Idempotent;
    CAS-safe against any concurrent add/remove."""
    rel = {os.path.relpath(p, input_dir) for p in data_paths}
    _cas_update(input_dir, lambda entries: entries | rel)


def remove(input_dir: str, data_paths: list[str]) -> None:
    """Drop sstables from the manifest (no-op without one; call BEFORE
    unlinking the files so the manifest never points at ghosts).
    Idempotent; CAS-safe against any concurrent add/remove."""
    rel = {os.path.relpath(p, input_dir) for p in data_paths}
    _cas_update(input_dir, lambda entries: entries - rel)


def remove_by_basename_prefix(input_dir: str, prefix: str) -> None:
    """Drop every entry whose basename starts with `prefix` -- the
    rollback sweep's manifest mirror (a BEGIN-state transaction log
    knows its outputs only by name prefix). CAS-safe."""
    _cas_update(input_dir, lambda entries: {
        e for e in entries
        if not os.path.basename(e).startswith(prefix)})


def reconcile(input_dir: str) -> list[str]:
    """Operational repair for out-of-band additions (raw file copies
    that bypassed every publish API): union a fresh recursive walk into
    the manifest (no-op without one). Returns the entries that were
    missing. Removals need no repair -- discovery's existence probe
    already falls back on them."""
    import glob

    from cassandra_sstable_to_protocolbuf_spark.sources.sstable_native import (
        DATA_SUFFIX)

    walked = {os.path.relpath(p, input_dir)
              for p in glob.glob(os.path.join(
                  input_dir, "**", f"*{DATA_SUFFIX}"), recursive=True)}
    before = read_entries(input_dir)
    if before is None:
        return []
    missing = sorted(walked - set(before))
    if missing:
        _cas_update(input_dir, lambda entries: entries | walked)
    return missing


def data_files(input_dir: str,
               verify_exists: bool = True) -> list[str] | None:
    """Manifest-driven discovery: absolute Data.db paths, or None when
    the directory has no manifest OR the manifest references a missing
    file (external tampering: fall back to the walk -- degraded cost,
    never wrong results). The probe goes through the CommitBackend's
    data_exists seam: the filesystem by default (how read tasks open
    components), overridable by a deployment whose data lives in the
    same object store as the protocol plane."""
    entries = read_entries(input_dir)
    if entries is None:
        return None
    backend = get_commit_backend()
    paths = [os.path.join(input_dir, e) for e in entries]
    if verify_exists and not all(backend.data_exists(p) for p in paths):
        return None
    return paths
