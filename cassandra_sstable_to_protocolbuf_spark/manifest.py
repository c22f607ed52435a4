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
  wrong results. The existence probe is per-entry HEAD-shaped, still
  far cheaper than a paginated LIST, and a deployment that trusts its
  maintenance discipline can skip it (verify_exists=False).

Updates go through read-modify-put_atomic. Concurrent UPDATE safety
rides the txnlog claim: only one maintainer owns a bin, and the
single-maintainer-per-directory posture (txnlog.py docstring) is
already the engine's compaction model. Readers only ever GET.
"""

from __future__ import annotations

import json
import os

from cassandra_sstable_to_protocolbuf_spark.commit_backend import (
    get_commit_backend)

MANIFEST_NAME = "_sstables-manifest.json"
_VERSION = 1


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


def _write(input_dir: str, entries: set[str]) -> None:
    get_commit_backend().put_atomic(
        manifest_path(input_dir),
        json.dumps({"version": _VERSION, "entries": sorted(entries)}))


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
    """Record new sstables (no-op without a manifest). Idempotent."""
    entries = read_entries(input_dir)
    if entries is None:
        return
    rel = {os.path.relpath(p, input_dir) for p in data_paths}
    _write(input_dir, set(entries) | rel)


def remove(input_dir: str, data_paths: list[str]) -> None:
    """Drop sstables from the manifest (no-op without one; call BEFORE
    unlinking the files so the manifest never points at ghosts).
    Idempotent."""
    entries = read_entries(input_dir)
    if entries is None:
        return
    rel = {os.path.relpath(p, input_dir) for p in data_paths}
    _write(input_dir, set(entries) - rel)


def remove_by_basename_prefix(input_dir: str, prefix: str) -> None:
    """Drop every entry whose basename starts with `prefix` -- the
    rollback sweep's manifest mirror (a BEGIN-state transaction log
    knows its outputs only by name prefix)."""
    entries = read_entries(input_dir)
    if entries is None:
        return
    _write(input_dir, {e for e in entries
                       if not os.path.basename(e).startswith(prefix)})


def data_files(input_dir: str,
               verify_exists: bool = True) -> list[str] | None:
    """Manifest-driven discovery: absolute Data.db paths, or None when
    the directory has no manifest OR the manifest references a missing
    file (external tampering: fall back to the walk -- degraded cost,
    never wrong results)."""
    entries = read_entries(input_dir)
    if entries is None:
        return None
    paths = [os.path.join(input_dir, e) for e in entries]
    if verify_exists and not all(os.path.exists(p) for p in paths):
        return None
    return paths
