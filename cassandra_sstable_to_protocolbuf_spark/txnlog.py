"""Maintenance transaction log: crash-safe in-place sstable rewrites.

The round-6 audit's #1 gap: optimize() published a bin's outputs and
then unlinked its inputs with nothing in between -- a crash in the
window left two generations on disk and a concurrent reader enumerating
the directory mid-swap could see both (or a half-removed input set).
This module is the fix: every in-place rewrite (today: the OPTIMIZE
executor's per-bin merge) runs under a tiny two-state transaction log,
the same design Cassandra grew for exactly this problem (the sstable
lifecycle transaction log, CASSANDRA-7066) and the crash-safe outgrowth
of the reference's close-on-success-or-error discipline
(Runner.java:76-82).

Protocol, per transaction (one OPTIMIZE bin):

  1. BEGIN   -- put_if_absent of `<dir>/_txn/<name>.json` recording the
               output name prefix and the exact input files. The CAS
               create is the claim: two executors cannot run the same
               bin.
  2. publish -- the data plane writes output components (each file is
               individually atomic via temp+rename, as before).
  3. COMMIT  -- put_atomic flips the log to state COMMIT, now also
               recording the published outputs. THIS is the atomic
               commit point of the whole swap.
  4. clean   -- input components unlink, then the log is deleted.

Reader visibility (`filter_live`) makes every intermediate state
consistent: a BEGIN log hides the transaction's outputs (readers see
only the old generation), a COMMIT log hides its inputs (readers see
only the new generation). Discovery without any log sees exactly the
published files -- the zero-cost fast path.

Recovery (`recover`) is a pure function of the logs: BEGIN rolls back
(partial outputs deleted, inputs untouched), COMMIT rolls forward
(leftover inputs deleted). After recovery exactly one generation
remains and the directory carries no log -- idempotent, so optimize()
runs it unconditionally at startup.

Only the PROTOCOL plane (the log objects) routes through the
CommitBackend seam (commit_backend.py) -- put_if_absent / put_atomic /
read_text / listdir / delete, the same five primitives the versioned
table's OCC protocol uses, so the log works unchanged on an object
store with conditional puts. The data plane (sstable components) stays
on the filesystem Spark writes through.

Single-maintainer assumption (Cassandra's own posture: one compaction
manager per data directory): recovery at optimize() startup assumes no
OTHER process is mid-transaction on the same directory. Within one
process, the BEGIN claim serializes executors per bin.
"""

from __future__ import annotations

import glob
import json
import os

from cassandra_sstable_to_protocolbuf_spark.commit_backend import (
    get_commit_backend)

TXN_DIR_NAME = "_txn"


def txn_dir(input_dir: str) -> str:
    return os.path.join(input_dir, TXN_DIR_NAME)


def _log_path(input_dir: str, name: str) -> str:
    return os.path.join(txn_dir(input_dir), name + ".json")


def begin(input_dir: str, name: str, output_prefix: str,
          input_paths: list[str]) -> None:
    """Claim the transaction: CAS-create the BEGIN log. Raises when the
    name is already claimed (a concurrent maintainer owns the bin).

    The record carries a caller-unique `owner` nonce: every other field
    is a deterministic function of the bin, so two concurrent
    maintainers would otherwise write byte-identical claims -- and the
    S3 backend's lost-response disambiguation (read the object back,
    byte-compare) would then let BOTH believe they won the CAS. The
    nonce makes claim bodies unique, so body-compare identifies exactly
    one owner."""
    import uuid

    rec = {"state": "BEGIN", "name": name, "owner": uuid.uuid4().hex,
           "output_prefix": output_prefix,
           "inputs": sorted(os.path.relpath(p, input_dir)
                            for p in input_paths)}
    if not get_commit_backend().put_if_absent(
            _log_path(input_dir, name), json.dumps(rec)):
        raise RuntimeError(
            f"maintenance transaction {name!r} is already claimed in "
            f"{input_dir} (concurrent optimize, or a crashed run that "
            f"was not recovered)")


def commit(input_dir: str, name: str, output_paths: list[str]) -> None:
    """The atomic commit point: flip the log to COMMIT, recording the
    published outputs. After this, readers see the new generation."""
    backend = get_commit_backend()
    path = _log_path(input_dir, name)
    rec = json.loads(backend.read_text(path))
    if rec.get("state") != "BEGIN":
        raise RuntimeError(
            f"maintenance transaction {name!r} in state "
            f"{rec.get('state')!r}, expected BEGIN")
    rec["state"] = "COMMIT"
    rec["outputs"] = sorted(os.path.relpath(p, input_dir)
                            for p in output_paths)
    backend.put_atomic(path, json.dumps(rec))


def finish(input_dir: str, name: str) -> None:
    """Checkpoint: the committed transaction's inputs are fully removed;
    drop the log (idempotent)."""
    get_commit_backend().delete(_log_path(input_dir, name))


def read_logs(input_dir: str) -> list[dict]:
    """All live transaction records under `<dir>/_txn`, name-sorted.
    A directory that never ran a transaction returns [] (fast path)."""
    backend = get_commit_backend()
    try:
        names = backend.listdir(txn_dir(input_dir))
    except FileNotFoundError:
        return []
    recs = []
    for fname in sorted(names):
        if not fname.endswith(".json"):
            continue
        try:
            text = backend.read_text(os.path.join(txn_dir(input_dir), fname))
        except FileNotFoundError:
            continue  # finished between listdir and read: already clean
        rec = json.loads(text)
        if rec.get("state") not in ("BEGIN", "COMMIT") \
                or "output_prefix" not in rec or "inputs" not in rec:
            raise ValueError(
                f"corrupt maintenance transaction log {fname} in "
                f"{input_dir}: {text[:200]!r}")
        recs.append(rec)
    return recs


def _output_basename_prefix(output_prefix: str) -> str:
    # outputs are written flat into input_dir by the sstable writer as
    # ks-<sstable_id>-ka-<gen> components where sstable_id starts with
    # "<output_prefix>-" (token shard appended); temp files share the
    # prefix too, so a rollback sweep catches them as well
    return f"ks-{output_prefix}-"


def filter_live(input_dir: str, data_paths: list[str]) -> list[str]:
    """The reader-visible subset of `data_paths` under the transaction
    log: BEGIN hides that transaction's outputs (old generation wins),
    COMMIT hides its inputs (new generation wins). With no log this is
    the identity -- one listdir miss, zero data IO."""
    recs = read_logs(input_dir)
    if not recs:
        return data_paths
    hidden_inputs: set[str] = set()
    hidden_prefixes: list[str] = []
    for rec in recs:
        if rec["state"] == "COMMIT":
            hidden_inputs.update(rec["inputs"])
        else:
            hidden_prefixes.append(_output_basename_prefix(
                rec["output_prefix"]))
    out = []
    for p in data_paths:
        rel = os.path.relpath(p, input_dir)
        base = os.path.basename(p)
        if rel in hidden_inputs:
            continue
        if any(base.startswith(pref) for pref in hidden_prefixes):
            continue
        out.append(p)
    return out


def unlink_components(data_path: str) -> None:
    """Remove every component of one sstable (idempotent)."""
    from cassandra_sstable_to_protocolbuf_spark.sources.sstable_native import (
        ALL_SUFFIXES, DATA_SUFFIX)

    base = data_path[:-len(DATA_SUFFIX)]
    for suffix in ALL_SUFFIXES:
        try:
            os.unlink(base + suffix)
        except FileNotFoundError:
            pass


def recover(input_dir: str) -> list[dict]:
    """Replay the log to exactly one consistent generation: BEGIN rolls
    back (partial outputs and temp files removed, inputs untouched),
    COMMIT rolls forward (leftover inputs removed). Idempotent; returns
    the actions taken, [{"name", "action"}]."""
    from cassandra_sstable_to_protocolbuf_spark import manifest

    backend = get_commit_backend()
    actions = []
    for rec in read_logs(input_dir):
        name = rec["name"]
        if rec["state"] == "BEGIN":
            # rollback: sweep everything carrying the output prefix --
            # published components AND in-flight writer temps -- and
            # mirror the sweep in the manifest (outputs may have been
            # recorded just before a crash pre-commit)
            pref = _output_basename_prefix(rec["output_prefix"])
            manifest.remove_by_basename_prefix(input_dir, pref)
            for path in glob.glob(
                    glob.escape(os.path.join(input_dir, pref)) + "*"):
                try:
                    os.unlink(path)
                except FileNotFoundError:
                    pass
            action = "rollback"
        else:
            # rollforward: outputs must be in the manifest (the crash
            # may have landed between commit and the manifest add) and
            # inputs must leave it BEFORE their files unlink
            manifest.add(input_dir,
                         [os.path.join(input_dir, rel)
                          for rel in rec.get("outputs", [])])
            manifest.remove(input_dir,
                            [os.path.join(input_dir, rel)
                             for rel in rec["inputs"]])
            for rel in rec["inputs"]:
                unlink_components(os.path.join(input_dir, rel))
            action = "rollforward"
        backend.delete(_log_path(input_dir, name))
        actions.append({"name": name, "action": action})
    return actions
