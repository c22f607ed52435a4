"""Manifest-versioned landed table (versioned.py): commit protocol,
snapshot isolation, time travel, restore, vacuum, crash recovery.

The correctness of BOTH snapshots of a merged table against from-scratch
DuckDB reconstructions is gated by the catalog query `sst_time_travel`;
these tests pin the table-format mechanics the gate can't see.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from cassandra_sstable_to_protocolbuf_spark.landed import key_shard, lww_winners
from cassandra_sstable_to_protocolbuf_spark.versioned import (
    current_version, delete_keys_versioned, init_versioned, merge_versioned,
    read_manifest, read_version, restore_version, vacuum)


def _cells(spark, rows):
    """rows: (key, name, value, writeTime, sstable_id, cell_kind)."""
    return spark.createDataFrame(
        [(k.encode(), n.encode(), v.encode(), wt, sid, kind)
         for k, n, v, wt, sid, kind in rows],
        "key binary, name binary, value binary, writeTime long, "
        "sstable_id string, cell_kind string")


def _content(df):
    """Comparable {(key, name): (value, writeTime)} map."""
    return {(bytes(r.key), bytes(r.name)): (bytes(r.value), r.writeTime)
            for r in df.collect()}


@pytest.fixture()
def base_rows():
    return [(f"k{i}", "c", f"base{i}", 100, "sst-base", "LIVE")
            for i in range(40)]


@pytest.fixture()
def table(spark, base_rows, tmp_path):
    t = str(tmp_path / "vt")
    v = init_versioned(spark, _cells(spark, base_rows), t)
    assert v == 0
    return t


def test_init_read_is_lww(spark, table, base_rows):
    got = _content(read_version(spark, table))
    assert got == {(k.encode(), b"c"): (v.encode(), 100)
                   for k, _c, v, _wt, _s, _k in base_rows}


def test_merge_commits_new_version_and_preserves_old(spark, table, base_rows):
    delta = _cells(spark, [("k7", "c", "newer", 200, "sst-d", "LIVE"),
                           ("brand", "c", "new", 50, "sst-d", "LIVE")])
    assert merge_versioned(spark, table, delta) == 1
    assert current_version(table) == 1

    v1 = _content(read_version(spark, table))
    assert v1[(b"k7", b"c")] == (b"newer", 200)
    assert v1[(b"brand", b"c")] == (b"new", 50)
    assert len(v1) == len(base_rows) + 1

    # time travel: v0 is still exactly the pre-merge table
    v0 = _content(read_version(spark, table, 0))
    assert v0 == {(k.encode(), b"c"): (v.encode(), 100)
                  for k, _c, v, _wt, _s, _k in base_rows}


def test_untouched_shards_carry_over_by_reference(spark, table):
    m0 = read_manifest(table, 0)
    delta = _cells(spark, [("k7", "c", "x", 200, "sst-d", "LIVE")])
    merge_versioned(spark, table, delta)
    [shard] = [str(r["s"]) for r in spark.range(1).select(
        key_shard(F.lit(b"k7")).alias("s")).collect()]
    m1 = read_manifest(table, 1)
    assert m1["files"][shard] != m0["files"].get(shard)
    for s, fl in m0["files"].items():
        if s != shard:
            assert m1["files"][s] == fl  # same relpaths: zero I/O carry-over
    # snapshot isolation: every v0 file still exists (a reader pinning
    # the v0 manifest mid-merge is never broken)
    for fl in m0["files"].values():
        for p in fl:
            assert os.path.exists(os.path.join(table, p))


def test_empty_delta_is_a_no_op_commit(spark, table):
    empty = _cells(spark, [])
    assert merge_versioned(spark, table, empty) == 0
    assert current_version(table) == 0


def test_delete_keys_versioned_keeps_history(spark, table):
    keys = spark.createDataFrame([(b"k3",), (b"k9",)], "key binary")
    assert delete_keys_versioned(spark, table, keys) == 1
    v1 = _content(read_version(spark, table))
    assert (b"k3", b"c") not in v1 and (b"k9", b"c") not in v1
    assert len(v1) == 38
    assert len(_content(read_version(spark, table, 0))) == 40


def test_restore_is_a_new_version_sharing_files(spark, table):
    delta = _cells(spark, [("k7", "c", "bad", 200, "sst-d", "LIVE")])
    merge_versioned(spark, table, delta)
    assert restore_version(table, 0) == 2
    assert current_version(table) == 2
    assert _content(read_version(spark, table)) == _content(
        read_version(spark, table, 0))
    assert read_manifest(table, 2)["files"] == read_manifest(table, 0)["files"]


def test_vacuum_reclaims_old_versions_only(spark, table):
    for i in range(3):
        merge_versioned(spark, table, _cells(
            spark, [("k7", "c", f"u{i}", 200 + i, "sst-d", "LIVE")]))
    assert current_version(table) == 3
    keep_files = {p for fl in read_manifest(table, 3)["files"].values()
                  for p in fl}
    keep_files |= {p for fl in read_manifest(table, 2)["files"].values()
                   for p in fl}
    deleted = vacuum(table, retain=2, min_file_age_s=0)
    assert deleted, "expected vacuum to reclaim something"
    # current and current-1 remain fully readable
    assert read_version(spark, table, 3).count() == 40
    assert read_version(spark, table, 2).count() == 40
    for p in keep_files:
        assert os.path.exists(os.path.join(table, p))
    # older snapshots are gone, and report so cleanly
    with pytest.raises(FileNotFoundError):
        read_version(spark, table, 0)
    # no deleted path is referenced by a retained manifest
    rel_deleted = {os.path.relpath(p, table) for p in deleted
                   if p.endswith(".parquet")}
    assert not (rel_deleted & keep_files)


def test_stale_crash_manifest_is_reclaimed_after_grace(spark, table):
    # a crash after writing v1's manifest but BEFORE repointing _current
    # leaves a stale v1.json; once past the liveness grace window the
    # next commit reclaims v1 cleanly
    stale = os.path.join(table, "_manifests", "v1.json")
    with open(stale, "w", encoding="utf-8") as f:
        json.dump({"version": 1, "files": {"0": ["data/cjunk/x.parquet"]}}, f)
    os.utime(stale, (0, 0))  # age it past STALE_MANIFEST_GRACE_S
    assert current_version(table) == 0
    delta = _cells(spark, [("k7", "c", "real", 200, "sst-d", "LIVE")])
    assert merge_versioned(spark, table, delta) == 1
    assert _content(read_version(spark, table))[(b"k7", b"c")] == (b"real", 200)


def test_concurrent_commit_raises_conflict(spark, table):
    """Optimistic concurrency: a writer whose target version was taken
    by another writer (manifest exists AND current advanced) must get
    CommitConflict, not silently clobber the winner's snapshot."""
    from cassandra_sstable_to_protocolbuf_spark.versioned import CommitConflict

    d1 = _cells(spark, [("k7", "c", "winner", 200, "sst-d", "LIVE")])
    assert merge_versioned(spark, table, d1) == 1
    # simulate the loser: it read current=0 earlier and tries to claim v1
    from cassandra_sstable_to_protocolbuf_spark import versioned as V
    with pytest.raises(CommitConflict, match="another writer"):
        V._commit(table, {"0": ["data/c1/pshard=0/x.parquet"]}, 1)
    # the winner's snapshot is untouched
    assert _content(read_version(spark, table))[(b"k7", b"c")] == (b"winner", 200)


def test_live_midcommit_manifest_is_not_clobbered(spark, table):
    """A FRESH uncommitted manifest (another writer between its manifest
    write and _current repoint) must raise, not be reclaimed."""
    from cassandra_sstable_to_protocolbuf_spark import versioned as V
    from cassandra_sstable_to_protocolbuf_spark.versioned import CommitConflict

    fresh = os.path.join(table, "_manifests", "v1.json")
    with open(fresh, "w", encoding="utf-8") as f:
        json.dump({"version": 1, "files": {}}, f)
    with pytest.raises(CommitConflict, match="mid-commit"):
        V._commit(table, {}, 1)


def test_versioned_matches_lww_winners_plan(spark, table, base_rows):
    # the merged snapshot equals a from-scratch lww_winners over the
    # union of all input generations (the catalog gate proves this vs
    # DuckDB at fixture scale; here at unit scale with ties)
    delta = _cells(spark, [("k1", "c", "tie", 100, "sst-zzz", "LIVE"),
                           ("k2", "c", "older", 50, "sst-d", "LIVE")])
    merge_versioned(spark, table, delta)
    all_cells = _cells(spark, base_rows).unionByName(delta)
    expect = _content(lww_winners(all_cells))
    assert _content(read_version(spark, table)) == expect


def test_mor_append_is_o_delta_and_read_merged_reconciles(
        spark, table, base_rows):
    from cassandra_sstable_to_protocolbuf_spark.versioned import (
        append_versioned, read_merged)

    delta = _cells(spark, [("k7", "c", "newer", 200, "sst-d", "LIVE"),
                           ("brand", "c", "new", 50, "sst-d", "LIVE")])
    assert append_versioned(spark, table, delta) == 1
    # O(delta) commit: the new commit dir holds ONLY the delta's rows
    import glob
    c1_files = glob.glob(os.path.join(table, "data", "c1-*", "**", "*.parquet"),
                         recursive=True)
    assert spark.read.parquet(*c1_files).count() == 2
    # read-time reconciliation sees the winners
    merged = _content(read_merged(spark, table))
    assert merged[(b"k7", b"c")] == (b"newer", 200)
    assert merged[(b"brand", b"c")] == (b"new", 50)
    assert len(merged) == len(base_rows) + 1
    # the raw (unreconciled) snapshot carries both generations of k7
    from cassandra_sstable_to_protocolbuf_spark.versioned import read_version
    raw = read_version(spark, table).filter(F.col("key") == b"k7").count()
    assert raw == 2


def test_compaction_folds_mor_debt_content_invariant(spark, table):
    from cassandra_sstable_to_protocolbuf_spark.versioned import (
        append_versioned, compact_versioned, read_manifest, read_merged,
        read_version)

    for i in range(3):
        append_versioned(spark, table, _cells(
            spark, [("k7", "c", f"u{i}", 200 + i, "sst-d", "LIVE")]))
    m = read_manifest(table)
    [k7_shard] = [str(r["s"]) for r in spark.range(1).select(
        key_shard(F.lit(b"k7")).alias("s")).collect()]
    assert len(m["files"][k7_shard]) == 4  # base + 3 MoR generations
    before = _content(read_merged(spark, table))

    v = compact_versioned(spark, table)
    assert v == 4
    m2 = read_manifest(table)
    assert all(len(fl) == 1 for fl in m2["files"].values())
    # only the debt shard was rewritten; others carried over by reference
    for s, fl in m["files"].items():
        if s != k7_shard:
            assert m2["files"][s] == fl
    # content invariant, and the compacted snapshot needs no reconcile
    assert _content(read_version(spark, table)) == before
    assert _content(read_merged(spark, table)) == before
    # fully compacted -> further compaction is a no-op commit
    assert compact_versioned(spark, table) == 4


def test_mor_replay_is_content_invariant(spark, table):
    """At-least-once replay of a MoR batch appends duplicate files but
    identical winners -- the LWW algebra that makes append_versioned a
    safe streaming (foreachBatch) sink."""
    from cassandra_sstable_to_protocolbuf_spark.versioned import (
        append_versioned, read_merged)

    delta = _cells(spark, [("k7", "c", "newer", 200, "sst-d", "LIVE")])
    append_versioned(spark, table, delta)
    once = _content(read_merged(spark, table))
    append_versioned(spark, table, delta)  # replay
    assert _content(read_merged(spark, table)) == once


def test_schema_recorded_and_enforced(spark, table):
    """The manifest records the commit schema; reads use it (no footer
    inference), and a mismatched-schema commit is refused instead of
    silently dropping columns through the LWW reconciler."""
    from cassandra_sstable_to_protocolbuf_spark.versioned import (
        append_versioned, read_manifest)

    m = read_manifest(table)
    assert m.get("schema"), "manifest should record the table schema"
    assert set(read_version(spark, table).columns) == {
        "key", "name", "value", "writeTime", "sstable_id", "shard"}

    widened = (_cells(spark, [("k7", "c", "x", 200, "sst-d", "LIVE")])
               .withColumn("extra", F.lit(1)))
    with pytest.raises(ValueError, match="unknown to the LWW"):
        append_versioned(spark, table, widened)
    # refused commit left no new version behind
    assert current_version(table) == 0


def test_diff_versions_reads_only_touched_shards(spark, table, base_rows):
    """The CDC diff must scan only shards whose manifest file lists
    differ between the two snapshots -- carried-over shards are
    immutable and can't contribute changes -- and must still report
    exactly the full snapshot-minus-snapshot diff."""
    from cassandra_sstable_to_protocolbuf_spark.versioned import diff_versions

    delta = _cells(spark, [("k3", "c", "newer3", 200, "sst-d", "LIVE"),
                           ("kx", "c", "brand-new", 200, "sst-d", "LIVE")])
    v1 = merge_versioned(spark, table, delta)

    ch = diff_versions(spark, table, 0, v1)
    rows = {(bytes(r.key).decode(), r.change_type): r for r in ch.collect()}
    assert set(rows) == {("k3", "update"), ("kx", "insert")}
    assert bytes(rows[("k3", "update")].old_value) == b"base3"
    assert bytes(rows[("k3", "update")].new_value) == b"newer3"
    assert rows[("kx", "insert")].old_value is None

    # pruning: every file the diff plan reads belongs to a shard whose
    # file list differs between the v0 and v1 manifests
    m0, m1 = read_manifest(table, 0), read_manifest(table, 1)
    touched = {s for s in set(m0["files"]) | set(m1["files"])
               if m0["files"].get(s) != m1["files"].get(s)}
    allowed = {os.path.join(table, p)
               for m in (m0, m1) for s in touched
               for p in m["files"].get(s, [])}
    read = {f.removeprefix("file://") for f in ch.inputFiles()}
    assert read and read <= allowed, (
        f"diff read untouched-shard files: {sorted(read - allowed)[:3]}")
    # and the carried-over shards exist (the pruning actually pruned)
    assert touched < set(m1["files"]), "fixture degenerate: all shards touched"


def test_merge_into_is_one_commit(spark, table, base_rows):
    """Mixed upsert+delete batch must land as a SINGLE version, apply
    deletes to the current snapshot before the upsert merge, and carry
    untouched shards by reference."""
    from cassandra_sstable_to_protocolbuf_spark.versioned import (
        merge_into_versioned)

    ups = _cells(spark, [("k3", "c", "after3", 200, "sst-m", "LIVE"),
                         ("k5", "c", "after5", 200, "sst-m", "LIVE"),
                         ("knew", "c", "fresh", 200, "sst-m", "LIVE")])
    dels = spark.createDataFrame(
        [(b"k5",), (b"k7",)], "key binary")  # k5 deleted AND upserted
    v = merge_into_versioned(spark, table, ups, dels)
    assert v == 1 and current_version(table) == 1

    got = _content(read_version(spark, table, 1))
    assert got[(b"k3", b"c")] == (b"after3", 200)       # matched update
    assert got[(b"knew", b"c")] == (b"fresh", 200)      # not-matched insert
    assert (b"k7", b"c") not in got                     # matched delete
    # delete-then-upsert: k5's base row gone, upsert row present
    assert got[(b"k5", b"c")] == (b"after5", 200)
    # untouched keys intact, and v0 still time-travels to the pre-state
    assert got[(b"k0", b"c")] == (b"base0", 100)
    assert _content(read_version(spark, table, 0))[(b"k7", b"c")] == (
        b"base7", 100)


# --- partition-spec evolution ---------------------------------------------

def test_reshard_is_metadata_only_and_appends_use_new_spec(spark, table):
    from pyspark.sql import functions as F

    from cassandra_sstable_to_protocolbuf_spark.landed import key_shard
    from cassandra_sstable_to_protocolbuf_spark.versioned import (
        append_versioned, read_manifest, read_respec, reshard_versioned)

    m0 = read_manifest(table, 0)
    v1 = reshard_versioned(table, 32)
    assert v1 == 1
    m1 = read_manifest(table, 1)
    # metadata-only: identical file lists, new spec, mixed flag
    assert m1["files"] == m0["files"]
    assert m1["spec"] == {"n_shards": 32, "mixed": True}

    delta = _cells(spark, [("k1", "c", "new1", 200, "sst-d", "LIVE"),
                           ("kX", "c", "newX", 200, "sst-d", "LIVE")])
    v2 = append_versioned(spark, table, delta)
    assert v2 == 2
    m2 = read_manifest(table, 2)
    assert m2["spec"] == {"n_shards": 32, "mixed": True}
    # the appended files landed under NEW-spec labels
    new_labels = {s for s in m2["files"]
                  if m2["files"][s] != m0["files"].get(s)}
    want = {str(r[0]) for r in
            delta.select(key_shard(F.col("key"), 32)).distinct().collect()}
    assert new_labels == want
    # cross-spec read-time LWW: upsert won, insert present, rest intact
    got = _content(read_respec(spark, table))
    assert got[(b"k1", b"c")] == (b"new1", 200)
    assert got[(b"kX", b"c")] == (b"newX", 200)
    assert got[(b"k2", b"c")] == (b"base2", 100)
    assert len(got) == 41
    # the respec read's shard column follows the CURRENT spec
    rows = read_respec(spark, table).withColumn(
        "want", key_shard(F.col("key"), 32)).collect()
    assert all(r.shard == r.want for r in rows)


def test_mixed_table_guards_label_based_ops(spark, table):
    import pytest as _pytest

    from cassandra_sstable_to_protocolbuf_spark.versioned import (
        compact_versioned, delete_keys_versioned, merge_versioned,
        read_merged, reshard_versioned)

    reshard_versioned(table, 32)
    delta = _cells(spark, [("k1", "c", "x", 200, "sst-d", "LIVE")])
    for op in (lambda: merge_versioned(spark, table, delta),
               lambda: delete_keys_versioned(
                   spark, table, delta.select("key")),
               lambda: compact_versioned(spark, table),
               lambda: read_merged(spark, table)):
        with _pytest.raises(ValueError, match="spec-MIXED"):
            op()


def test_compact_respec_relabels_and_restores_coherence(spark, table):
    from pyspark.sql import functions as F

    from cassandra_sstable_to_protocolbuf_spark.landed import key_shard
    from cassandra_sstable_to_protocolbuf_spark.versioned import (
        append_versioned, compact_respec_versioned, merge_versioned,
        read_manifest, read_merged, read_respec, reshard_versioned)

    reshard_versioned(table, 32)
    append_versioned(spark, table, _cells(
        spark, [("k1", "c", "new1", 200, "sst-d", "LIVE")]))
    before = _content(read_respec(spark, table))
    v = compact_respec_versioned(spark, table)
    m = read_manifest(table, v)
    assert m["spec"] == {"n_shards": 32}  # mixed flag cleared
    # every file now lives under its key's CURRENT-spec label
    rows = read_merged(spark, table).withColumn(
        "want", key_shard(F.col("key"), 32)).collect()
    assert rows and all(r.shard == r.want for r in rows)
    assert _content(read_merged(spark, table)) == before  # invariant
    # label-based ops work again, under the evolved spec
    v2 = merge_versioned(spark, table, _cells(
        spark, [("k2", "c", "new2", 300, "sst-e", "LIVE")]))
    got = _content(read_merged(spark, table, v2))
    assert got[(b"k2", b"c")] == (b"new2", 300)


def test_vacuum_retires_above_current_leftover_without_delete(
        spark, table):
    """VERDICT r9 #6 / advisor r9: an aged crash leftover ABOVE
    `_current` is RETIRED (CAS'd to a reclaim tombstone that keeps the
    version slot occupied), never unconditionally deleted -- a delayed
    delete could destroy the manifest the next committer legitimately
    creates at that very slot (claims target exactly current+1). The
    tombstone is excluded from history, a revived stalled writer
    cannot repoint onto it, and the next commit claims straight
    through it."""
    from cassandra_sstable_to_protocolbuf_spark.commit_backend import (
        get_commit_backend, is_reclaim_tombstone)
    from cassandra_sstable_to_protocolbuf_spark.versioned import (
        _manifest_path, list_versions)

    backend = get_commit_backend()
    leftover = _manifest_path(table, 1)
    backend.put_atomic(leftover, json.dumps(
        {"version": 1, "writer": "dead-beef", "files": {}}))
    assert list_versions(table) == [0]

    deleted = vacuum(table, retain=2, min_file_age_s=0.0)
    assert leftover in deleted
    # retired, not removed: the slot stays occupied by a tombstone
    assert backend.exists(leftover)
    assert is_reclaim_tombstone(backend.read_text(leftover))
    assert list_versions(table) == [0]

    # the next commit claims the tombstoned slot and succeeds
    delta = _cells(spark, [("k1", "c", "after-vacuum", 500,
                            "sst-d", "LIVE")])
    assert merge_versioned(spark, table, delta) == 1
    assert current_version(table) == 1
    got = _content(read_version(spark, table))
    assert got[(b"k1", b"c")] == (b"after-vacuum", 500)
    # once the slot is at/below the committed line it is unclaimable
    # forever -- the NEXT vacuum may hard-delete such tombstones (none
    # here: the slot holds the real v1 manifest now)
    assert not is_reclaim_tombstone(backend.read_text(leftover))
