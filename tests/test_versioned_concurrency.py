"""Two REAL concurrent writers against one versioned table: both run
the optimistic-concurrency loop (merge, on CommitConflict re-read and
recompute) from separate threads sharing the Spark session. Whatever
interleaving the scheduler produces, the final table must hold BOTH
deltas' winners and history must be linear -- the protocol property the
single-threaded simulations in test_versioned.py cannot exercise.
"""

from __future__ import annotations

import threading

import pytest

from cassandra_sstable_to_protocolbuf_spark.versioned import (
    CommitConflict, current_version, init_versioned, list_versions,
    merge_versioned, read_version)
from tests.test_versioned import _cells, _content


@pytest.fixture()
def table(spark, tmp_path):
    rows = [(f"k{i}", "c", f"base{i}", 100, "sst-base", "LIVE")
            for i in range(20)]
    t = str(tmp_path / "vt")
    init_versioned(spark, _cells(spark, rows), t)
    return t


def test_two_writers_both_commit_under_occ(spark, table):
    barrier = threading.Barrier(2)
    errors: list[BaseException] = []

    def writer(tag: str, keys: list[str]) -> None:
        delta = _cells(spark, [(k, "c", f"from-{tag}", 200, f"sst-{tag}",
                                "LIVE") for k in keys])
        try:
            barrier.wait(timeout=60)
            for _ in range(10):  # the documented recompute-and-retry loop
                try:
                    merge_versioned(spark, table, delta)
                    return
                except CommitConflict:
                    continue
            raise AssertionError(f"writer {tag} starved after 10 retries")
        except BaseException as e:  # noqa: BLE001 -- surfaced to the test
            errors.append(e)

    ta = threading.Thread(target=writer, args=("a", ["k1", "k3", "new-a"]))
    tb = threading.Thread(target=writer, args=("b", ["k2", "k4", "new-b"]))
    ta.start(); tb.start()
    ta.join(timeout=300); tb.join(timeout=300)
    assert not ta.is_alive() and not tb.is_alive(), "writer hung"
    assert not errors, errors

    # linear history: every version in [0, current] committed exactly once
    cur = current_version(table)
    assert cur == 2
    assert list_versions(table) == [0, 1, 2]

    # the final snapshot holds BOTH writers' data -- neither commit was
    # silently lost to the race
    final = _content(read_version(spark, table))
    for k in ("k1", "k3", "new-a"):
        assert final[(k.encode(), b"c")] == (b"from-a", 200)
    for k in ("k2", "k4", "new-b"):
        assert final[(k.encode(), b"c")] == (b"from-b", 200)
    assert len(final) == 22


def test_zombie_writer_cannot_double_commit_or_regress_current(spark, table):
    """A writer that claims a version then stalls past the reclaim grace
    can have its claim taken by a peer; when the zombie wakes at the
    publish step it must get CommitConflict -- NOT a silent second
    success -- and `_current` must never regress below the peer's
    committed history (the round-3 advisory's lost-commit scenario)."""
    import json
    import os
    import time

    from cassandra_sstable_to_protocolbuf_spark import versioned as V

    # zombie claims v1 with its own writer uuid, then "stalls"
    mpath = V._manifest_path(table, 1)
    zombie = {"version": 1, "writer": "zombie-uuid", "files": {}}
    V._create_exclusive(mpath, json.dumps(zombie), table, 1)
    old = time.time() - V.STALE_MANIFEST_GRACE_S - 5
    os.utime(mpath, (old, old))  # age the claim past the grace window

    # peer reclaims v1 and commits it, then commits v2 on top
    merge_versioned(spark, table, _cells(
        spark, [("k1", "c", "peer-1", 200, "sst-p1", "LIVE")]))
    merge_versioned(spark, table, _cells(
        spark, [("k2", "c", "peer-2", 300, "sst-p2", "LIVE")]))
    assert current_version(table) == 2

    # zombie wakes at its publish step: loud conflict, no regression
    with pytest.raises(CommitConflict):
        V._publish(table, 1, "zombie-uuid")
    assert current_version(table) == 2
    assert V.read_manifest(table, 1).get("writer") != "zombie-uuid"


def test_reinit_refuses_existing_table(spark, table, tmp_path):
    """init_versioned on an existing table must refuse (a silent re-init
    repoints _current to 0, orphaning all prior versions for vacuum to
    delete); force=True performs the truncation deliberately."""
    rows = [("x", "c", "fresh", 1, "sst-x", "LIVE")]
    with pytest.raises(FileExistsError, match="already a versioned table"):
        init_versioned(spark, _cells(spark, rows), table)
    assert current_version(table) == 0  # untouched

    v = init_versioned(spark, _cells(spark, rows), table, force=True)
    assert v == 0
    assert list_versions(table) == [0]
    assert set(_content(read_version(spark, table))) == {(b"x", b"c")}
