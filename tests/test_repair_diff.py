"""First-principles checks of the Merkle repair-diff operator on a
synthetic two-replica fixture: all three statuses, and the guarantee
that in-sync Merkle leaves are pruned before the drill."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from cassandra_sstable_to_protocolbuf_spark.operators.repair import (
    N_LEAVES, merkle_tree, reconciled_state, repair_diff)

COLS = "key string, name string, value string, writeTime long, sstable_id string"


def _bucket(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16) % N_LEAVES


def _fixture(spark):
    rows = [
        # stale replica has the old write, synced has a newer SAME value
        ("k1", "c", "x", 1, "old"), ("k1", "c", "x", 2, "new"),
        # synced has a newer DIFFERENT value
        ("k2", "c", "x", 1, "old"), ("k2", "c", "y", 2, "new"),
        # row exists only on the synced side
        ("k3", "c", "z", 2, "new"),
    ]
    # 100 in-sync keys: identical single cell on the stale side, so both
    # replicas reconcile to the same row and their leaves must cancel
    rows += [(f"s{i}", "c", "v", 1, "old") for i in range(100)]
    return spark.createDataFrame(rows, COLS)


def test_statuses_and_only_out_of_sync_rows(spark):
    out = repair_diff(_fixture(spark), F.col("sstable_id") != "new")
    got = {r.key: r for r in out.collect()}
    assert set(got) == {"k1", "k2", "k3"}
    assert got["k1"].status == "stale_write_time"
    assert got["k2"].status == "divergent_value"
    assert got["k2"].synced_value == "y"
    assert got["k3"].status == "missing_in_stale"
    assert got["k3"].stale_write_time_us is None
    assert all(r.synced_write_time_us == 2 for r in got.values())


def test_in_sync_leaves_are_pruned(spark):
    state = reconciled_state(_fixture(spark), F.col("sstable_id") != "new")
    tree = merkle_tree(state)
    differing = {r.bucket for r in
                 tree.filter(~F.col("da").eqNullSafe(F.col("db"))).collect()}
    expected = {_bucket(k) for k in ("k1", "k2", "k3")}
    # ONLY leaves containing an out-of-sync row differ: every in-sync
    # key's digest is identical on both sides, so it cancels in the XOR
    # fold even when it shares a leaf with a diverging key.
    assert differing == expected
    assert len(differing) < N_LEAVES
    # and the drill emits nothing from pruned leaves
    out = repair_diff(_fixture(spark), F.col("sstable_id") != "new")
    assert {r.bucket for r in out.collect()} == expected


def test_identical_replicas_diff_empty(spark):
    cells = _fixture(spark).filter(F.col("sstable_id") == "old")
    out = repair_diff(cells, F.lit(True))
    assert out.count() == 0


def test_matches_dict_model_on_random_replicas(spark):
    """Randomized (seeded) two-replica state vs a pure-python model of
    LWW-reconcile-then-diff: statuses, winners, and the missing side."""
    import random

    rng = random.Random(20260814)
    rows = []
    for k in range(60):
        key = f"k{k}"
        for name in ("a", "b"):
            # stale replica has the row with probability 0.8
            has_stale = rng.random() < 0.8
            wt = rng.randint(1, 5)
            val = rng.choice("xyz")
            if has_stale:
                rows.append((key, name, val, wt, "old"))
            # synced replica always has it, sometimes strictly newer
            if rng.random() < 0.5:
                rows.append((key, name, rng.choice("xyz"), wt + 1, "new"))
            elif has_stale:
                rows.append((key, name, val, wt, "new"))
            else:
                rows.append((key, name, val, wt, "new"))
    cells = spark.createDataFrame(rows, COLS)

    # python model: LWW per side on (writeTime, sstable_id, value)
    def lww(side_rows):
        best = {}
        for key, name, val, wt, sst in side_rows:
            cur = best.get((key, name))
            cand = (wt, sst, val)
            if cur is None or cand > cur:
                best[(key, name)] = cand
        return best
    a = lww([r for r in rows if r[4] == "old"])
    b = lww(rows)
    want = {}
    for kn, bw in b.items():
        aw = a.get(kn)
        if aw is None:
            want[kn] = ("missing_in_stale", None, bw[0])
        elif (aw[2], aw[0]) != (bw[2], bw[0]):
            status = ("divergent_value" if aw[2] != bw[2]
                      else "stale_write_time")
            want[kn] = (status, aw[0], bw[0])
    out = repair_diff(cells, F.col("sstable_id") != "new")
    got = {(r.key, r.name): (r.status, r.stale_write_time_us,
                             r.synced_write_time_us)
           for r in out.collect()}
    assert got == want
    assert want, "fixture produced no diffs -- model test is vacuous"
