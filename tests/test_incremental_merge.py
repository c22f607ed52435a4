"""Shard-locality and LWW semantics of the incremental copy-on-write
merge (landed.merge_delta_lww): a delta batch must rewrite ONLY the
shard directories containing its keys, leave every other shard's files
byte-identical in place, and reconcile winners exactly as a from-scratch
LWW would.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cassandra_sstable_to_protocolbuf_spark.landed import (
    key_shard, land_by_shard, merge_delta_lww)


def _cells(spark, rows):
    """rows: (key, name, value, writeTime, sstable_id, cell_kind)."""
    return spark.createDataFrame(
        [(k.encode(), n.encode(), v.encode(), wt, sid, kind)
         for k, n, v, wt, sid, kind in rows],
        "key binary, name binary, value binary, writeTime long, "
        "sstable_id string, cell_kind string")


def _snapshot(landed_dir):
    """{shard_dir: {filename: mtime_ns}} for every shard directory."""
    snap = {}
    for d in os.listdir(landed_dir):
        if not d.startswith("shard="):
            continue
        full = os.path.join(landed_dir, d)
        snap[d] = {f: os.stat(os.path.join(full, f)).st_mtime_ns
                   for f in os.listdir(full) if not f.startswith("_")}
    return snap


@pytest.fixture()
def base_rows():
    return [(f"k{i}", "c", f"base{i}", 100, "sst-base", "LIVE")
            for i in range(40)]


def test_merge_rewrites_only_delta_shards(spark, base_rows, tmp_path):
    landed = str(tmp_path / "landed")
    land_by_shard(_cells(spark, base_rows), landed)
    before = _snapshot(landed)
    assert len(before) > 1, "fixture too small to exercise shard locality"

    # a delta touching exactly one existing key -> exactly that key's shard
    delta_key = "k7"
    [shard] = [r["s"] for r in
               spark.range(1).select(
                   key_shard(F.lit(delta_key.encode())).alias("s")).collect()]
    delta = _cells(spark, [(delta_key, "c", "newer", 200, "sst-delta", "LIVE")])
    touched = merge_delta_lww(spark, landed, delta)
    assert touched == [shard]

    after = _snapshot(landed)
    assert set(after) == set(before), "shard directory set changed"
    for d in before:
        if d == f"shard={shard}":
            assert after[d] != before[d], "delta shard was not rewritten"
        else:
            assert after[d] == before[d], f"untouched {d} was rewritten"


def test_merge_lww_semantics(spark, base_rows, tmp_path):
    landed = str(tmp_path / "landed")
    land_by_shard(_cells(spark, base_rows), landed)
    delta = _cells(spark, [
        ("k3", "c", "winner", 999, "sst-delta", "LIVE"),   # supersedes base
        ("k5", "c", "loser", 50, "sst-delta", "LIVE"),     # older -> base wins
        ("knew", "c", "fresh", 123, "sst-delta", "LIVE"),  # brand-new key
        ("kdead", "c", "x", 500, "sst-delta", "DELETED"),  # non-live: dropped
    ])
    merge_delta_lww(spark, landed, delta)
    got = {r["key"].decode(): (r["value"].decode(), r["writeTime"])
           for r in spark.read.parquet(landed).collect()}
    assert got["k3"] == ("winner", 999)
    assert got["k5"] == ("base5", 100)
    assert got["knew"] == ("fresh", 123)
    assert "kdead" not in got
    assert len(got) == 41  # 40 base keys + 1 new


def test_merge_is_idempotent(spark, base_rows, tmp_path):
    landed = str(tmp_path / "landed")
    land_by_shard(_cells(spark, base_rows), landed)
    delta = _cells(spark, [("k3", "c", "winner", 999, "sst-delta", "LIVE")])
    merge_delta_lww(spark, landed, delta)
    first = sorted((r["key"], r["value"], r["writeTime"], r["sstable_id"])
                   for r in spark.read.parquet(landed).collect())
    merge_delta_lww(spark, landed, delta)
    second = sorted((r["key"], r["value"], r["writeTime"], r["sstable_id"])
                    for r in spark.read.parquet(landed).collect())
    assert first == second
