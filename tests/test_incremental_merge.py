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


def test_delete_rewrites_only_key_shards_and_drops_empty(spark, base_rows,
                                                         tmp_path):
    from cassandra_sstable_to_protocolbuf_spark.landed import delete_keys_lww

    landed = str(tmp_path / "landed")
    land_by_shard(_cells(spark, base_rows), landed)
    before = _snapshot(landed)

    # delete every key of one shard plus one key of another -> the
    # fully-emptied shard directory must disappear, the partially
    # emptied one must be rewritten, all others untouched
    back = spark.read.parquet(landed).select(
        "shard", F.col("key").cast("string").alias("k")).collect()
    by_shard = {}
    for r in back:
        by_shard.setdefault(r["shard"], []).append(r["k"])
    full_shard = min(by_shard)
    other_shard = max(by_shard)
    assert full_shard != other_shard
    victims = by_shard[full_shard] + [by_shard[other_shard][0]]
    keys = spark.createDataFrame([(k.encode(),) for k in victims],
                                 "key binary")
    touched = delete_keys_lww(spark, landed, keys)
    assert sorted(touched) == sorted({full_shard, other_shard})

    after = _snapshot(landed)
    assert f"shard={full_shard}" not in after, "emptied shard not dropped"
    assert after[f"shard={other_shard}"] != before[f"shard={other_shard}"]
    for d in before:
        if d not in (f"shard={full_shard}", f"shard={other_shard}"):
            assert after[d] == before[d], f"untouched {d} was rewritten"

    kept = {r["key"].decode()
            for r in spark.read.parquet(landed).select("key").collect()}
    assert kept == {f"k{i}" for i in range(40)} - set(victims)


def test_stream_merge_resumes_from_checkpoint(spark, base_rows, tmp_path):
    """Checkpointed streaming merge survives a restart: half the delta
    files are processed, the query terminates (availableNow), more files
    arrive, and a SECOND run with the SAME checkpoint processes only the
    new files -- the final table must equal a from-scratch LWW over
    base + full delta."""
    from pyspark.sql import functions as F

    from cassandra_sstable_to_protocolbuf_spark.landed import merge_delta_lww

    landed = str(tmp_path / "landed")
    land_by_shard(_cells(spark, base_rows), landed)
    spool = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(spool)

    first = _cells(spark, [("k1", "c", "v1", 500, "sst-d1", "LIVE"),
                           ("k2", "c", "v2", 500, "sst-d1", "LIVE")])
    second = _cells(spark, [("k1", "c", "v1b", 900, "sst-d2", "LIVE"),
                            ("knew", "c", "nv", 100, "sst-d2", "LIVE")])
    schema = first.schema

    def run_stream():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1").parquet(spool))
        q = (stream.writeStream
             .foreachBatch(lambda b, _i: merge_delta_lww(spark, landed, b))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    first.coalesce(1).write.mode("append").parquet(spool)
    run_stream()
    got1 = {r["key"].decode(): r["value"].decode()
            for r in spark.read.parquet(landed).collect()}
    assert got1["k1"] == "v1" and got1["k2"] == "v2"

    second.coalesce(1).write.mode("append").parquet(spool)
    run_stream()  # same checkpoint: only the new file is processed
    got2 = {r["key"].decode(): (r["value"].decode(), r["writeTime"])
            for r in spark.read.parquet(landed).collect()}
    assert got2["k1"] == ("v1b", 900)   # newer delta superseded the first
    assert got2["k2"] == ("v2", 500)
    assert got2["knew"] == ("nv", 100)
    assert len(got2) == 41  # 40 base (k1..k2 overwritten in place) + knew
