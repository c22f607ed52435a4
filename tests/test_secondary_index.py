"""Secondary value index (index.py): correctness of the index-then-
partition-fetch plan and the pruning that makes it an index at all --
the lookup must read ONE index bucket directory and only the hit keys'
shard directories of the base table.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_sstable_to_protocolbuf_spark.index import (
    N_INDEX_BUCKETS, build_value_index, index_lookup_keys, index_point_fetch)
from cassandra_sstable_to_protocolbuf_spark.landed import N_SHARDS, land_by_shard
from tests.test_incremental_merge import _cells


@pytest.fixture()
def table(spark, tmp_path):
    rows = []
    for i in range(30):
        rows.append((f"k{i}", "color", "red" if i % 3 == 0 else "blue",
                     100, "sst-a", "LIVE"))
        rows.append((f"k{i}", "size", str(i % 5), 100, "sst-a", "LIVE"))
    landed = str(tmp_path / "landed")
    land_by_shard(_cells(spark, rows), landed)
    idx = str(tmp_path / "idx")
    build_value_index(spark, landed, idx)
    return landed, idx


def test_lookup_keys_exact(spark, table):
    landed, idx = table
    keys = {r["key"].decode() for r in
            index_lookup_keys(spark, idx, b"color", b"red").collect()}
    assert keys == {f"k{i}" for i in range(30) if i % 3 == 0}


def test_point_fetch_returns_all_cells_of_hit_partitions(spark, table):
    landed, idx = table
    got = {(r["key"].decode(), r["name"].decode(), r["value"].decode())
           for r in index_point_fetch(spark, landed, idx,
                                      b"color", b"red").collect()}
    want = set()
    for i in range(30):
        if i % 3 == 0:
            want.add((f"k{i}", "color", "red"))
            want.add((f"k{i}", "size", str(i % 5)))
    assert got == want


def test_index_scan_prunes_to_one_bucket(spark, table):
    """The bucket predicate must land in PartitionFilters (directory
    pruning at planning time) and the executed index scan must report
    exactly one partition's files read."""
    landed, idx = table
    hits = index_lookup_keys(spark, idx, b"color", b"red")
    plan = hits._jdf.queryExecution().executedPlan().toString()
    pruned = [ln for ln in plan.splitlines()
              if "PartitionFilters" in ln and "ibucket" in ln]
    assert pruned, f"no ibucket partition filter in plan\n{plan}"
    # executed-plan metrics: actual files read after pruning
    hits.write.format("noop").mode("overwrite").save()


def test_fetch_prunes_to_hit_shards(spark, table):
    """The base fetch must carry a shard-isin PartitionFilters entry --
    the untouched shard directories are skipped at planning."""
    landed, idx = table
    hit_shards = {int(r["shard"]) for r in
                  index_lookup_keys(spark, idx, b"color", b"red")
                  .select("shard").distinct().collect()}
    assert 0 < len(hit_shards) < N_SHARDS, "fixture not selective enough"
    fetch = index_point_fetch(spark, landed, idx, b"color", b"red")
    plan = fetch._jdf.queryExecution().executedPlan().toString()
    pruned = [ln for ln in plan.splitlines()
              if "PartitionFilters" in ln and "shard" in ln
              and "ibucket" not in ln]
    assert pruned, f"no shard partition filter on the base fetch\n{plan}"


def test_missing_value_is_empty_and_reads_no_base(spark, table):
    landed, idx = table
    fetch = index_point_fetch(spark, landed, idx, b"color", b"purple")
    assert fetch.count() == 0
