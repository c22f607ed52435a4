"""Secondary (inverted) value index over the key-sharded landed table.

Cassandra's 2i answers "which partitions contain this (column, value)?"
without scanning the table; the lakehouse analog is an index table
mapping (name, value) -> (key, shard), bucketed by a hash of the
indexed pair so a point lookup reads ONE index partition directory.
The lookup then fetches only the landed shard directories that hold
the hit keys -- the classic index-then-partition-fetch plan:

    index scan  : 1 of `n_buckets` index dirs (partition pruning)
    fetch       : |distinct hit shards| of N_SHARDS landed dirs

At 100 TB both sides stay proportional to the ANSWER, not the table: a
value matching 40 partitions reads one index bucket plus the handful
of shard directories those partitions hash into. The index is itself a
plain parquet table -- rebuilt with the same one-file-per-partition
write discipline as every other layout here, maintainable by the same
copy-on-write machinery if deltas arrive.

Gated by catalog query `sst_index_lookup` (index-driven fetch vs a
from-scratch DuckDB semi-join); bucket pruning and shard locality are
pinned by tests/test_secondary_index.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_INDEX_BUCKETS = 64


def _ibucket(name_col, value_col):
    return F.pmod(F.xxhash64(name_col, value_col), F.lit(N_INDEX_BUCKETS))


def build_value_index(spark: SparkSession, landed_dir: str,
                      index_dir: str) -> None:
    """Project the landed table to (name, value, key, shard) and land it
    partitioned by the indexed pair's hash bucket -- one narrow scan of
    the base table, one file per index bucket."""
    t = spark.read.parquet(landed_dir)
    (t.select("name", "value", "key", "shard")
     .withColumn("ibucket", _ibucket(F.col("name"), F.col("value")))
     .repartition(F.col("ibucket"))
     .write.mode("overwrite").partitionBy("ibucket").parquet(index_dir))


def index_lookup_keys(spark: SparkSession, index_dir: str,
                      name: bytes, value: bytes) -> DataFrame:
    """(key, shard) of every partition whose `name` cell equals `value`.
    The bucket predicate is a literal, so Catalyst prunes all other
    index directories at planning time."""
    bucket = int(spark.range(1).select(
        _ibucket(F.lit(name), F.lit(value)).alias("b")).first()["b"])
    return (spark.read.parquet(index_dir)
            .filter(F.col("ibucket") == bucket)
            .filter((F.col("name") == name) & (F.col("value") == value))
            .select("key", "shard"))


def index_point_fetch(spark: SparkSession, landed_dir: str, index_dir: str,
                      name: bytes, value: bytes) -> DataFrame:
    """All cells of every partition matched by the index: look up the
    hit keys, restrict the base read to exactly their shard directories
    (partition pruning), then semi-join on key.

    The hit set is materialized once (it feeds both the shard collect
    and the join; a point lookup's hits are bounded by its selectivity,
    which is the premise of using an index at all -- an unselective
    predicate belongs in a scan, not here)."""
    hits = index_lookup_keys(spark, index_dir, name, value).localCheckpoint()
    shards = sorted(int(r["shard"]) for r in
                    hits.select("shard").distinct().collect())
    if not shards:
        base = spark.read.parquet(landed_dir).limit(0)
        return base
    base = (spark.read.parquet(landed_dir)
            .filter(F.col("shard").isin(shards)))
    return base.join(hits.select("key").distinct(), "key", "semi")
