"""Landed analytics layout: binary SSTables -> columnar parquet.

The reference's one job re-parses sstable bytes on every read
(Runner.java:71-96); at 100 TB the analytics-grade posture is to land
the live, LWW-reconciled cells ONCE as parquet partitioned by origin
sstable, then run every downstream query columnar -- predicate pushdown,
column pruning, and partition pruning all come for free, and the
Python-parse cost is paid exactly once at the ingest boundary.

Exposed as the `to-parquet` CLI subcommand and gated through the
catalog query `sst_landed_parquet` (cells_queries.py), whose plan audit
pins that a partition predicate on the landed table prunes directories
at planning time (PartitionFilters), not row-by-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def lww_live_cells(cells: DataFrame) -> DataFrame:
    """Live-only last-write-wins reconciliation of native cells.

    Input: the native source's flat cell frame (live_only=True: dead
    partitions and non-live cells already dropped in the reader, leaving
    PARTITION markers + LIVE cells). Output: one winner per (key, name)
    across all sstables, Cassandra's own reconciliation rule.

    Scale shape: a single hash aggregation -- lexicographic struct-max
    over (writeTime, sstable_id, value) ships one candidate per group
    per task via map-side partial agg; no window, no sort (the same plan
    as sst_lww_dedup, the 100 TB-right formulation).
    """
    live = cells.filter(F.col("cell_kind") == "LIVE")
    winner = F.max(F.struct("writeTime", "sstable_id", "value")).alias("w")
    return (live.groupBy("key", "name").agg(winner)
            .select("key", "name", F.col("w.value").alias("value"),
                    F.col("w.writeTime").alias("writeTime"),
                    F.col("w.sstable_id").alias("sstable_id")))


def land_to_parquet(spark: SparkSession, input_path: str, out_dir: str,
                    partitions_per_split: int = 4096) -> None:
    """Scan -> live filter -> LWW -> parquet partitioned by the winning
    cell's origin sstable. Overwrites `out_dir`."""
    from cassandra_sstable_to_protocolbuf_spark.sources.sstable_native import (
        read_native_cells)

    cells = read_native_cells(spark, input_path,
                              partitions_per_split=partitions_per_split,
                              live_only=True)
    (lww_live_cells(cells)
     .write.mode("overwrite").partitionBy("sstable_id").parquet(out_dir))
