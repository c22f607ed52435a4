"""SSTable compaction: merge many sstables into reconciled output files.

The reference converts each sstable independently and never merges
duplicate keys across files (Runner.java:59); Cassandra itself resolves
them at compaction time with last-write-wins. This operator closes that
loop inside the engine: scan all inputs, LWW-reconcile per (key, cell),
and write the winners back as genuine binary sstables via the fixture
writer -- the ecosystem operation that turns N overlapping generations
into clean token-sharded outputs.

Scale shape: one distributed scan + one hash aggregation (the same
struct-max plan as sst_lww_dedup: map-side partial agg, no window, no
sort), then one writer task per output shard. Outputs are sharded BY
TOKEN RANGE -- the top bits of the RandomPartitioner md5 token -- so
each output sstable covers a contiguous token interval exactly like
Cassandra's range-aware compaction, and `n_outputs` bounds the rows any
single writer task must hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_sstable_to_protocolbuf_spark.landed import lww_live_cells

# hex alphabet in token order: char i covers tokens [i/16, (i+1)/16) of
# the md5 space, so prefix buckets are contiguous token ranges
_HEX = "0123456789abcdef"


def token_shard(key_col: F.Column, n_outputs: int) -> F.Column:
    """Shard id (0..n_outputs-1) from the top hex digit of the md5
    token. n_outputs must divide 16 so shard boundaries sit on hex-digit
    edges -- which keeps the same computation expressible in one
    portable SQL CASE for the oracle."""
    if 16 % n_outputs != 0:
        raise ValueError(f"n_outputs must divide 16, got {n_outputs}")
    digit = F.substring(F.md5(key_col), 1, 1)
    per = 16 // n_outputs
    shard = F.lit(n_outputs - 1)
    for s in range(n_outputs - 2, -1, -1):
        # digit < first hex char of the NEXT shard -> this shard
        shard = F.when(digit < F.lit(_HEX[(s + 1) * per]), s).otherwise(shard)
    return shard


def compact_cells(cells: DataFrame, n_outputs: int = 1,
                  respect_tombstones: bool = False) -> DataFrame:
    """Live LWW winners re-shaped for the sstable writer, sharded into
    `n_outputs` token-range outputs named compacted-<shard>.

    Tombstone semantics -- two explicit policies:

    * respect_tombstones=False (default, the gated behavior): the
      reference's F1 quirk applied per file -- a dead partition drops
      ALL of its own file's cells -- then tombstones are purged
      (gc_grace=0). Cells of the same key in OTHER files are NOT
      shadowed; a newer generation's partition delete does not suppress
      an older generation's cells.
    * respect_tombstones=True (Cassandra's reconciliation): requires
      `cells` read with live_only=False so tombstone atoms survive to
      this operator. Shadowing is applied at ALL THREE granularities,
      cross-file included, with Cassandra's tie rule (a tombstone at
      the same timestamp beats the cell):
        - partition: LIVE cells with writeTime <= max(markedForDeleteAt
          over the key's non-live PARTITION markers) drop;
        - cell: LIVE cells with writeTime <= max(timestamp over DELETED
          cells of the same (key, name)) drop;
        - range: LIVE cells whose name lies in [start, end] of a
          RANGE_TOMBSTONE of the same key (start = its name, end = its
          value, both bounds inclusive per the 2.0 on-disk bounds) with
          writeTime <= its markedForDeleteAt drop.
      Then tombstones themselves are purged (gc_grace=0). This is what
      stops a compaction from resurrecting data deleted -- by any
      deletion kind -- in a newer generation.

    Scale shape of the shadow joins: partition and cell tombstone sets
    aggregate to one row per deleted key / (key, name) before joining
    (equi-joins on the hash-partitioned key, map-side combinable); the
    range-tombstone pass is an equi-join on key with the [start, end]
    bound check as a residual predicate -- tombstones are a vanishing
    fraction of cells, so each pass is a broadcast-sized right side in
    practice while staying a plain shuffled join at worst.
    """
    if respect_tombstones:
        tombs = (cells.filter((F.col("cell_kind") == "PARTITION")
                              & ~F.col("partition_deletion_live"))
                 .groupBy("key")
                 .agg(F.max("writeTime").alias("_tomb_ts")))
        cell_tombs = (cells.filter(F.col("cell_kind") == "DELETED")
                      .groupBy("key", "name")
                      .agg(F.max("writeTime").alias("_cell_tomb_ts")))
        range_tombs = (cells.filter(F.col("cell_kind") == "RANGE_TOMBSTONE")
                       .select(F.col("key").alias("_rt_key"),
                               F.col("name").alias("_rt_start"),
                               F.col("value").alias("_rt_end"),
                               F.col("writeTime").alias("_rt_ts")))
        live = (cells.filter(F.col("cell_kind") == "LIVE")
                .join(tombs, "key", "left")
                .filter(F.col("_tomb_ts").isNull()
                        | (F.col("writeTime") > F.col("_tomb_ts")))
                .drop("_tomb_ts")
                .join(cell_tombs, ["key", "name"], "left")
                .filter(F.col("_cell_tomb_ts").isNull()
                        | (F.col("writeTime") > F.col("_cell_tomb_ts")))
                .drop("_cell_tomb_ts")
                .join(range_tombs,
                      (F.col("key") == F.col("_rt_key"))
                      & (F.col("name") >= F.col("_rt_start"))
                      & (F.col("name") <= F.col("_rt_end"))
                      & (F.col("writeTime") <= F.col("_rt_ts")),
                      "left_anti"))
        from cassandra_sstable_to_protocolbuf_spark.landed import lww_winners
        lww = lww_winners(live)
    else:
        lww = lww_live_cells(cells)
    return lww.select(
        F.concat_ws("-", F.lit("compacted"),
                    token_shard(F.col("key"), n_outputs)).alias("sstable_id"),
        "key", "name", "value", "writeTime",
        F.lit("LIVE").alias("cell_kind"),
        F.lit(None).cast("boolean").alias("ttl_expired"),
        F.lit(True).alias("partition_deletion_live"))


def compact(spark: SparkSession, input_path: str, out_dir: str,
            n_outputs: int = 1, compression: str | None = None,
            respect_tombstones: bool = False) -> DataFrame:
    """Compact every sstable under `input_path` into `n_outputs`
    token-sharded sstables in `out_dir`. Returns the writer's metrics
    DataFrame (sstable_id, path, n_partitions, n_cells)."""
    from cassandra_sstable_to_protocolbuf_spark.sources.sstable_native import (
        read_native_cells, write_cells_as_sstables)

    cells = read_native_cells(spark, input_path,
                              live_only=not respect_tombstones)
    merged = compact_cells(cells, n_outputs,
                           respect_tombstones=respect_tombstones)
    return write_cells_as_sstables(merged, out_dir, compression=compression)
