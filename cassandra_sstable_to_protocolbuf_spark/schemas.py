"""Canonical schemas for the wide-row cell model (SURVEY.md §1.3).

The reference computes over one hardcoded Cassandra table
(reference: service/SSTableReader.java:24-43): partitions of
(name, value, writeTime) cells keyed by a blob partition key. Two shapes:

* flat  -- 1 row = 1 cell; the natural DataFrame citizen.
* nested -- 1 row = 1 partition, mirroring sstable.proto:13-16
  (Row{key, repeated Column{name, value, writeTime}}).

The engine carries the metadata columns the reference's filters consult:
cell_kind (live/deleted/expiring/counter, service/SSTableReader.java:92-103)
and partition_deletion_live (service/SSTableReader.java:83-85).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CELL_KIND_LIVE = "LIVE"
CELL_KIND_DELETED = "DELETED"
CELL_KIND_EXPIRING = "EXPIRING"
CELL_KIND_COUNTER = "COUNTER"
CELL_KINDS = (CELL_KIND_LIVE, CELL_KIND_DELETED, CELL_KIND_EXPIRING, CELL_KIND_COUNTER)

# Flat cell schema, binary payloads (engine-internal / sink-facing).
FLAT_CELL_SCHEMA = StructType([
    StructField("sstable_id", StringType(), False),
    StructField("key", BinaryType(), False),
    StructField("name", BinaryType(), False),
    StructField("value", BinaryType(), True),
    StructField("writeTime", LongType(), False),
    StructField("cell_kind", StringType(), False),
    StructField("ttl_expired", BooleanType(), True),
    StructField("partition_deletion_live", BooleanType(), False),
])

COLUMN_STRUCT = StructType([
    StructField("name", BinaryType(), False),
    StructField("value", BinaryType(), True),
    StructField("writeTime", LongType(), False),
])

# Nested row schema, mirroring sstable.proto Row/Column.
NESTED_ROW_SCHEMA = StructType([
    StructField("sstable_id", StringType(), False),
    StructField("key", BinaryType(), False),
    StructField("columns", ArrayType(COLUMN_STRUCT), False),
])

# Key-sharded landed/versioned table row (landed.lww_winners output plus
# the shard column both incremental layouts partition on).
LANDED_SCHEMA = StructType([
    StructField("key", BinaryType(), False),
    StructField("name", BinaryType(), False),
    StructField("value", BinaryType(), True),
    StructField("writeTime", LongType(), False),
    StructField("sstable_id", StringType(), False),
    StructField("shard", LongType(), False),
])
