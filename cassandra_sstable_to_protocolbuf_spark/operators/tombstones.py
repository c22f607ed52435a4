"""Tombstone / liveness filters -- operators F1 and F2 (SURVEY.md §2).

The reference drops:
  F1: whole partitions whose deletion info is not live
      (reference: service/SSTableReader.java:83-85)
  F2: cell tombstones (DeletedColumn), TTL cells (ExpiringColumn --
      dropped EVEN IF NOT YET EXPIRED, a deliberate quirk), counter
      cells, and any non-Column atom i.e. range tombstones
      (reference: service/SSTableReader.java:92-103)

Expressed as plain Column predicates so Catalyst pushes them into the
parquet scan (PushedFilters) -- at 100 TB these filters run inside the
scan with zero extra passes, exactly like the reference's manual
early-filtering but parallel per split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_sstable_to_protocolbuf_spark.schemas import CELL_KIND_LIVE


def partition_live_predicate() -> Column:
    """F1: keep only partitions with no partition-level tombstone."""
    return F.col("partition_deletion_live")


def live_cell_predicate() -> Column:
    """F2: keep LIVE cells only.

    Note the parity quirk: EXPIRING cells are excluded unconditionally,
    whether or not ttl_expired is true -- matching the reference, which
    drops every ExpiringColumn without checking its TTL clock
    (service/SSTableReader.java:97-99). Range tombstones never surface as
    cells in this model (the source skips non-Column atoms, mirroring the
    `instanceof Column` gate at service/SSTableReader.java:92).
    """
    return F.col("cell_kind") == CELL_KIND_LIVE


def filter_live(cells: DataFrame) -> DataFrame:
    """F1 + F2 composed: the reference's full filter stage."""
    return cells.filter(partition_live_predicate() & live_cell_predicate())
