"""The 2-D z-order events layout must give stats-skippable files on
BOTH clustered dimensions at once: the z-curve confines each file to a
small (user-bucket, time-bucket) tile, so a point predicate on either
dimension admits only the files whose tile contains it -- the property
a 1-D sort can only offer for its leading column.
"""

from __future__ import annotations

import glob
import os

from tests.conftest import SF_SMOKE

NB = 64  # buckets per dimension (relational._Z_BITS)


def _file_spans(out, column):
    """[(min, max)] of `column` per parquet file, from footer stats."""
    spans = []
    for f in sorted(glob.glob(os.path.join(out, "*.parquet"))):
        import pyarrow.parquet as pq
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for c in range(md.num_columns):
                col = md.row_group(rg).column(c)
                if col.path_in_schema == column and col.statistics:
                    mins.append(col.statistics.min)
                    maxs.append(col.statistics.max)
        assert mins, f"{f}: no {column} stats"
        spans.append((min(mins), max(maxs)))
    return spans


def test_zorder_files_are_tiles_skippable_on_both_dims(spark):
    from cassandra_sstable_to_protocolbuf_spark.plans.relational import (
        _zorder_events_dir)

    out, _lo, _hi = _zorder_events_dir(spark, SF_SMOKE)
    u_spans = _file_spans(out, "ubucket")
    t_spans = _file_spans(out, "tbucket")
    n = len(u_spans)
    assert n > 4, "expected multiple z-range files"

    # each file covers a TILE: its per-dimension extent is much smaller
    # than the full bucket range (the z-curve locality guarantee)
    for spans, dim in ((u_spans, "ubucket"), (t_spans, "tbucket")):
        mean_extent = sum(hi - lo for lo, hi in spans) / n
        assert mean_extent < 0.6 * NB, (
            f"{dim}: mean file extent {mean_extent:.1f} of {NB} -- "
            f"not tiled, a linear layout would look like this")

    # a point predicate on EACH dimension alone skips a real fraction of
    # files -- the two-dimensional skipping a 1-D time sort cannot give
    # (there, every file spans all user buckets)
    for spans, probes, dim in (
            (u_spans, (3, 17, 40), "ubucket"),
            (t_spans, (5, 30, 60), "tbucket")):
        for p in probes:
            admitted = sum(1 for lo, hi in spans if lo <= p <= hi)
            assert admitted <= 0.75 * n, (
                f"{dim}={p} admits {admitted}/{n} files -- no skipping")


def test_zorder_roundtrip_preserves_rows(spark):
    from pyspark.sql import functions as F

    from cassandra_sstable_to_protocolbuf_spark.plans.relational import (
        _t, _ts_us, _zorder_events_dir)

    out, lo, hi = _zorder_events_dir(spark, SF_SMOKE)
    back = spark.read.parquet(out)
    orig = _t(spark, SF_SMOKE, "events")
    assert back.count() == orig.count()
    # layout columns are derived, data columns intact
    got = {(r.event_id, r.user_id, r.ts_us)
           for r in back.select("event_id", "user_id", "ts_us").collect()}
    want = {(r.event_id, r.user_id, r.ts_us)
            for r in orig.select("event_id", "user_id",
                                 _ts_us().alias("ts_us")).collect()}
    assert got == want
    # derived buckets respect their ranges and the z interleave is
    # consistent with them
    bad = back.filter(
        (F.col("ubucket") < 0) | (F.col("ubucket") >= NB)
        | (F.col("tbucket") < 0) | (F.col("tbucket") >= NB)).count()
    assert bad == 0
    assert lo <= hi
