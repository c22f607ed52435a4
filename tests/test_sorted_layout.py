"""The time-sorted events layout must actually be skippable: files are
range-disjoint on ts_us and row-group min/max stats are tight, so a
time-slice scan can prune at file AND row-group granularity."""

from __future__ import annotations

import glob
import os

from tests.conftest import SF_SMOKE


def test_sorted_files_are_range_disjoint(spark):
    import pyarrow.parquet as pq

    from cassandra_sstable_to_protocolbuf_spark.plans.relational import (
        _sorted_events_dir)

    out = _sorted_events_dir(spark, SF_SMOKE)
    spans = []
    for f in sorted(glob.glob(os.path.join(out, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for c in range(md.num_columns):
                col = md.row_group(rg).column(c)
                if col.path_in_schema == "ts_us" and col.statistics:
                    mins.append(col.statistics.min)
                    maxs.append(col.statistics.max)
        assert mins, f"{f}: no ts_us stats"
        spans.append((min(mins), max(maxs)))
    assert len(spans) > 1, "expected multiple range files"
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, f"file ranges overlap: {hi1} > {lo2}"

    # the gated mid-January week (inside the data's Jan 1-30 span, so
    # the intersection is NON-empty) touches only its slice of the files
    lo, hi = 1704672000000000, 1705276800000000  # [2024-01-08, 2024-01-15)
    touched = sum(1 for s_lo, s_hi in spans if s_hi >= lo and s_lo < hi)
    assert touched >= 1, "week window inside the data must touch >=1 file"
    assert touched <= max(1, len(spans) // 2), (
        f"week window touches {touched}/{len(spans)} files")
