"""Property test: merging any sequence of delta batches into a landed
base is indistinguishable from one from-scratch LWW over every batch --
the algebraic property (commutative, associative, idempotent struct-max)
that makes the incremental and streaming merge paths safe under any
batch slicing and under at-least-once replay.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cassandra_sstable_to_protocolbuf_spark.landed import (
    land_by_shard, merge_delta_lww)
from tests.test_incremental_merge import _cells

KEYS = [f"k{i}" for i in range(6)]
NAMES = ["c0", "c1"]
KINDS = ["LIVE", "LIVE", "LIVE", "DELETED"]  # live-biased

cell = st.tuples(st.sampled_from(KEYS), st.sampled_from(NAMES),
                 st.text(alphabet="abcd", min_size=1, max_size=3),
                 st.integers(min_value=0, max_value=9),
                 st.sampled_from(["sst-a", "sst-b"]),
                 st.sampled_from(KINDS))
batches = st.lists(st.lists(cell, max_size=8), min_size=1, max_size=4)


def _expected(all_rows):
    """Python-side LWW: max (writeTime, sstable_id, value) per live
    (key, name) -- ASCII strings compare identically to the engine's
    binary comparison."""
    win = {}
    for k, n, v, wt, sid, kind in all_rows:
        if kind != "LIVE":
            continue
        cand = (wt, sid, v)
        if (k, n) not in win or cand > win[(k, n)]:
            win[(k, n)] = cand
    return {(k, n): (v, wt, sid) for (k, n), (wt, sid, v) in win.items()}


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=batches)
def test_sequential_merge_equals_full_lww(spark, tmp_path_factory, data):
    base, *deltas = data
    # seed row keeps the landed base non-empty (an empty first batch is
    # not a meaningful base; it participates in the expected LWW)
    base = base + [("k0", "c0", "seed", 0, "sst-a", "LIVE")]
    data = [base] + deltas
    landed = str(tmp_path_factory.mktemp("landed") / "t")
    land_by_shard(_cells(spark, base), landed)
    for d in deltas:
        merge_delta_lww(spark, landed, _cells(spark, d))

    got = {(r["key"].decode(), r["name"].decode()):
           (r["value"].decode(), r["writeTime"], r["sstable_id"])
           for r in spark.read.parquet(landed).collect()}
    assert got == _expected([c for b in data for c in b])


@pytest.mark.parametrize("empty_delta", [[], [("k0", "c0", "x", 5, "sst-a",
                                               "DELETED")]])
def test_merge_of_no_live_cells_is_a_noop(spark, tmp_path, empty_delta):
    landed = str(tmp_path / "t")
    base = [("k0", "c0", "v", 1, "sst-a", "LIVE")]
    land_by_shard(_cells(spark, base), landed)
    touched = merge_delta_lww(spark, landed, _cells(spark, empty_delta))
    assert touched == []
    got = spark.read.parquet(landed).collect()
    assert len(got) == 1 and got[0]["value"] == b"v"
