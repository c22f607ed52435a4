"""Model-based property test for the versioned landed table: any random
sequence of merge / delete / restore commits must (a) leave EVERY
committed snapshot readable and exactly equal to a Python dict model's
history of it, and (b) keep history append-only. This is the
snapshot-consistency contract a table format lives or dies by -- a
single mutated old version silently corrupts time travel.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cassandra_sstable_to_protocolbuf_spark.versioned import (
    current_version, delete_keys_versioned, init_versioned, merge_versioned,
    read_version, restore_version)
from tests.test_incremental_merge import _cells

KEYS = [f"k{i}" for i in range(5)]
NAMES = ["c0", "c1"]

cell = st.tuples(st.sampled_from(KEYS), st.sampled_from(NAMES),
                 st.text(alphabet="ab", min_size=1, max_size=2),
                 st.integers(min_value=0, max_value=9),
                 st.sampled_from(["sst-a", "sst-b"]))

op = st.one_of(
    st.tuples(st.just("merge"), st.lists(cell, min_size=1, max_size=5)),
    st.tuples(st.just("delete"), st.lists(st.sampled_from(KEYS),
                                          min_size=1, max_size=2)),
    st.tuples(st.just("restore"), st.integers(min_value=0, max_value=3)),
)


def _apply_merge(model, rows):
    for k, n, v, wt, sid in rows:
        cand = (wt, sid, v)
        cur = model.get((k, n))
        if cur is None or cand > cur:
            model[(k, n)] = cand
    return model


def _read(spark, table, version=None):
    return {(r["key"].decode(), r["name"].decode()):
            (r["writeTime"], r["sstable_id"], r["value"].decode())
            for r in read_version(spark, table, version).collect()}


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(base=st.lists(cell, min_size=1, max_size=5),
       ops=st.lists(op, min_size=1, max_size=4))
def test_every_snapshot_matches_the_model_history(
        spark, tmp_path_factory, base, ops):
    table = str(tmp_path_factory.mktemp("vt") / "t")
    live = [(k, n, v, wt, sid, "LIVE") for k, n, v, wt, sid in base]
    init_versioned(spark, _cells(spark, live), table)

    history = [_apply_merge({}, base)]
    for kind, payload in ops:
        cur_model = dict(history[-1])
        if kind == "merge":
            live = [(k, n, v, wt, sid, "LIVE")
                    for k, n, v, wt, sid in payload]
            v = merge_versioned(spark, table, _cells(spark, live))
            history.append(_apply_merge(cur_model, payload))
        elif kind == "delete":
            import pyspark.sql.functions as F  # noqa: F401
            keys_df = spark.createDataFrame(
                [(k.encode(),) for k in payload], "key binary")
            v = delete_keys_versioned(spark, table, keys_df)
            nxt = {kn: val for kn, val in cur_model.items()
                   if kn[0] not in payload}
            if v == len(history) - 1:  # no shard touched -> no commit
                continue
            history.append(nxt)
        else:  # restore
            target = min(payload, len(history) - 1)
            v = restore_version(table, target)
            history.append(dict(history[target]))
        assert v == len(history) - 1, f"version drift after {kind}"

    assert current_version(table) == len(history) - 1
    # EVERY snapshot in history must still read back exactly
    for version, model in enumerate(history):
        assert _read(spark, table, version) == model, (
            f"snapshot v{version} diverged from model")
