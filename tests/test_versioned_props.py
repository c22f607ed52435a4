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

    # the CDC diff between ANY adjacent pair (incl. restores, which can
    # resurrect/delete en masse) must equal the model dicts' diff
    from cassandra_sstable_to_protocolbuf_spark.versioned import diff_versions
    for v in range(1, len(history)):
        before, after = history[v - 1], history[v]
        expect = {}
        for kn in set(before) | set(after):
            b, a = before.get(kn), after.get(kn)
            if b is None:
                expect[kn] = "insert"
            elif a is None:
                expect[kn] = "delete"
            elif b != a:
                expect[kn] = "update"
        got = {(r["key"].decode(), r["name"].decode()): r["change_type"]
               for r in diff_versions(spark, table, v - 1, v).collect()}
        assert got == expect, f"CDC diff v{v-1}->v{v} diverged from model"


# --- metadata scale: 10k shards x 100 commits ----------------------------

def test_manifest_metadata_scales_to_many_shards_and_commits(tmp_path):
    """The manifest layer's costs at lakehouse scale, pinned: with 10,000
    shards and a 100-commit chain each touching ONE shard, (a) a commit
    carries untouched shards by REFERENCE (no data I/O, path-identical
    entries), (b) manifest read/write stays O(shards) fast and bounded
    in size, and (c) vacuum reclaims old manifests + unreferenced files
    in one directory walk within a time bound. Everything here is pure
    metadata -- no Spark -- because that is exactly the claim under
    test: table maintenance must not touch data.

    (Driver-side manifests ARE the design at this scale: one JSON entry
    per live file is the same footprint Spark's own file index pays to
    plan the scan; Iceberg pages this into manifest files per shard
    group, a seam this layout can adopt by sharding the `files` map.)"""
    import json
    import os
    import time

    from cassandra_sstable_to_protocolbuf_spark import versioned as V

    table = str(tmp_path / "big")
    os.makedirs(os.path.join(table, V._MANIFESTS))
    n_shards = 10_000

    # one real tiny file, hardlinked per shard: vacuum sees real inodes
    data_root = os.path.join(table, V._DATA, "c0")
    os.makedirs(data_root)
    seed = os.path.join(data_root, "seed.parquet")
    with open(seed, "wb") as f:
        f.write(b"PAR1")
    files = {}
    for s in range(n_shards):
        d = os.path.join(data_root, f"pshard={s}")
        os.makedirs(d)
        os.link(seed, os.path.join(d, "part-0.parquet"))
        files[str(s)] = [os.path.join(V._DATA, "c0", f"pshard={s}",
                                      "part-0.parquet")]
    os.unlink(seed)

    t0 = time.perf_counter()
    V._commit(table, files, 0)
    commit0_s = time.perf_counter() - t0
    assert commit0_s < 5.0, f"10k-shard commit took {commit0_s:.2f}s"
    msize = os.path.getsize(V._manifest_path(table, 0))
    assert msize < 2 << 20, f"10k-shard manifest is {msize} bytes"

    t0 = time.perf_counter()
    m = V.read_manifest(table)
    read_s = time.perf_counter() - t0
    assert read_s < 2.0, f"10k-shard manifest read took {read_s:.2f}s"
    assert len(m["files"]) == n_shards

    # 100 single-shard commits: each rewrites ONE shard entry and links
    # one new file; everything else carries over by reference
    t0 = time.perf_counter()
    for v in range(1, 101):
        shard = str(v % n_shards)
        prev = V.read_manifest(table)
        rel_dir = os.path.join(V._DATA, f"c{v}", f"pshard={shard}")
        os.makedirs(os.path.join(table, rel_dir))
        rel = os.path.join(rel_dir, "part-0.parquet")
        with open(os.path.join(table, rel), "wb") as f:
            f.write(b"PAR1")
        nxt = dict(prev["files"])
        nxt[shard] = [rel]
        V._commit(table, nxt, v)
    chain_s = time.perf_counter() - t0
    assert chain_s < 60.0, f"100-commit chain took {chain_s:.2f}s"

    # reference carry-over: untouched shard entries are path-identical
    m0 = V.read_manifest(table, 0)
    m100 = V.read_manifest(table, 100)
    untouched = [s for s in map(str, range(200, 300))]
    for s in untouched:
        assert m100["files"][s] == m0["files"][s]

    # vacuum: keep 2 versions, reclaim 99 manifests + the 98 replaced
    # files, all within one bounded walk
    t0 = time.perf_counter()
    deleted = V.vacuum(table, retain=2, min_file_age_s=0.0)
    vac_s = time.perf_counter() - t0
    assert vac_s < 30.0, f"10k-shard vacuum took {vac_s:.2f}s"
    assert V.list_versions(table) == [99, 100]
    live = {os.path.join(table, p)
            for v in (99, 100)
            for fl in V.read_manifest(table, v)["files"].values()
            for p in fl}
    on_disk = {os.path.join(dp, fn)
               for dp, _dn, fns in os.walk(os.path.join(table, V._DATA))
               for fn in fns if fn.endswith(".parquet")}
    assert on_disk == live, "vacuum left orphans or deleted live files"
    assert len(deleted) > 90
