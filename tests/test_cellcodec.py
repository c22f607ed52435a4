"""Vectorized cell codec (cellcodec) parity pins -- VERDICT r7 #1.

The batch codec must be BYTE-identical (write side) and ROW-identical
(read side, order included) to the scalar reference paths it
accelerates; these tests pin that equivalence over mixed cell kinds,
dead partitions, chunked block accounting, Overrun resume, and the
Cassandra-quirk murmur/bloom arithmetic. The scalar paths stay in the
tree as the semantic reference, so any divergence is a loud diff here
rather than a silent corruption at 100 TB.
"""

from __future__ import annotations

import hashlib
import os
import random
import struct

import numpy as np
import pytest

from cassandra_sstable_to_protocolbuf_spark.sources import cellcodec as C
from cassandra_sstable_to_protocolbuf_spark.sources import sstable_native as N

LIVE = (N.LIVE_LOCAL_DELETION, N.LIVE_MARKED_AT)


def test_liveness_sentinels_match():
    assert C._LIVE_LDT == N.LIVE_LOCAL_DELETION
    assert C._LIVE_MARKED == N.LIVE_MARKED_AT


def _mixed_fixture(dir_path, n_parts=60, seed=3):
    """Scalar-writer sstable with every cell kind and a few dead
    partitions; returns (data_path, the per-partition build plan)."""
    random.seed(seed)
    keys = sorted([b"pk%04d" % i for i in range(n_parts)],
                  key=lambda k: (N.md5_token(k), k))
    plan = []
    for j, k in enumerate(keys):
        cells = []
        for c in range(random.randrange(1, 9)):
            kind = random.choice(["LIVE", "LIVE", "LIVE", "DELETED",
                                  "EXPIRING", "COUNTER"])
            val = bytes(random.randrange(256)
                        for _ in range(random.randrange(0, 30)))
            cells.append((b"c%03d" % c, kind, j * 100 + c, val))
        plan.append((k, (5, 5) if j % 7 == 0 else None, cells))
    w = N.SSTableStreamWriter(dir_path, 1)
    for k, deletion, cells in plan:
        w.start_partition(k, deletion)
        for name, kind, ts, val in cells:
            if kind == "DELETED":
                w.add_cell(name, kind, ts, b"", local_deletion=123)
            elif kind == "EXPIRING":
                w.add_cell(name, kind, ts, val, ttl=60,
                           local_expiration=999)
            elif kind == "COUNTER":
                w.add_cell(name, kind, ts, val,
                           timestamp_of_last_delete=-5)
            else:
                w.add_cell(name, kind, ts, val)
        w.end_partition()
    return w.close(), plan


def _plan_to_flat(plan):
    """The scalar build plan re-expressed as write_partitions_block's
    flat columnar inputs."""
    pk, pd_, cnt, nm, kc, tss, vv, pf = [], [], [], [], [], [], [], []
    for k, deletion, cells in plan:
        pk.append(k)
        pd_.append(deletion)
        cnt.append(len(cells))
        for name, kind, ts, val in cells:
            nm.append(name)
            tss.append(ts)
            if kind == "DELETED":
                kc.append(C.KIND_DELETED)
                vv.append(struct.pack(">i", 123))
                pf.append(b"")
            elif kind == "EXPIRING":
                kc.append(C.KIND_EXPIRING)
                vv.append(val)
                pf.append(struct.pack(">ii", 60, 999))
            elif kind == "COUNTER":
                kc.append(C.KIND_COUNTER)
                vv.append(val)
                pf.append(struct.pack(">q", -5))
            else:
                kc.append(C.KIND_LIVE)
                vv.append(val)
                pf.append(b"")
    return (pk, pd_, np.array(cnt, np.int64), nm, np.array(kc, np.int8),
            np.array(tss, np.int64), vv, pf)


def test_batch_writer_components_byte_identical(tmp_path):
    """write_partitions_block must produce EVERY component byte-for-
    byte equal to the per-cell writer on a mixed-kind fixture: Data,
    Index (promoted blobs included), Filter, Summary."""
    p1, plan = _mixed_fixture(str(tmp_path / "scalar"))
    w = N.SSTableStreamWriter(str(tmp_path / "batch"), 1)
    w.write_partitions_block(*_plan_to_flat(plan))
    p2 = w.close()
    for sfx in (N.DATA_SUFFIX, N.INDEX_SUFFIX, N.FILTER_SUFFIX,
                N.SUMMARY_SUFFIX):
        a = p1[:-len(N.DATA_SUFFIX)] + sfx
        b = p2[:-len(N.DATA_SUFFIX)] + sfx
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read(), sfx


def test_batch_writer_wide_rows_promote_identically(tmp_path):
    """Promoted-index blobs (block extents, min/max names) from the
    batch path equal the scalar path's for wide rows, and chunked
    add_cells_batch block accounting equals one-shot accounting for
    EVERY chunking of the same atom stream."""
    keys = sorted([b"w1", b"w2"], key=lambda k: (N.md5_token(k), k))
    cells = [(b"n%04d" % i, i, b"v" * 20) for i in range(300)]

    w1 = N.SSTableStreamWriter(str(tmp_path / "scalar"), 1,
                               column_index_bytes=256)
    for k in keys:
        w1.start_partition(k)
        for name, ts, val in cells:
            w1.add_cell(name, "LIVE", ts, val)
        w1.end_partition()
    p1 = w1.close()

    for chunks in ([300], [1] * 300, [7, 100, 193], [299, 1]):
        w2 = N.SSTableStreamWriter(
            str(tmp_path / f"batch{len(chunks)}"), 1,
            column_index_bytes=256)
        for k in keys:
            w2.start_partition(k)
            pos = 0
            for c in chunks:
                sub = cells[pos:pos + c]
                w2.add_cells_batch(
                    [s[0] for s in sub], np.zeros(len(sub), np.int8),
                    np.array([s[1] for s in sub], np.int64),
                    [s[2] for s in sub])
                pos += c
            w2.end_partition()
        p2 = w2.close()
        with open(p1, "rb") as fa, open(p2, "rb") as fb:
            assert fa.read() == fb.read(), chunks
        ia = p1[:-len(N.DATA_SUFFIX)] + N.INDEX_SUFFIX
        ib = p2[:-len(N.DATA_SUFFIX)] + N.INDEX_SUFFIX
        with open(ia, "rb") as fa, open(ib, "rb") as fb:
            assert fa.read() == fb.read(), chunks


def test_batch_writer_rejects_out_of_order_and_empty_names(tmp_path):
    w = N.SSTableStreamWriter(str(tmp_path), 1)
    ks = sorted([b"k1", b"k2"], key=lambda k: (N.md5_token(k), k))
    with pytest.raises(ValueError, match="decorated order"):
        w.write_partitions_block(
            [ks[1], ks[0]], [None, None], np.array([1, 1]),
            [b"a", b"b"], np.zeros(2, np.int8), np.zeros(2, np.int64),
            [b"", b""])
    with pytest.raises(ValueError, match="non-empty"):
        w.write_partitions_block(
            [ks[0]], [None], np.array([1]), [b""],
            np.zeros(1, np.int8), np.zeros(1, np.int64), [b""])
    # cross-block ordering: a second block starting at-or-before the
    # first block's last key must fail
    w.write_partitions_block([ks[0]], [None], np.array([1]), [b"n"],
                             np.zeros(1, np.int8), np.zeros(1, np.int64),
                             [b"v"])
    with pytest.raises(ValueError, match="decorated order"):
        w.write_partitions_block([ks[0]], [None], np.array([1]), [b"n"],
                                 np.zeros(1, np.int8),
                                 np.zeros(1, np.int64), [b"v"])
    w.abort()


def test_decode_rows_match_scalar_iter(tmp_path):
    """decode_partitions + registers_to_arrow reproduce _iter_rows
    EXACTLY (same rows, same order, marker rows, nulls, kinds) on the
    mixed fixture -- plain and live_only."""
    data, _plan = _mixed_fixture(str(tmp_path))
    raw = open(data, "rb").read()
    for live_only in (False, True):
        rdr = N.SSTableNativeReader(str(tmp_path), 10 ** 6,
                                    live_only=live_only)
        ref = [tuple(r) for s in rdr.partitions()
               for r in rdr._iter_rows(s)]
        regs = C._Registers()
        parts: list = []
        done = C.decode_partitions(raw, 0, len(raw), regs, parts,
                                   live_only=live_only)
        assert done == len(raw)
        b = C.registers_to_arrow(raw, regs, parts, ref[0][0], live_only)
        got = list(zip(*[col.to_pylist() for col in b.columns]))
        assert got == ref, f"live_only={live_only}"


def test_decode_overrun_rolls_back_and_resumes(tmp_path):
    """A truncated buffer raises Overrun with registers rolled back to
    the last complete partition; resuming with more bytes yields
    exactly the full decode (no duplicates, no gaps)."""
    data, _plan = _mixed_fixture(str(tmp_path))
    raw = open(data, "rb").read()
    regs_full = C._Registers()
    parts_full: list = []
    C.decode_partitions(raw, 0, len(raw), regs_full, parts_full)

    for frac in (0.13, 0.5, 0.96):
        cut = int(len(raw) * frac)
        regs = C._Registers()
        parts: list = []
        try:
            o = C.decode_partitions(raw[:cut], 0, len(raw), regs, parts)
        except C.Overrun as e:
            o = e.partition_start
        assert len(regs.spans) % 6 == 0
        assert len(regs.part_counts) == len(parts)
        C.decode_partitions(raw, 0, len(raw), regs, parts, start_at=o)
        assert bytes(regs.spans) == bytes(regs_full.spans), frac
        assert parts == parts_full, frac


def test_fast_read_path_matches_tuple_path_through_spark(tmp_path, spark):
    """End-to-end through the registered source: the fast Arrow decode
    (plain scan) equals the scalar tuple path (forced via a name
    slice's old-format-style fallback is separate; here we compare
    against collecting _iter_rows directly)."""
    data, _plan = _mixed_fixture(str(tmp_path))
    df = N.read_native_cells(spark, str(tmp_path))
    got = sorted((r.key, r.name, r.value, r.writeTime, r.cell_kind,
                  r.ttl, r.local_expiration, r.partition_deletion_live)
                 for r in df.collect())
    rdr = N.SSTableNativeReader(str(tmp_path), 4096)
    ref = sorted((r[1], r[2], r[3], r[4], r[5], r[6], r[7], r[8])
                 for s in rdr.partitions() for r in rdr._iter_rows(s))
    assert got == ref


def test_fast_read_giant_partition_cap_falls_back(tmp_path):
    """A partition larger than the buffered cap continues through the
    scalar path mid-split with identical rows (the O(batch) memory
    guarantee for pathological single partitions)."""
    parts = [{"key": b"w", "cells": [
        {"name": b"c%06d" % i, "kind": "LIVE", "timestamp": i,
         "value": b"v" * 50} for i in range(3000)]}]
    N.write_sstable(str(tmp_path), 1, parts)
    rdr = N.SSTableNativeReader(str(tmp_path), 10 ** 6)
    rdr.FAST_SCAN_PARTITION_CAP = 16384  # force the cap at test scale
    rdr.FAST_SCAN_GROW = 8192
    splits = rdr.partitions()
    got = [tuple(r) for s in splits for b in rdr.read(s)
           for r in zip(*[c.to_pylist() for c in b.columns])]
    ref = [tuple(r) for s in splits for r in rdr._iter_rows(s)]
    assert got == ref


def test_murmur_and_bloom_batch_bit_identical():
    """murmur3_hash128_batch (Java signed-tail quirk included) and
    bloom_add_batch equal the scalar implementations over random keys
    of every tail length, high bytes included."""
    random.seed(7)
    keys = [bytes(random.randrange(256) for _ in range(ln))
            for ln in list(range(0, 40)) * 20]
    random.shuffle(keys)
    h1, h2 = C.murmur3_hash128_batch(keys)
    for i, k in enumerate(keys):
        assert N.murmur3_hash128(k) == (int(h1[i]), int(h2[i])), k

    b_scalar = N.BloomFilter.build(len(keys), 0.01)
    b_batch = N.BloomFilter.build(len(keys), 0.01)
    for k in keys:
        b_scalar.add(k)
    C.bloom_add_batch(b_batch, keys)
    assert b_scalar.words == b_batch.words
    for k in keys:
        assert b_batch.might_contain(k)


def test_iter_index_key_chunks_matches_iter_index(tmp_path):
    data, _plan = _mixed_fixture(str(tmp_path), n_parts=300)
    index = data[:-len(N.DATA_SUFFIX)] + N.INDEX_SUFFIX
    ref = [k for k, _o, _p in N.iter_index(index)]
    got = [k for chunk in C.iter_index_key_chunks(index, chunk_keys=64)
           for k in chunk]
    assert got == ref


def test_encode_index_entries_matches_struct_pack():
    keys = [b"a", b"bb", b"ccc"]
    pos = np.array([0, 100, 2 ** 40], dtype=np.int64)
    promoted = [b"", b"PROMO", b""]
    blob, offs = C.encode_index_entries(keys, pos, promoted)
    ref = b"".join(
        struct.pack(">H", len(k)) + k + struct.pack(">QI", p, len(pr))
        + pr for k, p, pr in zip(keys, pos.tolist(), promoted))
    assert bytes(blob) == ref
    assert offs.tolist() == [0, 15, 36]


def _sliced_fixture(dir_path, n_parts=40, seed=11):
    """Wide (promoted) + narrow partitions, every cell kind, dead
    partitions -- the sliced read path's full shape space."""
    random.seed(seed)
    keys = sorted([b"pk%04d" % i for i in range(n_parts)],
                  key=lambda k: (N.md5_token(k), k))
    w = N.SSTableStreamWriter(dir_path, 1, column_index_bytes=256)
    for j, k in enumerate(keys):
        w.start_partition(k, (5, 5) if j % 9 == 0 else None)
        n_cells = 40 if j % 3 == 0 else random.randrange(1, 6)
        for c in range(n_cells):
            kind = random.choice(["LIVE", "LIVE", "LIVE", "DELETED",
                                  "EXPIRING", "COUNTER"])
            name = b"n%04d" % c
            val = bytes(random.randrange(256)
                        for _ in range(random.randrange(0, 30)))
            if kind == "DELETED":
                w.add_cell(name, kind, j * 100 + c, b"",
                           local_deletion=123)
            elif kind == "EXPIRING":
                w.add_cell(name, kind, j * 100 + c, val, ttl=60,
                           local_expiration=999)
            elif kind == "COUNTER":
                w.add_cell(name, kind, j * 100 + c, val,
                           timestamp_of_last_delete=-5)
            else:
                w.add_cell(name, kind, j * 100 + c, val)
        w.end_partition()
    return w.close()


@pytest.mark.parametrize("coarse", [False, True])
@pytest.mark.parametrize("live_only", [False, True])
@pytest.mark.parametrize("name_range", [(b"n0002", b"n0007"),
                                        (b"n0030", None),
                                        (None, b"n0003"),
                                        (b"n0001", b"n0001\x00")])
def test_sliced_fast_path_matches_scalar(tmp_path, coarse, live_only,
                                         name_range):
    """VERDICT r8 #3 row-identity pin: read() (vectorized sliced path)
    equals _iter_rows_sliced (the scalar reference) as a row multiset
    for every slice shape, live_only on and off, through BOTH executor
    shapes -- plan-derived _SliceRunSplits + narrow windows, and (with
    the index-walk cap forced to 0) the coarse lockstep walk's wide
    runs."""
    _sliced_fixture(str(tmp_path))
    rdr = N.SSTableNativeReader(str(tmp_path), 7, live_only=live_only,
                                name_range=name_range)
    if coarse:
        rdr.SLICE_INDEX_WALK_CAP = 0  # decline planning: coarse splits
    splits = rdr.partitions()
    assert splits
    if coarse:
        assert not any(isinstance(s, N._SliceRunSplit) for s in splits)
    got = sorted(tuple(r) for s in splits for b in rdr.read(s)
                 for r in zip(*[c.to_pylist() for c in b.columns]))
    ref = sorted(tuple(r) for s in splits for r in rdr._iter_rows(s))
    assert got == ref
    if name_range != (b"n0030", None) or not live_only:
        assert got, "vacuous slice: fixture regression"


def test_sliced_fast_giant_run_cap_falls_back(tmp_path):
    """A selected run larger than FAST_SCAN_PARTITION_CAP continues
    through the scalar atom walk with identical rows (the sliced twin
    of test_fast_read_giant_partition_cap_falls_back)."""
    parts = [{"key": b"w", "cells": [
        {"name": b"c%06d" % i, "kind": "LIVE", "timestamp": i,
         "value": b"v" * 50} for i in range(3000)]},
        {"key": b"x", "cells": [
            {"name": b"c000001", "kind": "LIVE", "timestamp": 1,
             "value": b"z"}]}]
    N.write_sstable(str(tmp_path), 1, parts, column_index_bytes=4096)
    for walk_cap in (None, 0):  # run splits AND the coarse walk
        rdr = N.SSTableNativeReader(str(tmp_path), 10 ** 6,
                                    name_range=(b"c000010", b"c002900"))
        rdr.FAST_SCAN_PARTITION_CAP = 2048  # every 4 KiB block run over
        if walk_cap is not None:
            rdr.SLICE_INDEX_WALK_CAP = walk_cap
        splits = rdr.partitions()
        got = sorted(tuple(r) for s in splits for b in rdr.read(s)
                     for r in zip(*[c.to_pylist() for c in b.columns]))
        ref = sorted(tuple(r) for s in splits for r in rdr._iter_rows(s))
        assert got == ref and got, f"walk_cap={walk_cap}"


def test_sliced_fast_path_matches_scalar_through_spark(tmp_path, spark):
    """End-to-end through the registered source with a clustering
    slice: the vectorized sliced read equals the scalar walk row for
    row (sorted), including ttl/local_expiration nulls and kinds."""
    _sliced_fixture(str(tmp_path))
    df = N.read_native_cells(spark, str(tmp_path),
                             name_range=(b"n0002", b"n0020"))
    got = sorted((bytes(r.key), bytes(r.name), bytes(r.value),
                  r.writeTime, r.cell_kind, r.ttl, r.local_expiration,
                  r.partition_deletion_live) for r in df.collect())
    rdr = N.SSTableNativeReader(str(tmp_path), 4096,
                                name_range=(b"n0002", b"n0020"))
    ref = sorted((r[1], r[2], r[3], r[4], r[5], r[6], r[7], r[8])
                 for s in rdr.partitions() for r in rdr._iter_rows(s))
    assert got == ref and got


def test_fast_read_band_partition_stays_vectorized(tmp_path):
    """A partition in the (CAP/2, CAP] band preceded by a small one must
    stay on the vectorized path: the old Overrun growth overshot the
    buffer window to CAP + GROW and demoted exactly this band to the
    scalar fallback (ADVICE r10). Rows must still match the scalar walk."""
    parts = [
        {"key": b"a-small", "cells": [
            {"name": b"c%04d" % i, "kind": "LIVE", "timestamp": i,
             "value": b"v" * 40} for i in range(45)]},
        {"key": b"b-wide", "cells": [
            {"name": b"c%04d" % i, "kind": "LIVE", "timestamp": i,
             "value": b"v" * 40} for i in range(190)]},  # ~12 KB
    ]
    N.write_sstable(str(tmp_path), 1, parts)
    rdr = N.SSTableNativeReader(str(tmp_path), 10 ** 6)
    rdr.FAST_SCAN_PARTITION_CAP = 16384
    rdr.FAST_SCAN_GROW = 2048
    calls = []
    orig = rdr._read_fast_fallback

    def spy(*a, **kw):
        calls.append(a)
        return orig(*a, **kw)

    rdr._read_fast_fallback = spy
    splits = rdr.partitions()
    got = [tuple(r) for s in splits for b in rdr.read(s)
           for r in zip(*[c.to_pylist() for c in b.columns])]
    ref = [tuple(r) for s in splits for r in rdr._iter_rows(s)]
    assert got == ref
    assert not calls, "band partition was demoted to the scalar fallback"


def test_split_target_bytes_wrap_around_range():
    """A wrap-around token interval (hi < lo) covers 1 - (lo - hi) of the
    ring; the old sizing computed a negative fraction and fell to the
    1/1024 floor, planning maximally fine splits (VERDICT r10 #4)."""
    def mk(tr):
        rdr = N.SSTableNativeReader.__new__(N.SSTableNativeReader)
        rdr.partitions_per_split = None
        rdr.token_range = tr
        rdr.scan_parallelism = 4
        rdr._scan_total_bytes = 1 << 30
        return rdr

    half = mk(("40", "c0"))._split_target_bytes(1 << 30)
    wrapped = mk(("c0", "40"))._split_target_bytes(1 << 30)
    assert wrapped == half  # both intervals cover half the ring
    # quarter wrap: hi < lo covering 1 - 0.5 = ... ("e0", "60") covers
    # 1 - (0.875 - 0.375) = 0.5; ("c0", "20") covers 0.375
    q = mk(("c0", "20"))._split_target_bytes(1 << 30)
    full = mk(None)._split_target_bytes(1 << 30)
    assert q < full and q >= (1 << 30) * 0.375 // 4


def _write_ic_fixture(d: str, n_parts: int = 400, cells_per: int = 6):
    """Hand-assembled pre-'ja' ('ic') sstable: rowSize + columnCount
    framing (test_golden_209_format layout), mixed cell kinds, a dead
    partition, and a zero-column row; Index.db with promotedSize=0."""
    import os
    import struct

    live_del = struct.pack(">iq", 0x7FFFFFFF, -(2 ** 63))
    dead_del = struct.pack(">iq", 100, 5_000)

    def atom(name, kind, ts, value):
        if kind == "LIVE":
            return (struct.pack(">H", len(name)) + name + b"\x00"
                    + struct.pack(">qi", ts, len(value)) + value)
        if kind == "DELETED":
            return (struct.pack(">H", len(name)) + name + b"\x01"
                    + struct.pack(">qi", ts, 4) + struct.pack(">i", 77))
        return (struct.pack(">H", len(name)) + name + b"\x02"
                + struct.pack(">ii", 60, 99)
                + struct.pack(">qi", ts, len(value)) + value)

    import hashlib

    data = bytearray()
    index = bytearray()
    keys = sorted((b"k%06d" % i for i in range(n_parts)),
                  key=lambda k: hashlib.md5(k).hexdigest())
    for i, key in enumerate(keys):
        if i % 97 == 41:
            deletion, atoms, count = dead_del, b"", 0
        elif i % 89 == 13:
            deletion, atoms, count = live_del, b"", 0
        else:
            deletion = live_del
            count = cells_per
            atoms = b"".join(
                atom(b"c%04d" % c,
                     ("LIVE", "DELETED", "EXPIRING")[c % 3 if i % 7 == 0
                                                     else 0],
                     1000 + c, b"val-%06d-%d" % (i, c))
                for c in range(cells_per))
        payload = deletion + struct.pack(">i", count) + atoms
        index += (struct.pack(">H", len(key)) + key
                  + struct.pack(">qi", len(data), 0))
        data += (struct.pack(">H", len(key)) + key
                 + struct.pack(">q", len(payload)) + payload)
    base = os.path.join(d, "Keyspace1-Standard1-ic-1-")
    with open(base + "Data.db", "wb") as f:
        f.write(data)
    with open(base + "Index.db", "wb") as f:
        f.write(index)
    return base + "Data.db"


def test_fast_read_old_format_matches_scalar(tmp_path):
    """Pre-'ja' row framing through the vectorized decoder
    (decode_partitions old_format): row-for-row identical to the scalar
    walk, including dead partitions, zero-column rows and non-LIVE
    kinds, plain AND live_only."""
    _write_ic_fixture(str(tmp_path))
    for live_only in (False, True):
        rdr = N.SSTableNativeReader(str(tmp_path), 10 ** 6,
                                    live_only=live_only)
        splits = rdr.partitions()
        got = [tuple(r) for s in splits for b in rdr.read(s)
               for r in zip(*[c.to_pylist() for c in b.columns])]
        ref = [tuple(r) for s in splits for r in rdr._iter_rows(s)]
        assert got == ref and len(got) > 1000


def test_old_format_sliced_read_matches_scalar(tmp_path):
    """name_range over a pre-'ja' file: the vectorized route must
    reproduce the scalar old-format branch (plain scan + exact filter;
    pre-'ja' files carry no engine promoted blobs to walk)."""
    _write_ic_fixture(str(tmp_path), n_parts=300, cells_per=8)
    for live_only in (False, True):
        rdr = N.SSTableNativeReader(str(tmp_path), 10 ** 6,
                                    live_only=live_only,
                                    name_range=(b"c0002", b"c0006"))
        splits = rdr.partitions()
        got = sorted(tuple(r) for s in splits for b in rdr.read(s)
                     for r in zip(*[c.to_pylist() for c in b.columns]))
        ref = sorted(tuple(r) for s in splits for r in rdr._iter_rows(s))
        assert got == ref and len(got) > 300
