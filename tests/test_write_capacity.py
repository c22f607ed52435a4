"""Capacity floors (VERDICT r5 #3, vectorized r8 per VERDICT r7 #1):
the per-task codec throughput IS the engine's 100 TB number, so a
silent regression there must fail loudly. Direct single-task
micro-benches (no Spark -- codec work is per-task CPU, exactly what
one executor core does), with floors at ~1/4 of idle-measured
throughput so machine load cannot flake them.

Idle 2026-08-16 measurements (200k cells, 4-cell partitions -- the
per-partition-overhead-heavy WORST case; one task):
  * batch binary sink (write_partitions_block): ~905k cells/s plain,
    ~899k cells/s lz4 -- 4.7x / 3.9x the round-7 per-cell loop
  * legacy per-cell sink (add_cell): ~250k cells/s (bloom build now
    batched at close; kept as the semantic reference path)
  * fast Arrow decode (cellcodec read path): ~738k rows/s, 2.5x the
    tuple generator chain
  * pb+zstd sink: ~462k cells/s (protowire, unchanged)
Wall-time complement: bench.py --check-bands."""

from __future__ import annotations

import hashlib
import io
import time

import numpy as np


def _bench_binary(tmp_path, compression, n_cells=120_000):
    from cassandra_sstable_to_protocolbuf_spark.sources.sstable_native import (
        SSTableStreamWriter)

    keys = sorted((b"key-%07d" % i for i in range(n_cells // 4)),
                  key=lambda k: hashlib.md5(k).digest())
    w = SSTableStreamWriter(str(tmp_path / (compression or "plain")), 1,
                            compression=compression)
    start = time.monotonic()
    for i, k in enumerate(keys):
        w.start_partition(k)
        for c in range(4):
            w.add_cell(b"col%d" % c, "LIVE", i * 10 + c,
                       b"value-%07d-%d" % (i, c))
        w.end_partition()
    w.close()
    return n_cells / (time.monotonic() - start)


def _bench_pb(n_cells=120_000):
    import pyarrow as pa

    from cassandra_sstable_to_protocolbuf_spark import protowire as pw

    rows = [(b"key-%07d" % i,
             [(b"col%d" % c, b"value-%07d-%d" % (i, c), i * 10 + c)
              for c in range(4)])
            for i in range(n_cells // 4)]
    sink = io.BytesIO()
    start = time.monotonic()
    with pa.CompressedOutputStream(pa.output_stream(sink), "zstd") as z:
        for key, cols in rows:
            z.write(pw.frame_row(pw.encode_row(key, cols)))
    return n_cells / (time.monotonic() - start)


def _bench_batch_binary(tmp_path, compression, n_cells=200_000):
    from cassandra_sstable_to_protocolbuf_spark.sources.sstable_native import (
        SSTableStreamWriter)

    keys = sorted((b"key-%07d" % i for i in range(n_cells // 4)),
                  key=lambda k: hashlib.md5(k).digest())
    names = [b"col%d" % (c % 4) for c in range(n_cells)]
    vals = [b"value-%07d-%d" % (i // 4, i % 4) for i in range(n_cells)]
    codes = np.zeros(n_cells, np.int8)
    ts = np.arange(n_cells, dtype=np.int64)
    counts = np.full(n_cells // 4, 4, np.int64)
    dels = [None] * (n_cells // 4)
    w = SSTableStreamWriter(
        str(tmp_path / f"b{compression or 'plain'}{time.monotonic_ns()}"),
        1, compression=compression)
    start = time.monotonic()
    pp = 16384 // 4
    for s in range(0, n_cells // 4, pp):
        e = min(s + pp, n_cells // 4)
        w.write_partitions_block(keys[s:e], dels[s:e], counts[s:e],
                                 names[s * 4:e * 4], codes[s * 4:e * 4],
                                 ts[s * 4:e * 4], vals[s * 4:e * 4],
                                 None)
    w.close()
    return n_cells / (time.monotonic() - start)


def test_binary_sink_throughput_floor(tmp_path, capsys):
    best = max(_bench_binary(tmp_path, None) for _ in range(2))
    best_lz = max(_bench_binary(tmp_path, "lz4") for _ in range(2))
    with capsys.disabled():
        print(f"\n[capacity] per-cell binary sink {best:,.0f} cells/s "
              f"plain, {best_lz:,.0f} cells/s lz4 (floor 50k)")
    assert best >= 50_000, f"binary encode regressed: {best:,.0f} cells/s"
    assert best_lz >= 50_000, f"lz4 encode regressed: {best_lz:,.0f} cells/s"


def test_batch_binary_sink_throughput_floor(tmp_path, capsys):
    """The vectorized write path (VERDICT r7 #1): floor at ~1/4 of the
    ~900k cells/s idle measurement -- and >= 4x the round-7 50k
    per-cell floor, the directive's done-bar."""
    best = max(_bench_batch_binary(tmp_path, None) for _ in range(2))
    best_lz = max(_bench_batch_binary(tmp_path, "lz4") for _ in range(2))
    with capsys.disabled():
        print(f"\n[capacity] batch binary sink {best:,.0f} cells/s "
              f"plain, {best_lz:,.0f} cells/s lz4 (floor 200k)")
    assert best >= 200_000, \
        f"batch encode regressed: {best:,.0f} cells/s"
    assert best_lz >= 200_000, \
        f"batch lz4 encode regressed: {best_lz:,.0f} cells/s"


def test_fast_decode_throughput_floor(tmp_path, capsys):
    """The vectorized read path: floor at ~1/4 of the ~738k rows/s
    idle measurement (the round-7 tuple chain measured ~297k)."""
    from cassandra_sstable_to_protocolbuf_spark.sources.sstable_native import (
        SSTableNativeReader)

    _bench_batch_binary(tmp_path, None)  # writes the fixture
    rdr = SSTableNativeReader(str(tmp_path), 1_000_000)
    splits = rdr.partitions()
    best = 0.0
    for _ in range(2):
        t0 = time.monotonic()
        n = 0
        for s in splits:
            for b in rdr.read(s):
                n += b.num_rows
        best = max(best, n / (time.monotonic() - t0))
    with capsys.disabled():
        print(f"\n[capacity] fast decode {best:,.0f} rows/s (floor 150k)")
    assert best >= 150_000, f"fast decode regressed: {best:,.0f} rows/s"


def test_pb_sink_throughput_floor(capsys):
    best = max(_bench_pb() for _ in range(2))
    with capsys.disabled():
        print(f"\n[capacity] pb+zstd per-row sink {best:,.0f} cells/s "
              f"(floor 110k)")
    assert best >= 110_000, f"pb encode regressed: {best:,.0f} cells/s"


def test_pb_block_throughput_floor(capsys):
    """The vectorized protobuf block framer (the sink's actual r8 hot
    path): ~1.27M cells/s idle on the 4-cell shape; floor at ~1/4."""
    from cassandra_sstable_to_protocolbuf_spark import protowire as pw

    n_cells = 200_000
    keys = [b"key-%07d" % i for i in range(n_cells // 4)]
    counts = np.full(n_cells // 4, 4, np.int64)
    names = [b"col%d" % (c % 4) for c in range(n_cells)]
    vals = [b"value-%07d-%d" % (i // 4, i % 4) for i in range(n_cells)]
    wts = np.arange(n_cells, dtype=np.int64) * 10
    best = 0.0
    for _ in range(2):
        t0 = time.monotonic()
        import io as _io

        import pyarrow as pa
        sink = _io.BytesIO()
        with pa.CompressedOutputStream(pa.output_stream(sink), "zstd") as z:
            z.write(pw.encode_rows_block(keys, counts, names, vals, wts))
        best = max(best, n_cells / (time.monotonic() - t0))
    with capsys.disabled():
        print(f"\n[capacity] pb+zstd block sink {best:,.0f} cells/s "
              f"(floor 300k)")
    assert best >= 300_000, f"pb block encode regressed: {best:,.0f}"


def test_production_target_shard_write(tmp_path, capsys):
    """The shard-size knob at production scale-shape (VERDICT r8 #5):
    ONE writer task producing ONE ~64 MiB logical shard -- the honest
    production setting -- end to end through the vectorized batch
    writer, with a throughput floor (MB/s of logical payload). The
    8 MiB demo constant is a gate-speed knob, not a design limit."""
    from cassandra_sstable_to_protocolbuf_spark.compaction import (
        logical_data_bytes)
    from cassandra_sstable_to_protocolbuf_spark.sources.sstable_native import (
        SSTableStreamWriter)

    target = 64 << 20
    vlen = 200
    # ~229 logical bytes/partition (16 + keylen + one 15+name+value
    # cell) -> ~300k partitions reach the 64 MiB target
    n_parts = target // 229 + 1
    keys = sorted((b"key-%08d" % i for i in range(n_parts)),
                  key=lambda k: hashlib.md5(k).digest())
    names = [b"c"] * n_parts
    vals = [b"v" * vlen] * n_parts
    codes = np.zeros(n_parts, np.int8)
    ts = np.arange(n_parts, dtype=np.int64)
    w = SSTableStreamWriter(str(tmp_path / "prod64"), 1)
    start = time.monotonic()
    pp = 16384
    counts = np.ones(pp, np.int64)
    for s in range(0, n_parts, pp):
        e = min(s + pp, n_parts)
        w.write_partitions_block(keys[s:e], [None] * (e - s),
                                 counts[:e - s], names[s:e],
                                 codes[s:e], ts[s:e], vals[s:e], None)
    data_path = w.close()
    elapsed = time.monotonic() - start
    logical = logical_data_bytes([data_path])
    assert logical >= target, f"shard under target: {logical}"
    mbps = logical / (1 << 20) / elapsed
    with capsys.disabled():
        print(f"\n[capacity] 64 MiB-target shard: {logical / (1 << 20):.1f}"
              f" MiB in {elapsed:.2f}s = {mbps:,.0f} MB/s/task (floor 8)")
    # floor ~1/4 of the idle measurement; 8 MB/s/task x 1000 cores is
    # already ~28 TB/h of shard-write capacity
    assert mbps >= 8, f"64 MiB shard write regressed: {mbps:.1f} MB/s"


def test_production_scale_shard_arithmetic():
    """Metadata-only sanity of the knob at 100 TB shapes: the derived
    counts and split factors a production target actually produces."""
    from cassandra_sstable_to_protocolbuf_spark import compaction as CP

    t256 = 256 << 20
    # a 1 TiB overlapping-generation bin at a 256 MiB target: one job,
    # 4096 shards of ~256 MiB
    assert CP.derive_n_intervals(1 << 40, t256) == 1
    assert CP.derive_n_outputs(1 << 40, t256) == 4096
    # a 10 TiB bin: split-phase, 16 interval jobs x 4096-capped shards
    assert CP.derive_n_intervals(10 << 40, t256) == 16
    n_total = 16 * CP.derive_n_outputs((10 << 40) // 16, t256)
    assert (10 << 40) <= n_total * t256  # outputs <= one target each
    # and the shard space itself is nowhere near exhausted
    assert n_total <= CP.TOKEN_SHARD_SPACE // 1024


def test_sliced_decode_throughput_floor(tmp_path, capsys):
    """The vectorized clustering-slice read (VERDICT r8 #3): selected
    promoted-block runs decode through the batch codec, so a slice of
    wide partitions must sustain the same order of throughput as the
    plain fast scan (the r8 scalar tuple path measures ~294k rows/s
    through read() on this fixture; the vectorized path ~650k)."""
    from cassandra_sstable_to_protocolbuf_spark.sources.sstable_native import (
        SSTableNativeReader, SSTableStreamWriter)

    n_parts, per = 50, 4000  # 200k LIVE cells across wide partitions
    keys = sorted((b"key-%04d" % i for i in range(n_parts)),
                  key=lambda k: hashlib.md5(k).digest())
    names = [b"c%05d" % c for c in range(per)] * 1
    w = SSTableStreamWriter(str(tmp_path / "wide"), 1)
    codes = np.zeros(per, np.int8)
    ts = np.arange(per, dtype=np.int64)
    counts = np.array([per], np.int64)
    vals = [b"value-%05d" % c for c in range(per)]
    for k in keys:
        w.write_partitions_block([k], [None], counts, names, codes, ts,
                                 vals, None)
    w.close()
    rdr = SSTableNativeReader(str(tmp_path), 10 ** 6,
                              name_range=(b"c00100", b"c03900"))
    splits = rdr.partitions()
    best = 0.0
    n = 0
    for _ in range(2):
        t0 = time.monotonic()
        n = 0
        for s in splits:
            for b in rdr.read(s):
                n += b.num_rows
        best = max(best, n / (time.monotonic() - t0))
    assert n == n_parts * 3800  # the slice's exact selectivity
    with capsys.disabled():
        print(f"\n[capacity] sliced decode {best:,.0f} rows/s "
              f"(floor 150k)")
    assert best >= 150_000, f"sliced decode regressed: {best:,.0f} rows/s"


def test_production_knob_optimize_lifecycle(spark, tmp_path, capsys,
                                            monkeypatch):
    """VERDICT r9 #5: the PRODUCTION configuration priced end-to-end,
    not only per-task -- a full transactional OPTIMIZE at
    target_output_bytes = 64 MiB with the split-phase executor AND the
    segmented manifest in the path. Three overlapping ~40 MiB
    generations (120 MiB logical) plan one SHRINK bin;
    MAX_OUTPUT_SHARDS is pinned to 1 so the bin executes as the real
    K-interval split-phase plan at the production target (the
    arithmetic is scale-free -- at 100 TB the same code path runs with
    MAX=4096). Floor at ~1/4 of the idle end-to-end measurement
    (~6.6 MB/s idle 2026-08-16 -- the line prices the WHOLE lifecycle:
    plan, two interval Spark jobs, LWW shuffle, two 64 MiB-target
    writer tasks, manifest CAS, txn commit) so machine load cannot
    flake it."""
    import glob
    import os

    from pyspark.sql import functions as F

    from cassandra_sstable_to_protocolbuf_spark import compaction as CP
    from cassandra_sstable_to_protocolbuf_spark import manifest, txnlog
    from cassandra_sstable_to_protocolbuf_spark.sources.sstable_native import (
        SSTableStreamWriter, read_native_cells)

    d = str(tmp_path / "prod")
    os.makedirs(d)
    n_parts, cells_pp, vlen = 40_000, 4, 200
    keys = sorted((b"key-%07d" % i for i in range(n_parts)),
                  key=lambda k: hashlib.md5(k).digest())
    names = [b"c%d" % (c % cells_pp) for c in range(n_parts * cells_pp)]
    codes = np.zeros(n_parts * cells_pp, np.int8)
    counts = np.full(n_parts, cells_pp, np.int64)
    dels = [None] * n_parts
    for gen in (1, 2, 3):
        vals = [b"g%d-value-%07d-%d" % (gen, i // cells_pp, i % cells_pp)
                + b"x" * vlen for i in range(n_parts * cells_pp)]
        ts = np.full(n_parts * cells_pp, gen * 1000, np.int64)
        w = SSTableStreamWriter(d, 1, cf=f"gen{gen}")
        pp = 4096
        for s in range(0, n_parts, pp):
            e = min(s + pp, n_parts)
            w.write_partitions_block(
                keys[s:e], dels[s:e], counts[s:e],
                names[s * cells_pp:e * cells_pp],
                codes[s * cells_pp:e * cells_pp],
                ts[s * cells_pp:e * cells_pp],
                vals[s * cells_pp:e * cells_pp], None)
        w.close()

    target = 64 << 20
    files = CP.input_data_files(d)
    total = CP.logical_data_bytes(files)
    assert len(files) == 3 and total > 100 << 20
    assert CP.derive_n_outputs(total, target) < 3, "SHRINK must fire"
    monkeypatch.setattr(CP, "MAX_OUTPUT_SHARDS", 1)
    k = CP.derive_n_intervals(total, target)
    assert k > 1, "split-phase must engage at the production knob"
    manifest.init(d)

    cells = read_native_cells(spark, d)
    pre = cells.filter("cell_kind = 'LIVE'").groupBy("key", "name").agg(
        F.max("writeTime").alias("wt")).agg(
        F.count("*").alias("n"), F.sum("wt").alias("s")).collect()[0]

    start = time.monotonic()
    results = CP.optimize(spark, d, target_output_bytes=target,
                          stale_claim_grace_s=0.0)
    elapsed = time.monotonic() - start
    mbps = total / (1 << 20) / elapsed

    assert len(results) == 1 and "error" not in results[0]
    outputs = results[0]["outputs"]
    assert len(outputs) == CP.derive_n_outputs(
        -(-total // k), target) * k or len(outputs) >= k
    for m in outputs:
        assert CP.logical_data_bytes([m.path]) <= 2 * target
    # manifest stayed consistent through the split-phase transaction
    walked = sorted(os.path.relpath(p, d) for p in glob.glob(
        os.path.join(d, "**", "*-Data.db"), recursive=True))
    assert manifest.read_entries(d) == walked
    assert txnlog.read_logs(d) == []
    # LWW content invariant (count + timestamp-sum certificate)
    post_cells = read_native_cells(spark, d)
    post = post_cells.filter("cell_kind = 'LIVE'").groupBy(
        "key", "name").agg(F.max("writeTime").alias("wt")).agg(
        F.count("*").alias("n"), F.sum("wt").alias("s")).collect()[0]
    assert (post.n, post.s) == (pre.n, pre.s)

    with capsys.disabled():
        print(f"\n[capacity] 64 MiB-knob OPTIMIZE lifecycle: "
              f"{total / (1 << 20):.0f} MiB in {elapsed:.1f}s = "
              f"{mbps:.1f} MB/s end-to-end, K={k} intervals, "
              f"{len(outputs)} outputs (floor 1.6)")
    assert mbps >= 1.6, \
        f"production-knob lifecycle regressed: {mbps:.1f} MB/s"


def test_wide_partition_decode_throughput_floor(tmp_path, capsys):
    """Single-wide-partition decode (the point-lookup shape): one
    200k-cell partition through rdr.read. Round-10 deferred this at
    300-400k rows/s on the scalar band; the vectorized path with
    clamped Overrun growth measures ~880k idle -- floor at ~1/3."""
    from cassandra_sstable_to_protocolbuf_spark.sources.sstable_native import (
        SSTableNativeReader, SSTableStreamWriter)

    n_cells = 200_000
    w = SSTableStreamWriter(str(tmp_path), 1, compression=None)
    names = [b"col%07d" % c for c in range(n_cells)]
    vals = [b"value-%07d" % c for c in range(n_cells)]
    w.write_partitions_block([b"wide-key"], [None],
                             np.array([n_cells], np.int64), names,
                             np.zeros(n_cells, np.int8),
                             np.arange(n_cells, dtype=np.int64), vals,
                             None)
    w.close()
    rdr = SSTableNativeReader(str(tmp_path), None)
    splits = rdr.partitions()
    best = 0.0
    for _ in range(2):
        t0 = time.monotonic()
        n = sum(b.num_rows for s in splits for b in rdr.read(s))
        best = max(best, n / (time.monotonic() - t0))
    with capsys.disabled():
        print(f"\n[capacity] wide-partition decode {best:,.0f} rows/s "
              f"(floor 300k)")
    assert best >= 300_000, f"wide decode regressed: {best:,.0f} rows/s"


def test_old_format_decode_throughput_floor(tmp_path, capsys):
    """Pre-'ja' (ic) framing through the vectorized walker: the scalar
    tuple path measured ~300k rows/s; the old_format decode_partitions
    path measures ~900k idle -- floor at ~1/3, 2x the scalar-era rate
    is the raised bar."""
    from tests.test_cellcodec import _write_ic_fixture

    from cassandra_sstable_to_protocolbuf_spark.sources.sstable_native import (
        SSTableNativeReader)

    _write_ic_fixture(str(tmp_path), n_parts=8000, cells_per=25)
    rdr = SSTableNativeReader(str(tmp_path), None)
    splits = rdr.partitions()
    best = 0.0
    for _ in range(2):
        t0 = time.monotonic()
        n = sum(b.num_rows for s in splits for b in rdr.read(s))
        best = max(best, n / (time.monotonic() - t0))
    with capsys.disabled():
        print(f"\n[capacity] old-format (ic) decode {best:,.0f} rows/s "
              f"(floor 300k)")
    assert best >= 300_000, f"ic decode regressed: {best:,.0f} rows/s"
