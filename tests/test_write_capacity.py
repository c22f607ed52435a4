"""Write-path capacity floors (VERDICT r5 #3): the pure-Python encode
loops ARE the write path's 100 TB number, so a silent regression there
must fail loudly. Direct single-task micro-benches (no Spark -- the
encode loop is per-task CPU, exactly what one executor core does), with
floors at ~1/4 of idle-measured throughput so machine load cannot flake
them. Idle 2026-08-15 measurements (200k cells, one task):
binary sink ~194k cells/s plain / ~228k cells/s lz4, pb+zstd sink
~462k cells/s. Wall-time complement: bench.py --check-bands."""

from __future__ import annotations

import hashlib
import io
import time


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


def test_binary_sink_throughput_floor(tmp_path, capsys):
    best = max(_bench_binary(tmp_path, None) for _ in range(2))
    best_lz = max(_bench_binary(tmp_path, "lz4") for _ in range(2))
    with capsys.disabled():
        print(f"\n[capacity] binary sink {best:,.0f} cells/s plain, "
              f"{best_lz:,.0f} cells/s lz4 (floor 50k)")
    assert best >= 50_000, f"binary encode regressed: {best:,.0f} cells/s"
    assert best_lz >= 50_000, f"lz4 encode regressed: {best_lz:,.0f} cells/s"


def test_pb_sink_throughput_floor(capsys):
    best = max(_bench_pb() for _ in range(2))
    with capsys.disabled():
        print(f"\n[capacity] pb+zstd sink {best:,.0f} cells/s (floor 110k)")
    assert best >= 110_000, f"pb encode regressed: {best:,.0f} cells/s"
