"""Size-derived compaction output sharding: derive_n_outputs ladder,
generic 256-way token_shard arithmetic, metadata-only logical byte
accounting, and shard-count growth with input size (VERDICT r5 #2)."""

from __future__ import annotations

import pytest

from cassandra_sstable_to_protocolbuf_spark import compaction as CP
from cassandra_sstable_to_protocolbuf_spark.sources import sstable_native as N


def test_derive_ladder_and_bounds():
    t = CP.DEFAULT_TARGET_OUTPUT_BYTES
    assert CP.derive_n_outputs(0) == 1
    assert CP.derive_n_outputs(t) == 1          # boundary: exactly fits
    assert CP.derive_n_outputs(t + 1) == 2
    assert CP.derive_n_outputs(2 * t) == 2
    assert CP.derive_n_outputs(16 * t) == 16
    assert CP.derive_n_outputs(10_000 * t) == CP.MAX_OUTPUT_SHARDS
    # monotone, power-of-two, divides 256
    prev = 1
    for total in range(0, 40 * t, t // 3):
        n = CP.derive_n_outputs(total)
        assert n >= prev and CP.MAX_OUTPUT_SHARDS % n == 0
        assert n & (n - 1) == 0
        prev = n
    # explicit target override scales the count
    assert CP.derive_n_outputs(1 << 20, target_bytes=1 << 10) == 256
    with pytest.raises(ValueError):
        CP.derive_n_outputs(1, target_bytes=0)


def test_oversize_clause_terminates_at_shard_cap():
    """OVERSIZE must be SUPPRESSED past the 256-shard granularity
    ceiling: a bin over 2 * target * MAX_OUTPUT_SHARDS re-shards into
    256 outputs still averaging > 2x target, so firing would rewrite it
    every round and until_stable would never converge (ADVICE r8 #2)."""
    t = 1000  # small synthetic target: bin_is_executable is metadata-only
    cap = 2 * t * CP.MAX_OUTPUT_SHARDS

    def task(n_files, total_bytes):
        return {"files": ["f%d" % i for i in range(n_files)],
                "bytes": total_bytes}

    # ordinary OVERSIZE still fires (2 files averaging > 2x target)
    assert CP.bin_is_executable(task(2, 5 * t), target_bytes=t)
    # at exactly the ceiling it still fires (outputs average <= 2x target)
    assert CP.bin_is_executable(task(2, cap), target_bytes=t)
    # past the ceiling with few files: suppressed -- a capped re-shard
    # cannot bring per-shard size under 2x target
    assert not CP.bin_is_executable(task(2, cap + 1), target_bytes=t)
    # SHRINK is unaffected: enough input files still merge down
    assert CP.bin_is_executable(task(400, cap + 1), target_bytes=t)
    # fixed point: the outputs of ANY executable merge never re-trigger
    # on their own (the until_stable termination argument, checked
    # exhaustively over a grid of bin shapes)
    for n in (2, 3, 8, 64, 300):
        for total in (n * t, 3 * n * t, cap, cap + 1, 4 * cap):
            if not CP.bin_is_executable(task(n, total), target_bytes=t):
                continue
            n_out = CP.derive_n_outputs(total, target_bytes=t)
            # model the worst case: all bytes survive, split evenly,
            # and every output lands in one future bin
            assert not CP.bin_is_executable(task(n_out, total),
                                            target_bytes=t), \
                f"bin ({n} files, {total}B) re-fires on its own outputs"


def test_token_shard_generic_arithmetic(spark):
    """shard = (top two md5 hex digits as int) * n DIV 256, for every
    divisor of 256 -- and for n dividing 16 it matches the historical
    single-digit boundaries."""
    import hashlib

    from pyspark.sql import functions as F

    keys = [b"k%03d" % i for i in range(64)]
    df = spark.createDataFrame([(k,) for k in keys], "key binary")
    for n in (1, 2, 4, 16, 32, 256):
        got = {bytes(r.key): r.s for r in
               df.select("key", CP.token_shard(F.col("key"), n)
                         .alias("s")).collect()}
        for k in keys:
            idx = int(hashlib.md5(k).hexdigest()[:2], 16)
            assert got[k] == idx * n // 256, (k, n)
    with pytest.raises(ValueError):
        CP.token_shard(F.col("key"), 3)
    with pytest.raises(ValueError):
        CP.token_shard(F.col("key"), 512)


def test_logical_bytes_is_metadata_only_and_exact(tmp_path):
    """Plain file: physical size. lz4 file: CompressionInfo.dataLength.
    Both equal the format's size algebra over the cells written."""
    parts = [{"key": b"k%02d" % i,
              "cells": [{"name": b"col", "kind": "LIVE", "timestamp": 1,
                         "value": b"v" * (i + 1)}]} for i in range(30)]
    algebra = sum(  # 16+keylen partition overhead, 15+name+value per cell
        16 + 3 + 15 + 3 + (i + 1) for i in range(30))
    plain = N.write_sstable(str(tmp_path / "p"), 1, parts)
    lz = N.write_sstable(str(tmp_path / "z"), 1, parts, compression="lz4")
    assert CP.logical_data_bytes([plain]) == algebra
    assert CP.logical_data_bytes([lz]) == algebra
    assert CP.logical_data_bytes([plain, lz]) == 2 * algebra


def test_compact_shard_count_grows_with_input(spark, tmp_path):
    """The shard count must come from the size algebra: doubling the
    input bytes doubles the derived output count (tiny target so the
    test stays fast)."""
    import glob
    import os

    def mk(dirname, n_keys):
        parts = [{"key": b"key-%05d" % i,
                  "cells": [{"name": b"c", "kind": "LIVE", "timestamp": 1,
                             "value": b"v" * 40}]} for i in range(n_keys)]
        d = str(tmp_path / dirname)
        N.write_sstable(d, 1, parts)
        return d

    small = mk("small", 60)     # ~4.5 KB logical
    big = mk("big", 120)        # ~9 KB logical
    target = 2048

    n_small = CP.derive_n_outputs(CP.logical_data_bytes(
        CP.input_data_files(small)), target)
    n_big = CP.derive_n_outputs(CP.logical_data_bytes(
        CP.input_data_files(big)), target)
    assert n_big == 2 * n_small >= 4

    out_small = str(tmp_path / "out_small")
    out_big = str(tmp_path / "out_big")
    CP.compact(spark, small, out_small, target_output_bytes=target).collect()
    CP.compact(spark, big, out_big, target_output_bytes=target).collect()
    files_small = glob.glob(os.path.join(out_small, "*-Data.db"))
    files_big = glob.glob(os.path.join(out_big, "*-Data.db"))
    assert len(files_small) == n_small
    assert len(files_big) == n_big
    # every written shard carries the derived count's naming
    names = {os.path.basename(f) for f in files_big}
    assert names == {f"ks-compacted-{s}-ka-1-Data.db" for s in range(n_big)}
