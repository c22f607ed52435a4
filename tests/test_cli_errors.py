"""CLI --continue-on-error: corrupt files report and are skipped, good
files still convert (reference's per-file error channel)."""

from __future__ import annotations

import os
import subprocess
import sys

from cassandra_sstable_to_protocolbuf_spark.sources import sstable_native as N

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args, timeout=600):
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m", "cassandra_sstable_to_protocolbuf_spark", *args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd="/tmp")


def test_continue_on_error_skips_corrupt_file(tmp_path):
    src = str(tmp_path / "in")
    good = [{"key": b"k1", "cells": [
        {"name": b"a", "kind": "LIVE", "timestamp": 1, "value": b"v"}]}]
    N.write_sstable(src, 1, good)
    bad_data = N.write_sstable(src, 2, good, compression="lz4")
    raw = bytearray(open(bad_data, "rb").read())
    raw[8] ^= 0xFF  # corrupt the compressed chunk -> checksum failure
    open(bad_data, "wb").write(bytes(raw))

    out = str(tmp_path / "out")
    r = _run("convert", "--continue-on-error", src, out)
    assert r.returncode == 1  # failures reported in exit code
    assert "ERROR converting ks-cf-ka-2-Data.db" in r.stderr
    assert "ks-cf-ka-1: rows=1" in r.stdout  # good file still converted
    assert os.path.exists(os.path.join(out, "ks-cf-ka-1-Data.db.proto.zst"))
    assert not os.path.exists(os.path.join(out, "ks-cf-ka-2-Data.db.proto.zst"))
