"""CLI driver: the reference's end-to-end contract through the real
command-line surface (subprocess, not imports)."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from cassandra_sstable_to_protocolbuf_spark.sources import sstable_native as N

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args, timeout=300):
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m", "cassandra_sstable_to_protocolbuf_spark", *args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd="/tmp")


def test_usage_on_bad_args():
    r = _run("convert", "only-one-arg")
    assert r.returncode != 0
    assert "usage:" in r.stderr


def test_missing_input_path():
    r = _run("convert", "/nonexistent/path", "/tmp/out")
    assert r.returncode != 0
    assert "does not exist" in r.stderr


def test_convert_end_to_end(tmp_path):
    src = str(tmp_path / "sst_in")
    N.write_sstable(src, 1, [
        {"key": b"k1", "cells": [
            {"name": b"a", "kind": "LIVE", "timestamp": 10, "value": b"x"},
            {"name": b"b", "kind": "DELETED", "timestamp": 11},
        ]},
        {"key": b"k2", "deletion": (1, 2), "cells": [
            {"name": b"c", "kind": "LIVE", "timestamp": 12, "value": b"dead"}]},
    ])
    out = str(tmp_path / "pb_out")
    r = _run("convert", src, out)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "converted 1 sstable(s)" in r.stdout
    assert "rows=1 cells=1" in r.stdout  # k2 dead; k1 keeps only LIVE cell
    files = os.listdir(out)
    assert files == ["ks-cf-ka-1-Data.db.proto.zst"]

    # decode the output with the wire codec directly
    import pyarrow as pa

    from cassandra_sstable_to_protocolbuf_spark import protowire as pw

    with pa.input_stream(os.path.join(out, files[0]), compression=None) as raw, \
            pa.CompressedInputStream(raw, "zstd") as zin:
        rows = [pw.decode_row(b) for b in pw.iter_delimited(zin)]
    assert rows == [(b"k1", [(b"a", b"x", 10)])]
