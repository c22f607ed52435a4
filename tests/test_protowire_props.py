"""Property tests: arbitrary rows survive the wire codec + framing."""

from __future__ import annotations

import io

from hypothesis import given, settings
from hypothesis import strategies as st

from cassandra_sstable_to_protocolbuf_spark import protowire as pw

cell = st.tuples(
    st.binary(min_size=0, max_size=64),
    st.binary(min_size=0, max_size=256),
    # full Java long range: negative timestamps must survive the
    # fixed64 round-trip as two's complement
    st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1),
)
row = st.tuples(st.binary(min_size=0, max_size=64), st.lists(cell, max_size=8))


@settings(max_examples=200, deadline=None)
@given(row)
def test_row_roundtrip(r):
    key, cells = r
    body = pw.encode_row(key, cells)
    k2, c2 = pw.decode_row(body)
    assert k2 == key
    assert c2 == [(n, v, t) for n, v, t in cells]


@settings(max_examples=50, deadline=None)
@given(st.lists(row, max_size=10))
def test_stream_roundtrip(rows):
    buf = io.BytesIO()
    for key, cells in rows:
        buf.write(pw.frame_row(pw.encode_row(key, cells)))
    buf.seek(0)
    decoded = [pw.decode_row(b) for b in pw.iter_delimited(buf)]
    assert decoded == [(k, list(cs)) for k, cs in rows]


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=2 ** 64 - 1))
def test_varint_any_u64(n):
    v, pos = pw.decode_varint(pw.encode_varint(n), 0)
    assert v == n


@settings(max_examples=100, deadline=None)
@given(st.lists(row, max_size=12))
def test_block_encoder_byte_identical(rows):
    """encode_rows_block == per-row frame_row(encode_row(...)) for any
    shape hypothesis can draw: empty keys, empty names/values, zero and
    negative writeTimes, zero-column rows, varint-size boundaries."""
    import numpy as np

    ref = b"".join(pw.frame_row(pw.encode_row(k, cs)) for k, cs in rows)
    keys = [k for k, _ in rows]
    counts = np.array([len(cs) for _, cs in rows], dtype=np.int64)
    names = [n for _, cs in rows for (n, _v, _t) in cs]
    vals = [(v if v is not None else b"")
            for _, cs in rows for (_n, v, _t) in cs]
    wts = np.array([t for _, cs in rows for (_n, _v, t) in cs],
                   dtype=np.int64)
    assert pw.encode_rows_block(keys, counts, names, vals, wts) == ref
