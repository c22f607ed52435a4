"""Grayscale baseline JPEG codec: DCT inverse property, spec-derived
golden bytes, Huffman/bit-io properties incl. the 0xFF stuffing rule,
roundtrip fidelity bound, marker-walk validation, and scope-boundary
errors. The cross-engine gate is mm_jpeg_decode (exact geometry +
pinned fidelity)."""

from __future__ import annotations

import numpy as np
import pytest

from cassandra_sstable_to_protocolbuf_spark.operators import multimodal as M


def test_dct_matrix_is_orthonormal():
    c = M._dct_c()
    assert np.allclose(c @ c.T, np.eye(8), atol=1e-12)
    blocks = np.arange(128, dtype=np.float64).reshape(2, 8, 8) - 60
    fwd = np.einsum("ux,nxy,vy->nuv", c, blocks, c)
    back = np.einsum("ux,nuv,vy->nxy", c, fwd, c)
    assert np.allclose(back, blocks, atol=1e-9)


def test_canonical_code_assignment_is_prefix_free():
    for bits, vals in ((M._JPEG_DC_BITS, M._JPEG_DC_VALS),
                       (M._JPEG_AC_BITS, M._JPEG_AC_VALS)):
        codes = M._jpeg_canonical_codes(bits, vals)
        assert len(codes) == len(vals)
        as_strings = sorted(format(c, f"0{n}b") for c, n in codes.values())
        for a, b in zip(as_strings, as_strings[1:]):
            assert not b.startswith(a), f"{a} is a prefix of {b}"


def test_bit_writer_stuffs_ff_and_reader_unstuffs():
    w = M._JpegBitWriter()
    w.put(0xFF, 8)
    w.put(0xAB, 8)
    out = w.flush()
    assert out == b"\xff\x00\xab"  # stuffed on write
    r = M._JpegBitReader(b"\xff\xab")  # reader gets UNSTUFFED bytes
    assert r.read(8) == 0xFF and r.read(8) == 0xAB
    # reads past the end pad with 1-bits like the encoder's flush
    assert r.read(4) == 0xF


def test_magnitude_extend_roundtrip():
    for v in list(range(-1024, 1025)) + [-32767, 32767]:
        s, bits = M._magnitude(v)
        assert M._extend(bits, s) == v


def test_flat_quant_golden_scan_byte():
    """An all-128 8x8 block level-shifts to zero: scan = DC category 0
    ('00' in the spec's standard luminance DC table) + EOB ('1010'),
    padded with 1s -> the single byte 0x2B. A spec-derived golden, not a
    self-consistency check."""
    blob = M.encode_jpeg(bytes([128] * 64), 8)
    sos_at = blob.find(b"\xff\xda")
    scan = blob[sos_at + 2 + 8:-2]  # SOS header is 8 bytes incl. length
    assert scan == b"\x2b"


def test_roundtrip_fidelity_bound():
    rng = np.random.default_rng(42)
    for w, n in [(8, 64), (13, 999), (9, 1), (20, 4096), (8, 0), (14, 37)]:
        pix = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        width, height, dec = M.decode_jpeg(M.encode_jpeg(pix, w))
        assert width == w and height == max(1, -(-n // w))
        assert len(dec) == width * height
        if n:
            err = np.max(np.abs(dec[:n].astype(int)
                                - np.frombuffer(pix, np.uint8).astype(int)))
            assert err <= 2, f"w={w} n={n}: err {err}"


def test_decoder_parses_tables_from_file_not_assumptions():
    """Corrupting one DHT byte must change decoding behavior (error or
    different pixels) -- proof the decoder reads the file's tables."""
    pix = bytes(range(256)) * 2
    blob = bytearray(M.encode_jpeg(pix, 16))
    dht_at = blob.find(b"\xff\xc4")
    # clobber a count in the DC bits table: the canonical assignment shifts
    blob[dht_at + 5 + 2] ^= 0x01
    with pytest.raises(ValueError):
        M.decode_jpeg(bytes(blob))


def test_scope_boundaries_raise_loudly():
    good = M.encode_jpeg(b"x" * 100, 10)
    with pytest.raises(ValueError, match="SOI"):
        M.decode_jpeg(b"\x00" + good)
    prog = bytearray(good)
    prog[prog.find(b"\xff\xc0") + 1] = 0xC2  # pretend progressive
    with pytest.raises(ValueError, match="baseline"):
        M.decode_jpeg(bytes(prog))
    color = bytearray(good)
    sof = color.find(b"\xff\xc0")
    color[sof + 9] = 3  # ncomp byte inside SOF0
    with pytest.raises(ValueError, match="color"):
        M.decode_jpeg(bytes(color))


def test_entropy_stream_never_contains_bare_markers():
    """Every 0xFF in the scan must be stuffed: decode validates, and the
    encoder's output must satisfy it even for pixel data engineered to
    emit many 0xFF entropy bytes."""
    rng = np.random.default_rng(3)
    blob = M.encode_jpeg(bytes(rng.integers(0, 256, 2048, dtype=np.uint8)),
                         16)
    sos_at = blob.find(b"\xff\xda")
    scan = blob[sos_at + 10:-2]
    i = 0
    while i < len(scan):
        if scan[i] == 0xFF:
            assert scan[i + 1] == 0x00, f"bare marker at {i}"
            i += 2
        else:
            i += 1


def test_seam_and_attach_shapes(spark):
    """The Spark plumbing: attach -> decode seam -> report, end to end on
    a tiny frame; geometry exact, fidelity boolean true."""
    from cassandra_sstable_to_protocolbuf_spark.operators.multimodal import (
        attach_jpeg_payloads, jpeg_roundtrip_report)

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (15, "x" * 300)],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           jpeg_roundtrip_report(attach_jpeg_payloads(docs)).collect()}
    assert all(r["faithful"] for r in out.values())
    assert out[1]["width"] == 1 % 13 + 8
    assert out[2]["height"] == 1 and out[2]["n_pixels"] == 2 % 13 + 8
    assert out[15]["height"] == -(-300 // (15 % 13 + 8))


def test_roundtrip_fidelity_property():
    """Hypothesis sweep: ANY pixel content at ANY width must round-trip
    within the fidelity bound with exact geometry -- including contents
    engineered toward entropy-stream edge cases (all-0xFF, alternating
    extremes, single pixels)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=0, max_size=600),
           st.integers(min_value=1, max_value=40))
    def roundtrip(pix, w):
        width, height, dec = M.decode_jpeg(M.encode_jpeg(pix, w))
        assert width == w and height == max(1, -(-len(pix) // w))
        if pix:
            orig = np.frombuffer(pix, np.uint8).astype(int)
            assert np.max(np.abs(dec[:len(pix)].astype(int) - orig)) <= 2

    roundtrip()
    # adversarial fixed cases the random sweep may miss
    for pix in (b"\xff" * 512, bytes([0, 255] * 256), b"\x80" * 777):
        _, _, dec = M.decode_jpeg(M.encode_jpeg(pix, 24))
        orig = np.frombuffer(pix, np.uint8).astype(int)
        assert np.max(np.abs(dec[:len(pix)].astype(int) - orig)) <= 2


def test_decoder_honors_sos_table_selectors_and_fill_bytes():
    """A spec-valid file may place its Huffman tables in ANY slot (the
    SOS component spec names them) and pad between segments with 0xFF
    fill bytes (T.81 B.1.1.2); the decoder must honor both."""
    pixels = bytes((i * 37) % 256 for i in range(23 * 11))
    blob = M.encode_jpeg(pixels, 23)
    want = M.decode_jpeg(blob)

    out = bytearray(blob)
    # DHT bodies: DC class byte 0x00 -> slot 1, AC class byte 0x10 -> slot 1
    dht = blob.find(b"\xff\xc4")
    assert dht > 0 and out[dht + 4] == 0x00
    out[dht + 4] = 0x01
    ac_class_at = dht + 4 + 1 + 16 + len(M._JPEG_DC_VALS)
    assert out[ac_class_at] == 0x10
    out[ac_class_at] = 0x11
    # SOS component spec: select Td=1, Ta=1
    sos = blob.find(b"\xff\xda")
    assert out[sos + 6] == 0x00
    out[sos + 6] = 0x11
    # fill bytes before the SOF0 marker
    sof = bytes(out).find(b"\xff\xc0")
    out[sof:sof] = b"\xff\xff"

    got = M.decode_jpeg(bytes(out))
    assert got[0] == want[0] and got[1] == want[1]
    assert bytes(got[2]) == bytes(want[2])

    # wrong selector (slot 0 now empty) must raise, not mis-decode
    bad = bytearray(out)
    sos2 = bytes(bad).find(b"\xff\xda")
    bad[sos2 + 6] = 0x00
    with pytest.raises(ValueError, match="missing"):
        M.decode_jpeg(bytes(bad))


def test_decoder_honors_sof_quant_selector():
    """Quant table in slot 2, named by SOF0's Tq byte."""
    pixels = bytes(range(64))
    blob = M.encode_jpeg(pixels, 8)
    out = bytearray(blob)
    dqt = blob.find(b"\xff\xdb")
    assert out[dqt + 4] == 0x00
    out[dqt + 4] = 0x02  # Pq=0, Tq=2
    sof = blob.find(b"\xff\xc0")
    assert out[sof + 12] == 0x00  # component's Tq selector
    out[sof + 12] = 0x02
    want = M.decode_jpeg(blob)
    got = M.decode_jpeg(bytes(out))
    assert bytes(got[2]) == bytes(want[2])
