"""ISO-BMFF (MP4) container mux/demux: byte-exact sample recovery,
box-tree validation, corrupt-size rejection, and the stsc/stco/stsz
table consistency checks. The cross-engine gate is mm_mp4_demux."""

from __future__ import annotations

import struct

import pytest

from cassandra_sstable_to_protocolbuf_spark.operators import multimodal as M


def test_roundtrip_exact_various_frame_shapes():
    raw = bytes((i * 29 + 3) % 256 for i in range(997))
    for w in (1, 4, 17, 250, 997, 2000):
        frames = [raw[i:i + w] for i in range(0, len(raw), w)]
        width, n, back = M.decode_mp4(M.encode_mp4(frames, width=min(w, 65535)))
        assert n == len(frames)
        assert back == raw


def test_single_sample_and_variable_sizes():
    frames = [b"a", b"bb" * 100, b"", b"c" * 7]
    # empty sample in the middle: stsz carries a zero size
    width, n, back = M.decode_mp4(M.encode_mp4(frames, width=9))
    assert width == 9 and n == 4 and back == b"".join(frames)
    width, n, back = M.decode_mp4(M.encode_mp4([b"only"], width=1))
    assert n == 1 and back == b"only"


def test_box_layout_is_real_bmff():
    blob = M.encode_mp4([b"xyz"], width=3)
    assert blob[4:8] == b"ftyp"
    (ftyp_size,) = struct.unpack_from(">I", blob, 0)
    assert blob[ftyp_size + 4:ftyp_size + 8] == b"mdat"
    # top-level walk sees exactly ftyp, mdat, moov
    tops = [f for f, _s, _e in M._walk_boxes(blob, 0, len(blob))]
    assert tops == [b"ftyp", b"mdat", b"moov"]


def test_corrupt_sizes_and_missing_boxes_raise():
    blob = bytearray(M.encode_mp4([b"hello"], width=5))
    with pytest.raises(ValueError, match="not an MP4"):
        M.decode_mp4(b"\x00\x00\x00\x08free")
    # box size overrunning its container
    struct.pack_into(">I", blob, 0, len(blob) + 50)
    with pytest.raises(ValueError, match="overruns"):
        M.decode_mp4(bytes(blob))
    # truncated file: moov gone
    whole = M.encode_mp4([b"hello"], width=5)
    (ftyp_size,) = struct.unpack_from(">I", whole, 0)
    (mdat_size,) = struct.unpack_from(">I", whole, ftyp_size)
    with pytest.raises(ValueError, match="not an MP4"):
        M.decode_mp4(whole[:ftyp_size + mdat_size])


def test_foreign_codec_fourcc_raises_at_the_seam():
    blob = bytearray(M.encode_mp4([b"hello"], width=5))
    at = bytes(blob).find(b"raw ")
    blob[at:at + 4] = b"avc1"  # pretend H.264
    with pytest.raises(ValueError, match="real video codec"):
        M.decode_mp4(bytes(blob))


def test_inconsistent_sample_tables_raise():
    blob = bytearray(M.encode_mp4([b"ab", b"cd", b"ef"], width=2))
    at = bytes(blob).find(b"stsz")
    # claim 5 samples while the table has 3 -> stsc/stsz disagree
    struct.pack_into(">I", blob, at + 4 + 4 + 4, 5)
    with pytest.raises(ValueError):
        M.decode_mp4(bytes(blob))


def test_seam_returns_sample_bytes(spark):
    from cassandra_sstable_to_protocolbuf_spark.operators.multimodal import (
        attach_mp4_payloads, mp4_demux_report)

    docs = spark.createDataFrame(
        [(3, "container parsing is real"), (20, "")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           mp4_demux_report(attach_mp4_payloads(docs)).collect()}
    t = "container parsing is real".encode()
    w3 = 3 % 17 + 4
    assert out[3]["width"] == w3
    assert out[3]["n_bytes"] == len(t) and out[3]["byte_sum"] == sum(t)
    assert out[3]["n_samples"] == -(-len(t) // w3)
    assert out[20]["n_bytes"] == 1  # empty text muxes one NUL sample


def test_size_zero_final_box_extends_to_eof():
    """ISO-BMFF 4.2: size 0 = box runs to the end of the file; legal
    for the last box. Zeroing the trailing moov's size must demux
    identically."""
    frames = [b"abc", b"defgh", b"i" * 40]
    blob = bytearray(M.encode_mp4(frames, width=3))
    (ftyp_size,) = struct.unpack_from(">I", blob, 0)
    (mdat_size,) = struct.unpack_from(">I", blob, ftyp_size)
    moov_at = ftyp_size + mdat_size
    assert blob[moov_at + 4:moov_at + 8] == b"moov"
    struct.pack_into(">I", blob, moov_at, 0)
    width, n, back = M.decode_mp4(bytes(blob))
    assert width == 3 and n == 3 and back == b"".join(frames)
    # walk yields the to-EOF extent and stops there
    tops = list(M._walk_boxes(bytes(blob), 0, len(blob)))
    assert tops[-1][0] == b"moov" and tops[-1][2] == len(blob)
