"""MPEG-1 Audio Layer I codec (VERDICT r5 #4): filterbank
reconstruction bound on held-out signals, spec frame structure goldens,
generic allocation decode, scope-boundary errors, and the roundtrip
fidelity pin. The cross-engine gate is mm_mp1_decode."""

from __future__ import annotations

import numpy as np
import pytest

from cassandra_sstable_to_protocolbuf_spark.operators import multimodal as M


def _pcm(n, seed=11):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 256, n).astype(np.int16) - 128) << 8


def _encode_padded(pcm):
    return M.encode_mp1(np.concatenate(
        [pcm, np.zeros(M.MP1_DELAY, dtype=np.int16)]))


def test_filterbank_near_pr_on_held_out_signals():
    """The derived window pair must reconstruct signals it was NOT
    designed on: fresh noise and sines across the band, max error
    within the documented ~1.2e-3 bound (x2 slack)."""
    C, D, Mx, N = M._mp1_filterbank()
    t = np.arange(384 * 30, dtype=float)
    signals = [np.random.default_rng(42).uniform(-1, 1, len(t))]
    for f in (0.013, 0.11, 0.27, 0.44, 0.49):
        signals.append(0.95 * np.sin(2 * np.pi * f * t))
    for x in signals:
        y = M._mp1_synthesis_raw(M._mp1_analysis_raw(x, C, Mx), D, N)
        a = x[200:len(x) - M.MP1_DELAY]
        b = y[M.MP1_DELAY + 200:]
        assert np.abs(a - b).max() < 2.5e-3


def test_frame_structure_is_spec_layer1():
    """Golden header/frame-length checks straight from ISO 11172-3:
    sync 0xFFF, ID=1, layer bits 11 (Layer I), 384k/32kHz -> 576-byte
    frames, mono mode."""
    pcm = _pcm(700)
    blob = _encode_padded(pcm)
    n_frames = -(-(700 + M.MP1_DELAY) // 384)
    assert len(blob) == n_frames * 576
    for f in range(n_frames):
        h = blob[f * 576: f * 576 + 4]
        assert h[0] == 0xFF and (h[1] & 0xF0) == 0xF0     # sync
        assert h[1] & 0x08                                 # ID: MPEG-1
        assert (h[1] >> 1) & 0x3 == 0b11                   # Layer I
        assert h[1] & 0x01                                 # no CRC
        assert h[2] >> 4 == 12                             # 384 kbps
        assert (h[2] >> 2) & 0x3 == 2                      # 32 kHz
        assert h[3] >> 6 == 0b11                           # mono


def test_roundtrip_fidelity_and_geometry():
    for n in (1, 50, 384, 1000, 5000):
        pcm = _pcm(n, seed=n)
        rate, n_frames, out = M.decode_mp1(_encode_padded(pcm))
        assert rate == 32000
        assert n_frames == -(-(n + M.MP1_DELAY) // 384)
        assert len(out) == n_frames * 384
        got = out[M.MP1_DELAY:M.MP1_DELAY + n].astype(np.int64)
        err = np.abs(got - pcm.astype(np.int64)).max()
        assert err <= 256, f"n={n}: max err {err}"


def test_silence_uses_zero_allocation():
    """Silent subbands transmit allocation 0 (no scalefactor, no
    samples) -- the variable-allocation path a real decoder must walk."""
    pcm = np.zeros(384, dtype=np.int16)
    blob = M.encode_mp1(pcm)
    bits = np.unpackbits(np.frombuffer(blob[:576], dtype=np.uint8))
    assert not bits[32:32 + 128].any(), "all-zero frame should alloc 0"
    rate, nf, out = M.decode_mp1(blob)
    assert nf == 1 and not out.any()
    # a pure low-frequency tone keeps high subbands at allocation 0
    tone = (2000 * np.sin(2 * np.pi * 0.001 * np.arange(3840))
            ).astype(np.int16)
    blob2 = M.encode_mp1(tone)
    bits2 = np.unpackbits(np.frombuffer(blob2[:576], dtype=np.uint8))
    allocs = np.packbits(bits2[32:160].reshape(32, 4), axis=1)[:, 0] >> 4
    assert allocs[0] > 0 and (allocs == 0).sum() >= 24


def test_scope_boundaries_raise():
    pcm = _pcm(100)
    blob = bytearray(_encode_padded(pcm))
    with pytest.raises(ValueError, match="lost sync"):
        M.decode_mp1(b"\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="truncated"):
        M.decode_mp1(bytes(blob[:100]))
    b2 = bytearray(blob)
    b2[1] = (b2[1] & ~0x06) | 0x02  # layer bits 01 = Layer III
    with pytest.raises(ValueError, match="Layer III"):
        M.decode_mp1(bytes(b2))
    b3 = bytearray(blob)
    b3[1] = (b3[1] & ~0x06) | 0x04  # layer bits 10 = Layer II
    with pytest.raises(ValueError, match="Layer II"):
        M.decode_mp1(bytes(b3))
    b4 = bytearray(blob)
    b4[1] &= ~0x08  # ID=0: MPEG-2
    with pytest.raises(ValueError, match="MPEG-2"):
        M.decode_mp1(bytes(b4))
    b5 = bytearray(blob)
    b5[3] = 0x00  # stereo mode
    with pytest.raises(ValueError, match="single_channel"):
        M.decode_mp1(bytes(b5))


def test_scalefactor_overrun_raises_loudly():
    """A syntactically valid header whose allocation bits promise more
    scalefactors than the frame body holds must raise the explicit
    bounds error, not an opaque numpy shape mismatch (advisor r6)."""
    # 48 kHz / 32 kbps -> n_slots = 8, frame_len = 32 bytes = 256 bits;
    # 32 active subbands need 160 + 192 bits of header+alloc+scalefactors
    hdr = bytes([0xFF, 0xFF, 0x14, 0xC0])  # ID=1, Layer I, no CRC, mono
    frame = hdr + b"\x11" * 16 + b"\x00" * 12  # every subband alloc=1
    with pytest.raises(ValueError, match="scalefactor data runs past"):
        M.decode_mp1(frame)


def test_seam_routes_audio_mpeg():
    """_decode_payload returns the byte-domain samples within the
    fidelity bound, closing the seam for MPEG audio."""
    raw = bytes(range(200)) * 2
    pcm = (np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128) << 8
    blob = _encode_padded(pcm)
    out = M._decode_payload(M.MP1_MEDIA_TYPE, blob)
    got = out[M.MP1_DELAY:M.MP1_DELAY + len(raw)].astype(np.int64)
    want = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
    assert np.abs(got - want).max() <= 1  # 256 int16 units = 1 byte unit


def test_hypothesis_roundtrip_fidelity_sweep():
    """Property sweep: ANY byte payload (any length, adversarial
    values) encodes to structurally valid Layer I frames and decodes
    back within the pinned fidelity bound."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(st.binary(min_size=0, max_size=900))
    def roundtrip(raw: bytes):
        pcm = (np.frombuffer(raw, dtype=np.uint8).astype(np.int16)
               - 128) << 8
        blob = _encode_padded(pcm)
        assert len(blob) % 576 == 0 and blob[0] == 0xFF
        rate, n_frames, out = M.decode_mp1(blob)
        assert rate == 32000
        assert n_frames == max(1, -(-(len(raw) + M.MP1_DELAY) // 384))
        if len(raw):
            got = out[M.MP1_DELAY:M.MP1_DELAY + len(raw)].astype(np.int64)
            assert np.abs(got - pcm.astype(np.int64)).max() <= 256

    roundtrip()
