"""Multimodal binary-column pipeline: deterministic fake codec keeps the
Spark plumbing (Arrow batches, schemas, explode shapes) fully testable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_sstable_to_protocolbuf_spark.operators.multimodal import (
    FAKE_MEDIA_TYPE,
    N_HIST_BINS,
    _decode_payload,
    attach_payloads,
    extract_features,
    sample_frames,
)
from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_feature_extraction_exact(spark):
    media = attach_payloads(_docs(spark))
    feats = extract_features(media)
    row = feats.filter(F.col("doc_id") == 0).collect()[0]
    text = _docs(spark).filter(F.col("doc_id") == 0).collect()[0].text
    raw = text.encode()
    assert row.n_bytes == len(raw)
    assert row.mean_byte == pytest.approx(sum(raw) / len(raw))
    assert len(row.histogram) == N_HIST_BINS
    assert sum(row.histogram) == pytest.approx(1.0)


def test_decode_stub_raises_for_real_media():
    # audio/mpeg became real in r6 (Layer I); a Layer III frame now
    # fails the format parse at the documented scope boundary, and a
    # genuinely unimplemented type still raises NotImplementedError
    with pytest.raises(ValueError, match="Layer III"):
        _decode_payload("audio/mpeg", b"\xff\xfb\x90\x00")
    with pytest.raises(NotImplementedError, match="audio/flac"):
        _decode_payload("audio/flac", b"fLaC")
    with pytest.raises(ValueError, match="truncated JPEG"):
        _decode_payload("image/jpeg", b"\xff\xd8\xff")


def test_unknown_media_type_fails_in_pipeline(spark):
    # the seam is closed at nine formats (r6): a genuinely
    # unimplemented type still raises NotImplementedError, and a
    # mislabeled payload fails its format parse loudly
    media = attach_payloads(_docs(spark).limit(1)).withColumn(
        "media_type", F.lit("audio/flac"))
    with pytest.raises(Exception, match="NotImplementedError|no codec"):
        extract_features(media).collect()
    mislabeled = attach_payloads(_docs(spark).limit(1)).withColumn(
        "media_type", F.lit("image/jpeg"))
    with pytest.raises(Exception, match="not a JPEG|missing SOI"):
        extract_features(mislabeled).collect()
    mp1_mislabel = attach_payloads(_docs(spark).limit(1)).withColumn(
        "media_type", F.lit("audio/mpeg"))
    with pytest.raises(Exception, match="lost sync"):
        extract_features(mp1_mislabel).collect()


def test_frame_sampling_shape(spark):
    media = attach_payloads(_docs(spark).limit(10))
    frames = sample_frames(media, every=64)
    pdf = frames.toPandas()
    assert (pdf.frame_idx % 64 == 0).all()
    assert (pdf.groupby("doc_id").frame_idx.is_monotonic_increasing).all()
    one = pdf[pdf.doc_id == pdf.doc_id.iloc[0]]
    text = _docs(spark).filter(F.col("doc_id") == int(one.doc_id.iloc[0])).collect()[0].text
    assert bytes(one.frame.iloc[0]) == text.encode()[0:1]


def test_resize_nearest_neighbor_exact(spark):
    from cassandra_sstable_to_protocolbuf_spark.operators.multimodal import (
        RESIZE_TARGET, resize_payloads)

    media = attach_payloads(_docs(spark).filter(F.col("doc_id") == 0))
    row = resize_payloads(media).collect()[0]
    raw = _docs(spark).filter(F.col("doc_id") == 0).collect()[0].text.encode()
    expect = [raw[(j * len(raw)) // RESIZE_TARGET] for j in range(RESIZE_TARGET)]
    assert row.in_len == len(raw)
    assert row.out_len == RESIZE_TARGET
    assert row.resized_sum == sum(expect)
    assert row.resized_csv == ",".join(str(v) for v in expect)


# --- real-container codecs (wav / bmp) -----------------------------------

def test_wav_roundtrip_exact():
    """encode_wav produces a genuine RIFF/WAVE container and the decode
    path recovers the exact PCM samples through the stdlib parser."""
    from cassandra_sstable_to_protocolbuf_spark.operators.multimodal import (
        WAV_MEDIA_TYPE, encode_wav)

    samples = bytes(range(256)) * 3
    wav = encode_wav(samples)
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    back = _decode_payload(WAV_MEDIA_TYPE, wav)
    assert bytes(back) == samples


def test_wav_rejects_wrong_pcm_shape():
    import io
    import wave

    from cassandra_sstable_to_protocolbuf_spark.operators.multimodal import (
        WAV_MEDIA_TYPE)

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)  # stereo: unsupported by the 8-bit mono decoder
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x01" * 8)
    with pytest.raises(ValueError, match="mono 8-bit"):
        _decode_payload(WAV_MEDIA_TYPE, buf.getvalue())


@pytest.mark.parametrize("width", [4, 5, 7, 8, 16])
def test_bmp_roundtrip_exact(width):
    """encode_bmp -> decode_bmp recovers geometry and pixels exactly for
    widths that do and don't land on the 4-byte stride boundary (the
    bottom-up unflip + stride strip are where a naive parser breaks)."""
    from cassandra_sstable_to_protocolbuf_spark.operators.multimodal import (
        decode_bmp, encode_bmp)

    pixels = bytes((i * 37) % 256 for i in range(61))
    bmp = encode_bmp(pixels, width)
    assert bmp[:2] == b"BM"
    w, h, px = decode_bmp(bmp)
    assert w == width
    assert h == -(-len(pixels) // width)
    expect = pixels + b"\x00" * (w * h - len(pixels))
    assert bytes(px) == expect


def test_bmp_rejects_unsupported_layouts():
    from cassandra_sstable_to_protocolbuf_spark.operators.multimodal import (
        decode_bmp, encode_bmp)

    with pytest.raises(ValueError, match="BM magic"):
        decode_bmp(b"PNG-not-a-bmp")
    bmp = bytearray(encode_bmp(b"abcdef", 4))
    bmp[28] = 24  # claim 24-bit pixels
    with pytest.raises(ValueError, match="8-bit"):
        decode_bmp(bytes(bmp))


def test_codec_fuzz_controlled_errors_only():
    """Malformed containers must fail with controlled errors (ValueError
    or the stdlib wave.Error), never crash the decoder with index errors
    or misparse into bogus pixel arrays."""
    import wave as wave_mod

    from hypothesis import given, settings
    from hypothesis import strategies as st

    import zlib

    from cassandra_sstable_to_protocolbuf_spark.operators.multimodal import (
        BMP_MEDIA_TYPE, PNG_MEDIA_TYPE, WAV_MEDIA_TYPE)

    @settings(max_examples=200, deadline=None)
    @given(st.binary(min_size=0, max_size=200))
    def fuzz(payload):
        for mt, allowed in ((BMP_MEDIA_TYPE, (ValueError, struct_error)),
                            (PNG_MEDIA_TYPE, (ValueError, struct_error,
                                              zlib.error)),
                            ("image/jpeg", (ValueError, struct_error)),
                            ("video/mp4", (ValueError, struct_error)),
                            (WAV_MEDIA_TYPE, (ValueError, wave_mod.Error,
                                              EOFError))):
            try:
                _decode_payload(mt, payload)
            except allowed:
                pass  # controlled rejection is the contract

    from struct import error as struct_error
    fuzz()


@pytest.mark.parametrize("width", [5, 8, 16])
def test_png_roundtrip_exact(width):
    """encode_png -> decode_png recovers pixels exactly through the zlib
    inflate AND the scanline unfilter (the encoder alternates Paeth and
    None filters so both paths execute)."""
    from cassandra_sstable_to_protocolbuf_spark.operators.multimodal import (
        PNG_MEDIA_TYPE, decode_png, encode_png)

    pixels = bytes((i * 31 + 7) % 256 for i in range(93))
    png = encode_png(pixels, width)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    w, h, px = decode_png(png)
    assert w == width and h == -(-len(pixels) // width)
    expect = pixels + b"\x00" * (w * h - len(pixels))
    assert bytes(px) == expect
    assert bytes(_decode_payload(PNG_MEDIA_TYPE, png)) == expect


def test_png_rejects_corruption_and_unsupported():
    from cassandra_sstable_to_protocolbuf_spark.operators.multimodal import (
        decode_png, encode_png)

    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not-a-png")
    png = bytearray(encode_png(b"abcdefgh", 4))
    png[20] ^= 0xFF  # flip a bit inside IHDR: CRC must catch it
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(png))


def test_gif_lzw_roundtrip_fuzz():
    """Encoder->decoder identity across random data, degenerate runs
    (LZW's best case), widths forcing padding, and inputs long enough
    to overflow the 4096-entry code table (reset path)."""
    import random

    from cassandra_sstable_to_protocolbuf_spark.operators.multimodal import (
        decode_gif, encode_gif)

    rng = random.Random(11)
    for trial in range(40):
        n = rng.randrange(0, 2500)
        data = (bytes(rng.randrange(256) for _ in range(n)) if trial % 3
                else bytes([rng.randrange(4)] * n))
        w = rng.randrange(1, 40)
        dw, dh, px = decode_gif(encode_gif(data, w))
        h = max(1, -(-n // w)) if n else 1
        assert (dw, dh) == (w, h)
        assert bytes(px) == data + b"\x00" * (w * h - n)
    long = b"abcab" * 4000  # > 4096 codes: exercises table reset
    _, _, px = decode_gif(encode_gif(long, 50))
    assert bytes(px[:len(long)]) == long


def test_qoi_roundtrip_fuzz():
    """Full-spec QOI round-trip over adversarial payloads: runs longer
    than 62 (multi-RUN chunks), hash-index hits, small/medium/large
    deltas (DIFF/LUMA/RGB), empty payloads, single columns."""
    import random

    from cassandra_sstable_to_protocolbuf_spark.operators.multimodal import (
        decode_qoi, encode_qoi)

    rng = random.Random(41)
    cases = [b"", b"\x00" * 200, bytes(range(256)),
             b"\x7f\x80\x81" * 40, b"ab" * 100]
    for _ in range(200):
        n = rng.randrange(0, 500)
        cases.append(bytes(rng.choice(
            [rng.randrange(256), rng.randrange(4), 200]) for _ in range(n)))
    for data in cases:
        for w in (1, 5, 13):
            got_w, got_h, px = decode_qoi(encode_qoi(data, w))
            assert got_w == w
            exp = data + b"\x00" * (got_w * got_h - len(data))
            assert bytes(px) == exp
