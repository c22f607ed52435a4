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
    with pytest.raises(NotImplementedError, match="image/png"):
        _decode_payload("image/png", b"\x89PNG")


def test_unknown_media_type_fails_in_pipeline(spark):
    media = attach_payloads(_docs(spark).limit(1)).withColumn(
        "media_type", F.lit("image/png"))
    with pytest.raises(Exception, match="NotImplementedError|no codec"):
        extract_features(media).collect()


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
