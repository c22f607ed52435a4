"""Multimodal column handling: opaque binary payloads + typed metadata,
processed with Arrow-batched mapInPandas.

Real image/audio codecs are not available in this environment, so the
decode step is STUBBED: payloads with a real media type raise
NotImplementedError at the exact seam where PIL / torchaudio / ffmpeg
would plug in, while the deterministic 'application/x-fake' codec keeps
the whole Spark-side pipeline -- schema, batching, partitioning, UDF
signatures -- real and testable.

Scale notes: payloads never pass through Python row-at-a-time; they move
as Arrow binary arrays into pandas batches (mapInPandas), the decode is
per-batch vectorizable, and nothing aggregates -- a pure narrow map that
scales linearly with input splits at 100 TB. Feature outputs are fixed
width (float arrays), parquet-friendly for downstream training jobs.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

FAKE_MEDIA_TYPE = "application/x-fake"

MEDIA_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("media_type", StringType(), False),
    StructField("payload", BinaryType(), False),
    StructField("width", IntegerType(), False),
    StructField("height", IntegerType(), False),
])

FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("mean_byte", DoubleType(), False),
    StructField("histogram", ArrayType(DoubleType()), False),
    StructField("hist_counts", ArrayType(LongType()), False),
])

N_HIST_BINS = 16


def attach_payloads(docs: DataFrame) -> DataFrame:
    """Derive a deterministic binary 'media' column from documents:
    payload = utf-8 bytes of the text, metadata from doc_id."""
    return docs.select(
        "doc_id",
        F.lit(FAKE_MEDIA_TYPE).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        (F.col("doc_id") % 64 + 16).cast("int").alias("width"),
        (F.col("doc_id") % 48 + 16).cast("int").alias("height"),
    )


def _decode_payload(media_type: str, payload: bytes):
    """The codec seam. Real types plug in real decoders here."""
    import numpy as np

    if media_type == FAKE_MEDIA_TYPE:
        return np.frombuffer(payload, dtype=np.uint8)
    raise NotImplementedError(
        f"no codec for {media_type} in this environment; install the "
        f"image/audio libraries and extend _decode_payload")


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: byte stats + 16-bin histogram.

    Batches arrive as pandas DataFrames over Arrow; each batch is decoded
    and reduced without per-row Python loops over pixels.
    """

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = []
            for doc_id, mt, payload in zip(pdf["doc_id"], pdf["media_type"],
                                           pdf["payload"]):
                arr = _decode_payload(mt, bytes(payload))
                hist = np.histogram(arr, bins=N_HIST_BINS, range=(0, 256))[0]
                total = max(len(arr), 1)
                out.append({
                    "doc_id": doc_id,
                    "n_bytes": len(arr),
                    # integer byte sum / count: exact in double, so the
                    # value is engine-reproducible (no summation-order
                    # float drift)
                    "mean_byte": float(int(arr.sum())) / total,
                    "histogram": (hist / total).tolist(),
                    "hist_counts": [int(c) for c in hist],
                })
            yield pd.DataFrame(out)

    from cassandra_sstable_to_protocolbuf_spark.session import widen

    return widen(media).mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every: int = 64) -> DataFrame:
    """'Video' frame sampling shape: keep every `every`-th byte-frame of
    the payload, exploded one row per sampled frame with its index."""
    frames = F.when(
        F.length("payload") > 0,
        F.transform(
            F.sequence(F.lit(0),
                       ((F.length("payload") - 1) / every).cast("int")),
            lambda i: F.struct(
                (i * every).alias("frame_idx"),
                F.substring(F.col("payload"), i * every + 1, 1).alias("frame"),
            ),
        ),
    ).otherwise(F.array().cast(
        "array<struct<frame_idx:int,frame:binary>>"))
    # an EMPTY payload has zero frames; the old greatest(...,0) clamp
    # instead produced one phantom frame of empty bytes
    return (media.select("doc_id", frames.alias("fs"))
            .select("doc_id", F.explode("fs").alias("f"))
            .select("doc_id", F.col("f.frame_idx").alias("frame_idx"),
                    F.col("f.frame").alias("frame")))


AUDIO_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("n_samples", LongType(), False),
    StructField("peak", LongType(), False),
    StructField("sum_sq", LongType(), False),
    StructField("n_zero_cross", LongType(), False),
    StructField("rms", DoubleType(), False),
])


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Waveform features through the same codec seam, treating each
    payload byte as an unsigned 8-bit PCM sample centered at 128:
    sample count, peak amplitude, energy (sum of squares -- exact
    integer, so engine-reproducible), zero crossings of the 128
    midline, and RMS (sqrt of an exact integer ratio: IEEE-identical
    in any engine).

    Same scale shape as extract_features: Arrow-batched mapInPandas,
    vectorized numpy per batch, no shuffle -- linear at 100 TB. A real
    deployment swaps _decode_payload for ffmpeg/torchaudio decode; every
    downstream line is unchanged.
    """

    def batches(it: Iterator) -> Iterator:
        import math

        import numpy as np
        import pandas as pd

        for pdf in it:
            out = []
            for doc_id, mt, payload in zip(pdf["doc_id"], pdf["media_type"],
                                           pdf["payload"]):
                arr = _decode_payload(mt, bytes(payload)).astype(np.int64) - 128
                n = len(arr)
                sum_sq = int((arr * arr).sum())
                neg = arr < 0
                out.append({
                    "doc_id": doc_id,
                    "n_samples": n,
                    "peak": int(np.abs(arr).max()) if n else 0,
                    "sum_sq": sum_sq,
                    "n_zero_cross": int((neg[1:] != neg[:-1]).sum()) if n > 1 else 0,
                    "rms": math.sqrt(float(sum_sq) / n) if n else 0.0,
                })
            yield pd.DataFrame(out)

    from cassandra_sstable_to_protocolbuf_spark.session import widen

    return widen(media).mapInPandas(batches, AUDIO_SCHEMA)


RESIZE_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("in_len", LongType(), False),
    StructField("out_len", LongType(), False),
    StructField("resized_sum", LongType(), False),
    StructField("resized_csv", StringType(), False),
])

RESIZE_TARGET = 64


def resize_payloads(media: DataFrame, target: int = RESIZE_TARGET) -> DataFrame:
    """'Image resize' shape through the codec seam: nearest-neighbor
    resample of the decoded byte array to a fixed `target` length
    (index j of the output reads source index floor(j*n/target) -- the
    1-D form of NN thumbnail resize; a real deployment swaps in
    PIL.Image.resize at _decode_payload and keeps every downstream
    line). Output is gate-friendly: exact sum + CSV of the resized
    bytes, reproducible byte-for-byte in SQL.

    Same scale shape as the other multimodal ops: Arrow-batched
    mapInPandas, numpy fancy-indexing per batch, narrow map, no shuffle.
    """

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = []
            for doc_id, mt, payload in zip(pdf["doc_id"], pdf["media_type"],
                                           pdf["payload"]):
                arr = _decode_payload(mt, bytes(payload))
                n = len(arr)
                if n:
                    idx = (np.arange(target) * n) // target
                    r = arr[idx].astype(np.int64)
                    row = {"doc_id": doc_id, "in_len": n, "out_len": target,
                           "resized_sum": int(r.sum()),
                           "resized_csv": ",".join(str(int(x)) for x in r)}
                else:
                    row = {"doc_id": doc_id, "in_len": 0, "out_len": 0,
                           "resized_sum": 0, "resized_csv": ""}
                out.append(row)
            yield pd.DataFrame(out)

    from cassandra_sstable_to_protocolbuf_spark.session import widen

    return widen(media).mapInPandas(batches, RESIZE_SCHEMA)
