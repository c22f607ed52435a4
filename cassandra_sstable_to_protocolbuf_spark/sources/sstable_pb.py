"""Delimited-protobuf + zstd sink and source -- operators K1/K2 and their
inverse (SURVEY.md §2).

The reference serializes each Row with writeDelimitedTo into a
zstd-compressed stream, one output file per input SSTable, named
`<src>.proto.zst` (reference: Runner.java:114-156). Here:

* write_rows_pb -- distributed sink: groupBy(sstable_id).applyInPandas,
  one task per sstable, each task streaming rows through the wire codec
  into a zstd stream (pyarrow CompressedOutputStream -- standard zstd
  frames, readable by any zstd tool). Returns the per-file metrics the
  reference prints (M1: sizes, row counts, wall seconds,
  Runner.java:88-96) as a DataFrame instead of stdout.
* SSTablePbDataSource -- a Spark 4 Python DataSource ("sstable_pb"
  format) reading those files back: one input partition per file
  (file-parallel scan), lazy streaming decode, nested Row schema.

Scale notes: the sink shuffles once on sstable_id (the one-output-per-
input contract forces task==file); each task is O(rows of its file) with
O(1) memory (streaming encode, nothing buffered). Task-retry safety via
write-to-temp + atomic rename. The source enumerates files driver-side
but decodes entirely in executors; a 100 TB run gets one task per file
-- matching the reference's unit of work, but parallel across the
cluster instead of sequential on one thread (Runner.java:56-59).
"""

from __future__ import annotations

import os
import time
import uuid
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    ArrayType, BinaryType, LongType, StringType, StructField, StructType,
)

from cassandra_sstable_to_protocolbuf_spark import protowire

FILE_SUFFIX = ".proto.zst"

WRITE_METRICS_SCHEMA = StructType([
    StructField("sstable_id", StringType(), False),
    StructField("path", StringType(), False),
    StructField("n_rows", LongType(), False),
    StructField("n_cells", LongType(), False),
    StructField("raw_bytes", LongType(), False),
    StructField("compressed_bytes", LongType(), False),
    StructField("seconds", StringType(), False),
])

ROW_SCHEMA = StructType([
    StructField("sstable_id", StringType(), False),
    StructField("key", BinaryType(), False),
    StructField("columns", ArrayType(StructType([
        StructField("name", BinaryType(), False),
        StructField("value", BinaryType(), True),
        StructField("writeTime", LongType(), False),
    ])), False),
])


def write_rows_pb(nested_rows: DataFrame, out_dir: str) -> DataFrame:
    """Write nested rows (sstable_id, key, columns) as one
    `<sstable_id>-Data.db.proto.zst` per sstable_id under out_dir.

    Rows are written in ascending key-byte order within each file (the
    reference preserves token order; byte order is this model's analog).
    Returns the metrics DataFrame (collected by the caller as needed).
    """
    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)

    def write_group(pdf):
        import pandas as pd

        t0 = time.perf_counter()
        sstable_id = pdf["sstable_id"].iloc[0]
        pdf = pdf.sort_values("key", kind="mergesort")
        final_path = os.path.join(out_dir, f"{sstable_id}-Data.db{FILE_SUFFIX}")
        tmp_path = final_path + f".tmp-{uuid.uuid4().hex}"
        n_rows = 0
        n_cells = 0
        raw = 0
        # compression=None: pa auto-detects .zst extensions and would
        # double-wrap the explicit codec layer
        with pa.output_stream(tmp_path, compression=None) as raw_out, \
                pa.CompressedOutputStream(raw_out, "zstd") as zout:
            for key, columns in zip(pdf["key"], pdf["columns"]):
                cols = [(c["name"], c["value"], c["writeTime"]) for c in columns]
                body = protowire.encode_row(bytes(key), cols)
                framed = protowire.frame_row(body)
                zout.write(framed)
                n_rows += 1
                n_cells += len(cols)
                raw += len(framed)
        os.replace(tmp_path, final_path)
        return pd.DataFrame([{
            "sstable_id": sstable_id,
            "path": final_path,
            "n_rows": n_rows,
            "n_cells": n_cells,
            "raw_bytes": raw,
            "compressed_bytes": os.path.getsize(final_path),
            "seconds": f"{time.perf_counter() - t0:.3f}",
        }])

    return (nested_rows.repartition("sstable_id")
            .groupBy("sstable_id")
            .applyInPandas(write_group, WRITE_METRICS_SCHEMA))


class _PbFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class SSTablePbReader(DataSourceReader):
    def __init__(self, path: str):
        self.path = path

    def partitions(self):
        import glob

        if os.path.isdir(self.path):
            # recursive, like the native source's -Data.db discovery
            # (Runner.java walks; streaming sinks nest batch=N subdirs)
            files = sorted(glob.glob(
                os.path.join(self.path, f"**/*{FILE_SUFFIX}"), recursive=True))
        elif os.path.exists(self.path):
            files = [self.path]
        else:
            # fail at PLANNING like the native source, not with an
            # opaque open() error inside an executor task
            files = []
        if not files:
            raise FileNotFoundError(f"no {FILE_SUFFIX} files under {self.path}")
        return [_PbFilePartition(p) for p in files]

    ARROW_BATCH_ROWS = 1024

    def read(self, partition) -> Iterator:
        """Yield pyarrow.RecordBatch chunks (Arrow columnar handoff to the
        JVM) rather than per-row pickled tuples."""
        import pyarrow as pa

        fname = os.path.basename(partition.path)
        sstable_id = fname[:-len(FILE_SUFFIX)].removesuffix("-Data.db")
        col_type = pa.list_(pa.struct([
            ("name", pa.binary()), ("value", pa.binary()),
            ("writeTime", pa.int64())]))
        arrow_schema = pa.schema([
            ("sstable_id", pa.string()), ("key", pa.binary()),
            ("columns", col_type)])

        def flush(keys: list, cols: list):
            return pa.RecordBatch.from_arrays(
                [pa.array([sstable_id] * len(keys), pa.string()),
                 pa.array(keys, pa.binary()),
                 pa.array(cols, col_type)],
                schema=arrow_schema)

        keys: list = []
        cols: list = []
        with pa.input_stream(partition.path, compression=None) as raw, \
                pa.CompressedInputStream(raw, "zstd") as zin:
            for body in protowire.iter_delimited(zin):
                key, row_cols = protowire.decode_row(body)
                keys.append(key)
                cols.append([{"name": n, "value": v, "writeTime": wt}
                             for (n, v, wt) in row_cols])
                if len(keys) >= self.ARROW_BATCH_ROWS:
                    yield flush(keys, cols)
                    keys, cols = [], []
        if keys:
            yield flush(keys, cols)


class SSTablePbDataSource(DataSource):
    """spark.read.format("sstable_pb").load(dir_or_file)"""

    @classmethod
    def name(cls) -> str:
        return "sstable_pb"

    def schema(self):
        return ROW_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        path = self.options.get("path")
        if not path:
            raise ValueError("sstable_pb requires a load path")
        return SSTablePbReader(path)


def register(spark) -> None:
    spark.dataSource.register(SSTablePbDataSource)


def read_rows_pb(spark, path: str) -> DataFrame:
    register(spark)
    return spark.read.format("sstable_pb").load(path)


def nested_rows_from_cells(cells_binary: DataFrame) -> DataFrame:
    """Live-filter + project + group binary cells into the sink shape.

    Composes the full reference pipeline: F1/F2 filters, P1 projection,
    P2 grouping (cell-name order), producing ROW_SCHEMA.

    Parity quirk preserved: a live partition whose cells are ALL filtered
    out still emits a Row with an empty columns list -- the reference
    always emits the key once the partition survives the tombstone check
    (reference: service/SSTableReader.java:87-109). Hence: filter F1
    (partition tombstone) only, then aggregate with a conditional
    collect_list (nulls are skipped) so non-LIVE cells vanish per-cell
    while the group survives.
    """
    from cassandra_sstable_to_protocolbuf_spark.operators.tombstones import (
        live_cell_predicate, partition_live_predicate)

    live_struct = F.when(live_cell_predicate(),
                         F.struct("name", "value", "writeTime"))
    return (
        cells_binary.filter(partition_live_predicate())
        .groupBy("sstable_id", "key")
        .agg(F.sort_array(F.collect_list(live_struct)).alias("columns"))
    )
