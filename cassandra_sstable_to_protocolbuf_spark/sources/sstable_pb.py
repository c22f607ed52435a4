"""Delimited-protobuf + zstd sink and source -- operators K1/K2 and their
inverse (SURVEY.md §2).

The reference serializes each Row with writeDelimitedTo into a
zstd-compressed stream, one output file per input SSTable, named
`<src>.proto.zst` (reference: Runner.java:114-156). Here:

* write_rows_pb -- distributed STREAMING sink: repartition(sstable_id) +
  sortWithinPartitions(sstable_id, key), then iterator-style mapInPandas
  that pushes each Arrow batch through the wire codec into a zstd stream
  (pyarrow CompressedOutputStream -- standard zstd frames, readable by
  any zstd tool), rolling output files when sstable_id changes. Executor
  memory is O(one Arrow batch), never O(file) -- the key-order sort is
  Spark's spillable sort machinery, not an in-task pandas sort. Returns
  the per-file metrics the reference prints (M1: sizes, row counts, wall
  seconds, Runner.java:88-96) as a DataFrame instead of stdout.
* SSTablePbDataSource -- a Spark 4 Python DataSource ("sstable_pb"
  format) reading those files back: one input partition per file
  (file-parallel scan), lazy streaming decode, nested Row schema.

Scale notes: the sink shuffles once on sstable_id (the one-output-per-
input contract forces file==contiguous run within a task); each task
streams with O(batch) memory -- a 50 GB sstable's rows pass through a
bounded window, nothing file-sized is ever resident (pinned by
tests/test_writer_memory.py). Task-retry safety via write-to-temp +
atomic rename. The source enumerates files driver-side
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


def _open_pb_file(out_dir: str, sstable_id: str) -> dict:
    """Open-file state for one sstable's `.proto.zst` output (temp file +
    zstd stream + running metrics); shared by both stream writers."""
    import pyarrow as pa

    final = os.path.join(out_dir, f"{sstable_id}-Data.db{FILE_SUFFIX}")
    tmp = final + f".tmp-{uuid.uuid4().hex}"
    # compression=None: pa auto-detects .zst extensions and would
    # double-wrap the explicit codec layer
    raw_out = pa.output_stream(tmp, compression=None)
    return {"sstable_id": sstable_id, "final": final, "tmp": tmp,
            "raw_out": raw_out,
            "zout": pa.CompressedOutputStream(raw_out, "zstd"),
            "n_rows": 0, "n_cells": 0, "raw": 0,
            "t0": time.perf_counter()}


def _close_pb_file(st: dict) -> dict:
    """Finish + atomically publish one output file; returns its metrics."""
    st["zout"].close()
    st["raw_out"].close()
    os.replace(st["tmp"], st["final"])
    return {
        "sstable_id": st["sstable_id"],
        "path": st["final"],
        "n_rows": st["n_rows"],
        "n_cells": st["n_cells"],
        "raw_bytes": st["raw"],
        "compressed_bytes": os.path.getsize(st["final"]),
        "seconds": f"{time.perf_counter() - st['t0']:.3f}",
    }


def _abort_pb_file(st: dict | None) -> None:
    """Failed-task cleanup: drop the temp file; published files (already
    atomically renamed) are never touched."""
    if st is None:
        return
    for h in ("zout", "raw_out"):
        try:
            st[h].close()
        except OSError:
            pass
    try:
        os.unlink(st["tmp"])
    except FileNotFoundError:
        pass


def _pb_stream_writer(out_dir: str):
    """mapInPandas function factory: consume an ITERATOR of Arrow batches
    already sorted by (sstable_id, key), stream-encode delimited-protobuf
    frames into a zstd stream, and roll to a new `.proto.zst` when
    sstable_id changes. Peak memory is O(one Arrow batch) + the codec's
    fixed compression window -- pinned by tests/test_writer_memory.py --
    regardless of file size; the old applyInPandas shape held one whole
    sstable's row set per task (flagged weak-at-100x in round 4)."""

    def write_stream(batches):
        import pandas as pd

        state = None  # open-file state for the current sstable_id

        def open_file(sstable_id):
            return _open_pb_file(out_dir, sstable_id)

        def close_file(st):
            return pd.DataFrame([_close_pb_file(st)])

        try:
            import numpy as np

            for pdf in batches:
                # tolist() once per column, then VECTORIZED block
                # framing (protowire.encode_rows_block): the per-cell
                # Python work left is dict field extraction; all wire
                # layout (varint sizes, proto3 default omission,
                # scatter) runs as numpy over the whole sstable run --
                # byte-identical to per-row frame_row(encode_row(...))
                sids = pdf["sstable_id"].tolist()
                keys = pdf["key"].tolist()
                columns = pdf["columns"].tolist()
                n = len(sids)
                i = 0
                while i < n:
                    sid = sids[i]
                    j = i
                    while j < n and sids[j] == sid:
                        j += 1
                    if state is None or state["sstable_id"] != sid:
                        if state is not None:
                            yield close_file(state)
                        state = open_file(sid)
                    counts = []
                    names: list = []
                    vals: list = []
                    wts: list = []
                    for cols in columns[i:j]:
                        counts.append(len(cols))
                        for c in cols:
                            names.append(c["name"])
                            v = c["value"]
                            vals.append(v if v is not None else b"")
                            wts.append(c["writeTime"])
                    block = protowire.encode_rows_block(
                        [bytes(k) for k in keys[i:j]],
                        np.array(counts, dtype=np.int64), names, vals,
                        np.array(wts, dtype=np.int64))
                    state["zout"].write(block)
                    state["n_rows"] += j - i
                    state["n_cells"] += len(names)
                    state["raw"] += len(block)
                    i = j
            if state is not None:
                yield close_file(state)
        except BaseException:
            _abort_pb_file(state)
            raise

    return write_stream


def _pb_flat_stream_writer(out_dir: str, max_cells: int | None = None):
    """mapInArrow function factory: consume an ITERATOR of Arrow batches
    of FLAT cells (sstable_id, key, live, name, value, writeTime) already
    sorted by (sstable_id, key, name, value, writeTime), fold adjacent
    (sstable_id, key) runs into delimited-protobuf Rows, and roll to a new
    `.proto.zst` when sstable_id changes -- byte-identical to
    _pb_stream_writer fed by the collect_list grouping, without the extra
    exchange or any per-cell Python objects (run detection, live
    filtering and wire layout are Arrow/numpy kernels over the batch's
    buffers). Dead cells (live=false, payload nulled upstream) are
    dropped per-cell but still mark their (sstable_id, key) run, so a
    live partition whose cells are ALL filtered still emits its Row.

    A (sstable_id, key) run may span batches: the unfinished tail run is
    accumulated as ENCODED column bytes (encode_columns_bufs) and framed
    when the run ends (frame_row_parts), so peak memory is O(one Arrow
    batch) + O(one row's encoded columns) -- the same nested-Row bound as
    the collect_list path, with the same loud failure past `max_cells`
    (operators.projection.MAX_CELLS_PER_ROW)."""
    from cassandra_sstable_to_protocolbuf_spark.operators.projection import (
        MAX_CELLS_PER_ROW)

    if max_cells is None:
        max_cells = MAX_CELLS_PER_ROW

    def write_stream(batches):
        import base64

        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        def bin_parts(arr):
            # (concatenated payload bytes, per-entry lengths) of a Binary
            # array; NULL entries contribute zero length (their offsets
            # do not advance), exactly the b"" the wire codec omits
            off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
                arr.offset: arr.offset + len(arr) + 1]
            buf = arr.buffers()[2]
            data = (np.frombuffer(buf, dtype=np.uint8)
                    if buf is not None else np.empty(0, dtype=np.uint8))
            return (data[int(off[0]):int(off[-1])],
                    (off[1:] - off[:-1]).astype(np.int64))

        def too_wide(key, n):
            return ValueError(
                f"partition {base64.b64encode(key).decode()} has {n} "
                f"surviving cells, over the nested-Row cap of {max_cells};"
                " raise max_cells deliberately or use the flat cell "
                "surface, which streams in O(cell) memory")

        state = None   # open-file state for the current sstable_id
        pend = None    # unfinished tail run: {"key", "chunks", "n"};
        #                always belongs to the currently open file
        done: list[dict] = []   # closed-file metrics not yet yielded

        def roll_to(sid):
            nonlocal state
            if state is None or state["sstable_id"] != sid:
                if state is not None:
                    done.append(_close_pb_file(state))
                state = _open_pb_file(out_dir, sid)

        def flush_pend():
            nonlocal pend
            block = protowire.frame_row_parts(
                pend["key"], b"".join(pend["chunks"]))
            state["zout"].write(block)
            state["n_rows"] += 1
            state["n_cells"] += pend["n"]
            state["raw"] += len(block)
            pend = None

        def metrics_batch(rows):
            return pa.RecordBatch.from_pylist(
                rows, schema=pa.schema([
                    ("sstable_id", pa.string()), ("path", pa.string()),
                    ("n_rows", pa.int64()), ("n_cells", pa.int64()),
                    ("raw_bytes", pa.int64()),
                    ("compressed_bytes", pa.int64()),
                    ("seconds", pa.string())]))

        try:
            for b in batches:
                n = b.num_rows
                if not n:
                    continue
                col = {name: b.column(i)
                       for i, name in enumerate(b.schema.names)}
                sid_arr, key_arr = col["sstable_id"], col["key"]
                name_arr, value_arr = col["name"], col["value"]
                live_np = col["live"].to_numpy(zero_copy_only=False)
                wts_np = col["writeTime"].to_numpy()
                if n > 1:
                    same_sid = np.asarray(pc.equal(
                        sid_arr.slice(1), sid_arr.slice(0, n - 1)))
                    same_key = np.asarray(pc.equal(
                        key_arr.slice(1), key_arr.slice(0, n - 1)))
                    starts = np.flatnonzero(~(same_sid & same_key)) + 1
                    sid_starts = np.flatnonzero(~same_sid) + 1
                else:
                    starts = sid_starts = np.empty(0, dtype=np.int64)
                bnds = np.concatenate(
                    ([0], starts, [n])).astype(np.int64)

                def extend_pend(s, e):
                    mask = live_np[s:e]
                    nn = int(mask.sum())
                    if nn:
                        if pend["n"] + nn > max_cells:
                            raise too_wide(pend["key"], pend["n"] + nn)
                        mask_pa = pa.array(mask)
                        nd, nl = bin_parts(
                            name_arr.slice(s, e - s).filter(mask_pa))
                        vd, vl = bin_parts(
                            value_arr.slice(s, e - s).filter(mask_pa))
                        pend["chunks"].append(protowire.encode_columns_bufs(
                            nd, nl, vd, vl, wts_np[s:e][mask]))
                        pend["n"] += nn

                # does the batch's first run continue the pending row?
                lo_seg = 0
                if pend is not None:
                    if (state["sstable_id"] == sid_arr[0].as_py()
                            and pend["key"] == key_arr[0].as_py()):
                        extend_pend(0, int(bnds[1]))
                        if len(bnds) == 2:
                            continue  # whole batch extends the run
                        flush_pend()
                        lo_seg = 1
                    else:
                        flush_pend()

                # vectorized complete rows, split per sstable run so the
                # file rolls at the right boundaries
                a, z = int(bnds[lo_seg]), int(bnds[-2])
                if a < z:
                    region_starts = bnds[lo_seg:-2]
                    cuts = sid_starts[(sid_starts > a) & (sid_starts < z)]
                    chunk_bnds = np.concatenate(([a], cuts, [z]))
                    for ci in range(len(chunk_bnds) - 1):
                        p, q = int(chunk_bnds[ci]), int(chunk_bnds[ci + 1])
                        roll_to(sid_arr[p].as_py())
                        lo = np.searchsorted(region_starts, p, "left")
                        hi = np.searchsorted(region_starts, q, "left")
                        rstarts = region_starts[lo:hi]
                        mask = live_np[p:q]
                        counts = np.add.reduceat(
                            mask.astype(np.int64), rstarts - p)
                        wide = int(counts.max(initial=0))
                        if wide > max_cells:
                            k = key_arr[
                                int(rstarts[int(np.argmax(counts))])
                            ].as_py()
                            raise too_wide(k, wide)
                        kd, kl = bin_parts(pc.take(
                            key_arr, pa.array(rstarts)))
                        mask_pa = pa.array(mask)
                        nd, nl = bin_parts(
                            name_arr.slice(p, q - p).filter(mask_pa))
                        vd, vl = bin_parts(
                            value_arr.slice(p, q - p).filter(mask_pa))
                        block = protowire.encode_rows_block_bufs(
                            kd, kl, counts, nd, nl, vd, vl,
                            wts_np[p:q][mask])
                        state["zout"].write(block)
                        state["n_rows"] += len(rstarts)
                        state["n_cells"] += int(mask.sum())
                        state["raw"] += len(block)

                # the tail run may continue into the next batch
                t = int(bnds[-2])
                roll_to(sid_arr[t].as_py())
                pend = {"key": key_arr[t].as_py(), "chunks": [], "n": 0}
                extend_pend(t, n)

                if done:
                    yield metrics_batch(done)
                    done.clear()
            if pend is not None:
                flush_pend()
            if state is not None:
                done.append(_close_pb_file(state))
                state = None
            if done:
                yield metrics_batch(done)
        except BaseException:
            _abort_pb_file(state)
            raise

    return write_stream


def write_cells_pb(cells_binary: DataFrame, out_dir: str) -> DataFrame:
    """K1 sink straight from FLAT binary cells: the F1 partition filter,
    ONE exchange (repartition by sstable_id) and a within-partition sort
    by (sstable_id, key, name, value, writeTime); the writer folds
    adjacent (sstable_id, key) runs into Rows. Output is byte-identical
    to write_rows_pb(nested_rows_from_cells(cells), out_dir) -- pinned by
    the golden-equality test -- with one fewer shuffle and no
    collect_list hash aggregate: the nested path shuffled every cell
    twice (groupBy(sstable_id, key), then repartition(sstable_id)).

    Parity quirk preserved: dead cells of live partitions ship as
    (sstable_id, key) markers with NULLed payload (near-zero shuffle
    bytes) so a live partition whose cells are ALL filtered out still
    emits its Row with an empty columns list. The within-partition sort
    mirrors sort_array's struct order (name, value, writeTime; NULLs
    first) so the folded rows carry cells in exactly collect_list +
    sort_array order."""
    from cassandra_sstable_to_protocolbuf_spark.operators.tombstones import (
        live_cell_predicate, partition_live_predicate)

    os.makedirs(out_dir, exist_ok=True)
    live = live_cell_predicate()
    flat = (cells_binary
            .filter(partition_live_predicate())
            .select("sstable_id", "key", live.alias("live"),
                    F.when(live, F.col("name")).alias("name"),
                    F.when(live, F.col("value")).alias("value"),
                    F.when(live, F.col("writeTime")).otherwise(F.lit(0))
                     .cast("long").alias("writeTime")))
    return (flat
            .repartition("sstable_id")
            .sortWithinPartitions("sstable_id", "key", "name", "value",
                                  "writeTime")
            .mapInArrow(_pb_flat_stream_writer(out_dir),
                        WRITE_METRICS_SCHEMA))


def write_rows_pb(nested_rows: DataFrame, out_dir: str) -> DataFrame:
    """Write nested rows (sstable_id, key, columns) as one
    `<sstable_id>-Data.db.proto.zst` per sstable_id under out_dir.

    Rows are written in ascending key-byte order within each file (the
    reference preserves token order; byte order is this model's analog).
    The order comes from Spark's spillable sort, not an in-task pandas
    sort, so the encoder sees a bounded window of rows at a time.
    Returns the metrics DataFrame (collected by the caller as needed).
    """
    os.makedirs(out_dir, exist_ok=True)
    return (nested_rows
            .repartition("sstable_id")
            .sortWithinPartitions("sstable_id", "key")
            .mapInPandas(_pb_stream_writer(out_dir), WRITE_METRICS_SCHEMA))


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

    ARROW_BATCH_ROWS = 4096

    def read(self, partition) -> Iterator:
        """Yield pyarrow.RecordBatch chunks (Arrow columnar handoff to
        the JVM) straight from the vectorized span decoder
        (protowire.iter_decoded_batches): one offset-only walk per
        buffered region, every column built by numpy gathers -- rows
        never exist as Python dicts. Bounded buffering regardless of
        file size; decode semantics identical to decode_row (any field
        order, last-wins, loud unknown tags), pinned by the protowire
        parity sweep."""
        import pyarrow as pa

        fname = os.path.basename(partition.path)
        sstable_id = fname[:-len(FILE_SUFFIX)].removesuffix("-Data.db")
        with pa.input_stream(partition.path, compression=None) as raw, \
                pa.CompressedInputStream(raw, "zstd") as zin:
            yield from protowire.iter_decoded_batches(
                zin, sstable_id, batch_rows=self.ARROW_BATCH_ROWS)


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


_REGISTERED: set = set()


def register(spark) -> None:
    # memoized per session: re-registering re-pickles and re-ships the
    # DataSource class on every call (same rationale as sstable_native)
    key = spark.sparkContext.applicationId
    if key in _REGISTERED:
        return
    spark.dataSource.register(SSTablePbDataSource)
    _REGISTERED.add(key)


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

    from cassandra_sstable_to_protocolbuf_spark.operators.projection import (
        MAX_CELLS_PER_ROW, guard_row_width)

    live_struct = F.when(live_cell_predicate(),
                         F.struct("name", "value", "writeTime"))
    return (
        cells_binary.filter(partition_live_predicate())
        .groupBy("sstable_id", "key")
        .agg(guard_row_width(F.sort_array(F.collect_list(live_struct)),
                             F.col("key"), MAX_CELLS_PER_ROW)
             .alias("columns"))
    )
