"""Corpus-construction operators for training-data pipelines: deterministic
hash sampling, greedy sequence packing, and token heavy hitters.

The reference (stliu/cassandra-sstable-to-protocolbuf) stops at SSTable ->
protobuf conversion; these are the selection/packing steps a large-scale
LLM data pipeline runs downstream of that export, built as narrow
DataFrame plans so they compose with any source in this repo.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Deterministic LCG-style hash whose arithmetic stays inside int64 in any
# engine: (key mod P) * A + C mod 2^31.  P < 2^21 keeps the product under
# 2^52, so the math is exact in BIGINT and even in a double mantissa --
# any SQL oracle reproduces it bit-for-bit.
HASH_P, HASH_A, HASH_C, HASH_M = 1_000_003, 1_103_515_245, 12_345, 2_147_483_648


def bucket_hash(key: Column, buckets: int = 10_000) -> Column:
    """Deterministic per-key bucket in [0, buckets).  The sampling decision
    is a pure function of the key, so re-runs, task retries, and
    incremental backfills keep/drop the SAME rows -- unlike df.sample()/
    sampleBy(), whose per-partition-attempt RNG is not retry-stable."""
    return ((key % HASH_P) * HASH_A + HASH_C) % HASH_M % buckets


def hash_sample(df: DataFrame, rates_bp: dict[str, int],
                stratum_col: str = "lang", key_col: str = "doc_id",
                default_bp: int = 10_000) -> DataFrame:
    """Stratified deterministic sampling: keep a row when its key-hash
    bucket (basis points, 0..10000) falls below its stratum's rate.
    Down-samples over-represented strata / keeps low-resource ones whole.

    Scale design: a narrow map + filter -- no shuffle, no RNG state, and
    the predicate is a scan-residual filter, so at 100 TB this is pure
    read bandwidth.  The emitted `sample_bp` column makes the decision
    auditable downstream.
    """
    rate = F.lit(default_bp)
    for stratum, bp in sorted(rates_bp.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(bp)).otherwise(rate)
    return (df.withColumn("sample_bp", bucket_hash(F.col(key_col)))
            .filter(F.col("sample_bp") < rate))


def pack_sequences(df: DataFrame, tokens_col: str, context_len: int = 512,
                   part_cols: tuple[str, ...] = ("lang",),
                   order_col: str = "doc_id", shard_size: int = 1024,
                   max_seqs_per_shard: int = 1_000_000) -> DataFrame:
    """Greedy contiguous sequence packing: documents in `order_col` order
    fill fixed `context_len`-token windows; a document belongs to the
    window where its FIRST token lands (long docs straddle into the next
    window -- streaming-packer semantics, zero padding waste).

    Adds `shard`, `seq_id` (window id, UNIQUE WITHIN the part_cols
    partition -- packing restarts per partition value, so a consumer
    assembling sequences must group by (part_cols..., seq_id), which
    the emitted columns make possible), `seq_offset`
    (token offset of the doc inside its window).

    Scale design: the running sum is windowed by (part_cols..., shard)
    with shard = order_col DIV shard_size, so every window partition holds
    at most `shard_size` docs -- there is NO global single-partition sort
    at any corpus size.  Packing restarts at shard boundaries (bounded
    per-shard waste, the standard distributed-packing tradeoff).
    seq_id = shard * max_seqs_per_shard + window-index keeps ids unique
    without any cross-shard coordination.
    """
    w = (Window.partitionBy(*part_cols, "shard").orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    prev = (F.sum(tokens_col).over(w) - F.col(tokens_col)).alias("prev")
    return (df.withColumn("shard", F.expr(f"{order_col} DIV {shard_size}"))
            .withColumn("_prev", prev)
            .withColumn("seq_id",
                        F.col("shard") * max_seqs_per_shard
                        + F.expr(f"_prev DIV {context_len}"))
            .withColumn("seq_offset", F.col("_prev") % context_len)
            .drop("_prev"))


def heavy_hitters(df: DataFrame, items: Column, k: int = 20) -> DataFrame:
    """Top-k items by document frequency (rows containing the item at
    least once).  Returns (token, doc_freq, rank), rank 1-based, ties
    broken by token text for a deterministic boundary.

    Scale design: explode(array_distinct(...)) -> hash agg with map-side
    partial aggregation is the only wide op; orderBy().limit(k) compiles
    to TakeOrderedAndProject (per-partition top-k, then a k-row merge on
    the driver-side exchange -- never a full sort).  The rank window runs
    over the already-limited k rows, so its single partition is k rows.
    """
    counts = (df.select(F.explode(F.array_distinct(items)).alias("token"))
              .groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
              .orderBy(F.desc("doc_freq"), F.asc("token")).limit(k))
    w = Window.orderBy(F.desc("doc_freq"), F.asc("token"))
    return counts.withColumn("rank", F.row_number().over(w).cast("long"))


def contamination(train: DataFrame, bench: DataFrame, n: int = 4,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Benchmark decontamination: find training documents sharing any
    n-token shingle with an evaluation/benchmark document. Returns one
    row per contaminated training doc: (doc_id, n_shingle_hits,
    n_bench_docs) -- enough to drop or down-weight it and to audit WHICH
    benchmark leaked.

    Scale design: the benchmark side is tiny by nature (eval suites are
    thousands of docs; the corpus is 100 TB), so its distinct shingle set
    is broadcast -- the training corpus is scanned ONCE with a map-side
    hash join and never shuffled.  The post-join per-doc agg is keyed by
    doc_id over hit rows only (a vanishing fraction of the corpus).
    """
    # one shingle pipeline for the whole engine: dedup.doc_shingles
    # carries the HOF-explode optimizer guard and the narrow-input
    # widen() that a private copy here silently dropped
    from cassandra_sstable_to_protocolbuf_spark.operators.dedup import doc_shingles

    bench_sh = (doc_shingles(bench, text_col, id_col, n)
                .withColumnRenamed("doc_id", "bench_id"))
    train_sh = doc_shingles(train, text_col, id_col, n)
    hits = train_sh.join(F.broadcast(bench_sh), "shingle")
    return (hits.groupBy("doc_id")
            .agg(F.count_distinct("shingle").alias("n_shingle_hits"),
                 F.count_distinct("bench_id").alias("n_bench_docs")))


def domain_mix(df: DataFrame, shares_bp: dict[str, int],
               stratum_col: str = "source", key_col: str = "doc_id") -> DataFrame:
    """Resample the corpus toward a target domain mixture: for each
    stratum with a target share (basis points of the ORIGINAL corpus
    size), the keep rate is derated so the stratum contributes at most
    its share -- keep_bp = min(10000, total * share_bp / stratum_count),
    exact integer arithmetic.  Strata without a target are kept whole
    (rate 10000); no stratum is ever upsampled.  Row selection is the
    same retry-stable key hash as hash_sample.

    Scale design: stratum counts are a tiny hash agg (one row per
    domain); the single-partition window that totals them runs over
    #domains rows, and the rates re-join the corpus via a broadcast hash
    join -- the 100 TB side is scanned once and never shuffled.
    """
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_cnt"))
    total = F.sum("_cnt").over(Window.partitionBy())
    share = F.lit(None).cast("long")
    for stratum, bp in sorted(shares_bp.items()):
        share = F.when(F.col(stratum_col) == stratum, F.lit(bp)).otherwise(share)
    # integer DIV keeps the rate math exact in both Spark and any SQL
    # oracle (long / long would go through a double here)
    rates = (counts.select(stratum_col, F.col("_cnt"),
                           share.alias("_share"), total.alias("_total"))
             .selectExpr(
                 stratum_col,
                 "CAST(CASE WHEN _share IS NULL THEN 10000 "
                 "ELSE LEAST(10000, (_total * _share) DIV _cnt) END AS BIGINT)"
                 " AS keep_bp"))
    return (df.join(F.broadcast(rates), stratum_col)
            .withColumn("sample_bp", bucket_hash(F.col(key_col)))
            .filter(F.col("sample_bp") < F.col("keep_bp")))


def weighted_priority_sample(df: DataFrame, weight_col: str, k: int,
                             key_col: str = "doc_id") -> DataFrame:
    """Deterministic weight-proportional top-k sampling (priority
    sampling, Duffield-Lund-Thorup shape): each row gets priority
    ~ weight / u for a per-key pseudo-uniform u, and the k highest
    priorities are kept -- heavier rows proportionally likelier, yet the
    choice is a pure function of the keys, so retries and backfills
    select identical rows (df.sample's RNG cannot promise this).

    All-integer arithmetic: u = LCG(key) in [0, 2^31), priority =
    (weight << 40) DIV (u + 1) -- exact and identical across engines,
    so the operator is fully hash-gatable. weight * 2^40 must stay
    within int64: weights up to ~8M are safe.

    Scale shape: a narrow map then ORDER BY ... LIMIT k -- Spark
    executes TakeOrdered (per-partition partial top-k, only k rows per
    task reach the driver-side merge), not a global sort."""
    u = (F.col(key_col) % HASH_P * HASH_A + HASH_C) % HASH_M
    # integer DIV, not float /: float quotients round where DIV
    # truncates, and the two engines must rank identically
    out = (df.withColumn("_u", u)
           .withColumn("priority", F.expr(
               f"(CAST({weight_col} AS BIGINT) * 1099511627776) "
               f"DIV (_u + 1)"))
           .drop("_u"))
    return out.orderBy(F.col("priority").desc(), F.col(key_col)).limit(k)


TOKEN_SHARD_DOCS = 256  # docs per binary shard


def export_token_shards(docs: DataFrame, out_dir: str,
                        shard_docs: int = TOKEN_SHARD_DOCS,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """GPT-style memmap training-shard export: every document's tokens
    become stable 32-bit ids (md5-prefix hash -- the stand-in for a real
    BPE vocabulary, swapped at one expression), documents are grouped
    into fixed-size shards by id range, and each shard lands as TWO
    little-endian uint32 files: `shard-N.bin` (the concatenated token
    stream, docs in id order) and `shard-N.idx` (per-doc token lengths,
    same order) -- the layout a memory-mapped training dataloader
    consumes (Megatron/nanoGPT `.bin`/`.idx` shape).

    Returns a per-shard metrics DataFrame. The md5 columns hash the ids
    READ BACK from the written files, so a consumer of the metrics has
    end-to-end proof the on-disk bytes decode to the intended stream
    (same write-then-verify discipline as the protobuf sink).

    Scale shape: one narrow tokenize+hash map, ONE shuffle (groupBy
    shard), one writer task per shard with bounded memory (shard_docs
    documents); files commit via temp+rename so a retried task never
    leaves a torn shard.
    """
    from cassandra_sstable_to_protocolbuf_spark.session import widen
    from cassandra_sstable_to_protocolbuf_spark.operators.text import tokens

    ids = widen(docs).select(
        F.col(id_col).alias("doc_id"),
        F.transform(
            tokens(F.col(text_col)),
            lambda w: F.conv(F.substring(F.md5(w), 1, 8), 16, 10)
            .cast("long")).alias("ids"))
    sharded = ids.withColumn(
        "shard", F.floor(F.col("doc_id") / shard_docs).cast("long"))

    schema = ("shard long, n_docs long, n_tokens long, n_bytes long, "
              "ids_md5 string, lens_md5 string")

    def write_shard(key, pdf):
        import hashlib
        import os

        import numpy as np
        import pandas as pd

        shard = int(key[0])
        pdf = pdf.sort_values("doc_id")
        streams = [np.asarray(list(x), dtype=np.uint32) for x in pdf["ids"]]
        flat = (np.concatenate(streams) if streams
                else np.array([], dtype=np.uint32))
        lens = np.asarray([len(s) for s in streams], dtype=np.uint32)
        bin_path = os.path.join(out_dir, f"shard-{shard:05d}.bin")
        idx_path = os.path.join(out_dir, f"shard-{shard:05d}.idx")
        for path, arr in ((bin_path, flat), (idx_path, lens)):
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(arr.astype("<u4").tobytes())
            os.replace(tmp, path)
        back = np.fromfile(bin_path, dtype="<u4")
        lens_back = np.fromfile(idx_path, dtype="<u4")
        ids_md5 = hashlib.md5(
            ",".join(map(str, back.tolist())).encode()).hexdigest()
        lens_md5 = hashlib.md5(
            ",".join(map(str, lens_back.tolist())).encode()).hexdigest()
        return pd.DataFrame([{
            "shard": shard, "n_docs": len(streams),
            "n_tokens": int(lens.sum()), "n_bytes": int(flat.nbytes),
            "ids_md5": ids_md5, "lens_md5": lens_md5}])

    return sharded.groupBy("shard").applyInPandas(write_shard, schema)
