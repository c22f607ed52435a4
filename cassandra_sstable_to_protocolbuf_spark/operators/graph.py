"""Graph analytics over DataFrames: deterministic fixed-point PageRank.

PageRank's float contributions sum in engine-dependent order, so a naive
port can never be hash-gated. This implementation runs the whole
recurrence in FIXED-POINT BIGINT arithmetic (rank scaled by 1e12,
damping as integer percent, contributions via integer division), making
every iteration bit-identical on any engine -- the same trick the
repo's anomaly/histogram ops use for exact moments.

Scale shape: one shuffle join (ranks x edges on src) plus one hash
aggregation (sum by dst) per iteration; degrees are computed once. No
driver-side state, no windows -- the textbook Pregel superstep expressed
as relational algebra. Iterations are unrolled into the logical plan
(the catalog query runs 3), matching the unrolled-CTE DuckDB oracle;
long runs would localCheckpoint per round like the label-propagation
dedup operator does."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BASE = 1_000_000_000_000  # 1.0 in fixed-point
DAMP_PCT = 85             # damping 0.85 as an integer percent


def pagerank_fixedpoint(edges: DataFrame, n_iter: int = 3) -> DataFrame:
    """edges: (src, dst) directed pairs, deduplicated. Returns one row
    per node with its fixed-point rank after n_iter supersteps
    (rank_fp / 1e12 is the conventional value; emitted as BIGINT so the
    gate compares exact integers). Dangling mass is dropped, matching
    the oracle (symmetric graphs -- this repo's co-purchase use -- have
    none)."""
    nodes = (edges.select(F.col("src").alias("node"))
             .unionAll(edges.select(F.col("dst").alias("node")))
             .distinct())
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = nodes.withColumn("rank_fp", F.lit(BASE).cast("long"))
    for _ in range(n_iter):
        # integer DIV end-to-end: double division would round-to-nearest
        # where DuckDB's // floors, and the gate compares exact integers
        contrib = (edges.join(ranks, edges.src == ranks.node)
                   .join(deg, "src")
                   .select(F.col("dst").alias("node"),
                           F.expr("rank_fp DIV deg").alias("c")))
        recv = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (nodes.join(recv, "node", "left")
                 .select("node",
                         (F.lit((100 - DAMP_PCT) * BASE // 100)
                          + F.expr(f"({DAMP_PCT} * coalesce(s, 0L)) DIV 100"))
                         .cast("long").alias("rank_fp")))
    return ranks
