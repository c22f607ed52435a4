"""Anti-entropy repair: Merkle-tree diff of two replicas of an LWW cell
table (the algorithm behind Cassandra's `nodetool repair`, re-expressed
as two DataFrame aggregations).

Reference parity: the reference ships whole sstables and never compares
replicas (Runner.java is a one-node exporter); this is the beyond-reference
operator a fleet actually runs to find out-of-sync rows. Cost model at
100 TB: each replica folds its reconciled state into a fixed-size digest
tree with ONE map-side-partial aggregation (XOR is commutative and
associative), ships kilobytes, and only the differing leaves are ever
drilled row-by-row."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

N_LEAVES = 64


def _h60(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative BIGINT -- identical to
    DuckDB's CAST(('0x' || substring(md5(x),1,15)) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _row_digest(side: str) -> Column:
    # digest covers (key, name, value, writeTime) -- NOT the origin
    # sstable_id, which legitimately differs between replicas that hold
    # the same row in differently-named files; sstable_id stays inside
    # the winner struct only as the LWW tie-break
    payload = F.concat_ws(
        "|", "key", "name",
        F.col(f"{side}.value"), F.col(f"{side}.writeTime").cast("string"))
    return (F.when(F.col(side).isNull(), F.lit(0).cast("long"))
            .otherwise(_h60(payload)))


def reconciled_state(cells: DataFrame, stale_pred: Column,
                     synced_pred: Column | None = None) -> DataFrame:
    """LWW-reconcile two replica views of one cell scan: side `a` sees
    only cells matching stale_pred (the replica that missed writes),
    side `b` sees cells matching synced_pred (default: everything --
    the lagged-subset model where B is a superset of A). One hash
    aggregation, two conditional max-structs; per-row digests and the
    Merkle leaf id come out of the same projection."""
    winner = F.struct("writeTime", "sstable_id", "value")
    b_w = winner if synced_pred is None else F.when(synced_pred, winner)
    st = (cells.groupBy("key", "name")
          .agg(F.max(F.when(stale_pred, winner)).alias("a"),
               F.max(b_w).alias("b")))
    return st.select(
        "key", "name", "a", "b",
        F.pmod(_h60(F.col("key")), F.lit(N_LEAVES)).alias("bucket"),
        _row_digest("a").alias("ha"), _row_digest("b").alias("hb"))


def merkle_tree(state: DataFrame) -> DataFrame:
    """The fixed-size digest tree a replica ships: one XOR-fold per leaf."""
    return (state.groupBy("bucket")
            .agg(F.expr("bit_xor(ha)").alias("da"),
                 F.expr("bit_xor(hb)").alias("db")))


def repair_diff(cells: DataFrame, stale_pred: Column,
                synced_pred: Column | None = None) -> DataFrame:
    """Merkle phase + drill phase; returns one row per out-of-sync
    (key, name) restricted to differing leaves. The reconciled state is
    pinned because the tree fold and the drill both consume it."""
    from cassandra_sstable_to_protocolbuf_spark.session import pin

    state = pin(reconciled_state(cells, stale_pred, synced_pred))
    diff_leaves = (merkle_tree(state)
                   .filter(~F.col("da").eqNullSafe(F.col("db"))))
    payload = lambda s: F.struct(F.col(f"{s}.value"),  # noqa: E731
                                 F.col(f"{s}.writeTime"))
    return (state.join(broadcast(diff_leaves.select("bucket")), "bucket")
            .filter(~payload("a").eqNullSafe(payload("b")))
            .select("bucket", "key", "name",
                    F.when(F.col("a").isNull(), "missing_in_stale")
                    .when(F.col("b").isNull(), "missing_in_synced")
                    .when(F.col("a.value") != F.col("b.value"),
                          "divergent_value")
                    .otherwise("stale_write_time").alias("status"),
                    F.col("a.writeTime").alias("stale_write_time_us"),
                    F.col("b.writeTime").alias("synced_write_time_us"),
                    F.col("b.value").alias("synced_value")))
