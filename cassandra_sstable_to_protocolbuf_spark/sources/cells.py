"""Encode relational tables into the reference's wide-row cell model.

The reference engine's one "table" is a Cassandra wide-row layout: a blob
partition key mapping to (name, value, writeTime) cells plus tombstone
metadata (reference: service/SSTableReader.java:24-43, sstable.proto:7-16).
To exercise the full scan->filter->project->group->sink surface against a
DuckDB oracle, we deterministically encode the driver's `lineitem` table
into that model (FIXTURES.md F-4):

* key         = "<l_orderkey>|<l_linenumber>"             (partition key)
* cell name   = source column name, one cell per column   (clustering key)
* value       = canonical string of the column value
* writeTime   = l_orderkey*1_000_000 + l_linenumber*100 + col_index
* sstable_id  = "sst-" + (l_orderkey % 4); rows with l_orderkey % 5 == 0
                are ALSO emitted into replica file "sst-r" with
                writeTime + 7 -- reproducing the reference's cross-file
                duplicate-key behavior (it never merges across SSTables,
                Runner.java:59) and giving the LWW-dedup extension op a
                deterministic fixture.
* cell_kind   = from k = (l_orderkey*31 + l_linenumber*7 + col_index*13) % 20:
                k<14 LIVE, k in {14,15} DELETED, {16,17} EXPIRING,
                {18,19} COUNTER  (drives filter F2,
                service/SSTableReader.java:92-103)
* ttl_expired = (l_orderkey + col_index) % 2 == 0 for EXPIRING else NULL
                (the reference drops EXPIRING cells even when NOT yet
                expired -- service/SSTableReader.java:97-99; kept so tests
                can pin that quirk)
* partition_deletion_live = (l_orderkey*131 + l_linenumber) % 50 != 0
                (drives filter F1, service/SSTableReader.java:83-85)

All arithmetic is integer so the identical formulas run in DuckDB; the
matching oracle SQL lives in plans/cells_sql.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (cell name, canonical string expression over lineitem)
CELL_COLUMNS = [
    ("l_quantity", "CAST(CAST(ROUND(l_quantity * 100) AS BIGINT) AS STRING)"),
    ("l_extendedprice", "CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS STRING)"),
    ("l_discount", "CAST(CAST(ROUND(l_discount * 100) AS BIGINT) AS STRING)"),
    ("l_returnflag", "l_returnflag"),
    ("l_shipdate", "date_format(l_shipdate, 'yyyy-MM-dd')"),
]


def _cells_for(df: DataFrame, replica: bool) -> DataFrame:
    """One scan of lineitem -> flat cells (string-typed payloads)."""
    per_col = []
    for i, (name, value_expr) in enumerate(CELL_COLUMNS):
        per_col.append(F.struct(
            F.lit(name).alias("name"),
            F.expr(value_expr).cast("string").alias("value"),
            (F.col("l_orderkey") * F.lit(1_000_000)
             + F.col("l_linenumber").cast("long") * F.lit(100)
             + F.lit(i) + F.lit(7 if replica else 0)).alias("writeTime"),
            ((F.col("l_orderkey") * 31 + F.col("l_linenumber") * 7 + F.lit(i * 13)) % 20)
            .alias("kind_code"),
            ((F.col("l_orderkey") + F.lit(i)) % 2 == 0).alias("ttl_flag"),
        ))
    base = df.select(
        (F.concat_ws("-", F.lit("sst"), F.lit("r") if replica else (F.col("l_orderkey") % 4)))
        .alias("sstable_id"),
        F.concat_ws("|", F.col("l_orderkey"), F.col("l_linenumber")).alias("key"),
        ((F.col("l_orderkey") * 131 + F.col("l_linenumber")) % 50 != 0)
        .alias("partition_deletion_live"),
        F.explode(F.array(*per_col)).alias("c"),
    )
    kind = (
        F.when(F.col("c.kind_code") < 14, F.lit("LIVE"))
        .when(F.col("c.kind_code") < 16, F.lit("DELETED"))
        .when(F.col("c.kind_code") < 18, F.lit("EXPIRING"))
        .otherwise(F.lit("COUNTER"))
    )
    return base.select(
        "sstable_id",
        "key",
        F.col("c.name").alias("name"),
        F.col("c.value").alias("value"),
        F.col("c.writeTime").alias("writeTime"),
        kind.alias("cell_kind"),
        F.when(kind == "EXPIRING", F.col("c.ttl_flag")).alias("ttl_expired"),
        "partition_deletion_live",
    )


def encode_lineitem_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat wide-row cell table derived from lineitem (string payloads).

    Narrow transform: explode is per-row, no shuffle; at 100 TB this scan
    parallelizes per parquet split with no data movement.
    """
    from cassandra_sstable_to_protocolbuf_spark.session import widen

    li = widen(spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount", "l_returnflag", "l_shipdate",
    ))
    primary = _cells_for(li, replica=False)
    replica = _cells_for(li.filter(F.col("l_orderkey") % 5 == 0), replica=True)
    return primary.unionAll(replica)


def to_binary_cells(cells: DataFrame) -> DataFrame:
    """Engine-internal shape: blob key/name/value (SURVEY §1.3 flat schema)."""
    return cells.select(
        "sstable_id",
        F.encode("key", "UTF-8").alias("key"),
        F.encode("name", "UTF-8").alias("name"),
        F.encode("value", "UTF-8").alias("value"),
        "writeTime", "cell_kind", "ttl_expired", "partition_deletion_live",
    )
