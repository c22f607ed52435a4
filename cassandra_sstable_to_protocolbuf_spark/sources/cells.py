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
    """One scan of lineitem -> flat cells (string-typed payloads).

    Built as SQL-text expressions (selectExpr): one JVM parse per
    expression instead of one py4j round trip per Column operation --
    the Column-op form cost a measured ~1.5 s of pure driver time PER
    CALL (and this runs twice per cells query), all of it inside the
    bench's timed region. Expression semantics are unchanged; the
    DuckDB oracle gate pins result equality.
    """
    per_col = []
    for i, (name, value_expr) in enumerate(CELL_COLUMNS):
        wt_off = i + (7 if replica else 0)
        per_col.append(
            f"struct('{name}' AS name, "
            f"CAST({value_expr} AS STRING) AS value, "
            f"l_orderkey * 1000000 + CAST(l_linenumber AS BIGINT) * 100 "
            f"+ {wt_off} AS writeTime, "
            f"(l_orderkey * 31 + l_linenumber * 7 + {i * 13}) % 20 "
            f"AS kind_code, "
            f"(l_orderkey + {i}) % 2 = 0 AS ttl_flag)")
    sid = "'r'" if replica else "l_orderkey % 4"
    base = df.selectExpr(
        f"concat_ws('-', 'sst', {sid}) AS sstable_id",
        "concat_ws('|', l_orderkey, l_linenumber) AS key",
        "(l_orderkey * 131 + l_linenumber) % 50 <> 0 "
        "AS partition_deletion_live",
        f"explode(array({', '.join(per_col)})) AS c",
    )
    kind = ("CASE WHEN c.kind_code < 14 THEN 'LIVE' "
            "WHEN c.kind_code < 16 THEN 'DELETED' "
            "WHEN c.kind_code < 18 THEN 'EXPIRING' "
            "ELSE 'COUNTER' END")
    return base.selectExpr(
        "sstable_id",
        "key",
        "c.name AS name",
        "c.value AS value",
        "c.writeTime AS writeTime",
        f"{kind} AS cell_kind",
        f"CASE WHEN {kind} = 'EXPIRING' THEN c.ttl_flag END AS ttl_expired",
        "partition_deletion_live",
    )


def encode_lineitem_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat wide-row cell table derived from lineitem (string payloads).

    Narrow transform: explode is per-row, no shuffle; at 100 TB this scan
    parallelizes per parquet split with no data movement.
    """
    from cassandra_sstable_to_protocolbuf_spark.session import (
        read_base_table, widen)

    li = widen(read_base_table(spark, f"{sf_dir}/lineitem.parquet").select(
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
